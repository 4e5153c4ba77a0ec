package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet-footer caches, standard
    // steady-state benchmarking practice
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // the JSON ingest path compiles an outsized amount of generated code
    // (25-field parse + normalizer); warm it on a TINY topic so whichever
    // of q28/q46 runs first measures work, not one-time JIT
    try {
      val tiny = spark.read.format("flight_events")
        .option("rows", 2000L).option("partitions", cpus.toInt).load()
      graft.stream.FlightStream.pipeline(tiny.select(org.apache.spark.sql
          .functions.col("json")),
        org.apache.spark.sql.functions.lit(1700000000L + 1999L * 60L)
          .cast("timestamp")).count()
    } catch { case _: Throwable => }
    // best-of-N per query (N=3 default): first execution pays per-plan
    // codegen compilation; the repeats measure steady-state. N=3 because
    // this host's memory reclaim adds multi-second stalls at random —
    // one repeat is not enough for a stable minimum. Failures report -1.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt.max(1)
    // local-iteration filter, same contract as Verify's: unset = all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        // drop persisted intermediates between runs: queries that
        // persist() (q22/q46) would otherwise cache-hit the previous
        // run and the min would time a cache read, not the query
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // The harness captures only the LAST ~2000 chars of output; the full
    // per-query line above outgrows that with 60+ queries and its head
    // (the parseable prefix) gets truncated. Emit a compact duplicate
    // LAST — short keys (q01…), 3-dp values — that always fits whole.
    val compact = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$compact,"sf":"$sfDir"}""")
    spark.stop()
  }
}
