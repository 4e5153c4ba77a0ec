package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: write `explain("formatted")` output for registered
  * queries to files — the plans/rNN/ artifact format the optimization
  * rounds commit (judge-checkable plan claims). After the formatted
  * (static, isFinalPlan=false) plan it appends the executed adaptive
  * plan, which is where AQE coalescing / join flips / pins show.
  * Usage: `sbt "runMain graft.PlanDumpFmt <outDir> <suffix> q1 q2 ..."`
  * writes `<outDir>/<query>_<suffix>.txt` per query. */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    // data dir from the same env var Bench reads (ADVICE r14: the
    // hardcoded path broke the artifact generator on any other host)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // run it so the appended executed plan is the FINAL adaptive one
      df.queryExecution.toRdd.foreach(_ => ())
      val fin = df.queryExecution.executedPlan.toString
      val txt = s"== explain(formatted) ==\n$fmt\n" +
        s"== executed adaptive plan (after run) ==\n${fin.take(12000)}\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandumpfmt] wrote ${q}_$suffix.txt")
    }
    spark.stop()
  }
}
