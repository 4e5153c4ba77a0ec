package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the physical plan of any registered query
  * against sf0.1 — the manual companion to PlanContractSpec when a
  * bench number moves and the first question is "did the plan change".
  * Usage: `sbt "runMain graft.PlanDump q96_join_size_est ..."`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
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
    for (q <- args) {
      println(s"===== PLAN $q =====")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
      // execute FIRST: with AQE on, the pre-execution executedPlan is
      // the static plan (isFinalPlan=false) — it hides the runtime
      // shuffle-read coalescing and join flips that are exactly what a
      // bench-movement investigation needs to see (VERDICT r12 #3).
      // It must be THIS frame's plan that runs: count() would build
      // its own query execution and adapt that one instead (the
      // ScaleSpec AQE-skew lesson), so drive the frame via its RDD.
      df.queryExecution.toRdd.foreach(_ => ())
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
