package graft
import org.apache.spark.sql.execution.ExplainMode
object TmpPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("plandump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      println(s"=====PLAN $n=====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"=====END $n=====")
    }
    spark.stop()
  }
}
