package graft

object TmpEntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("smoke")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .getOrCreate()
    println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
