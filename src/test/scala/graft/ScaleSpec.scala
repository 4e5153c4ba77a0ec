package graft

import org.apache.spark.sql.functions._

/** The two storage-layout mechanisms that carry the engine at 100 TB:
  * date-partitioned writes (partition pruning at the scan) and bucketed
  * tables (co-located joins with no exchange). Small-data proofs that the
  * PLANS have the right shape — the property that scales.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned staging write → scan prunes to one partition") {
    val dir = java.nio.file.Files.createTempDirectory("part-test").toString + "/staging"
    Seq(
      ("k1", "2024-05-08", 1.0), ("k2", "2024-05-09", 2.0),
      ("k3", "2024-05-10", 3.0))
      .toDF("flight_key", "flight_date", "v")
      .write.partitionBy("flight_date").parquet(dir)
    val rd = spark.read.parquet(dir)
      .filter(col("flight_date") === "2024-05-09")
    val scan = rd.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(rd.count() == 1)
    // pruning is visible as a single selected partition in the scan
    assert(scan.contains("2024-05-09"))
  }

  test("saltedJoin ≡ plain join on skewed data (hot key spread, same rows)") {
    import graft.ops.Skew
    // 90% of rows share one hot key
    val skewed = (1 to 1000).map(i =>
      (if (i <= 900) "HOT" else s"k$i", i.toLong)).toDF("k", "v")
    val dim = Seq(("HOT", "hot-dim"), ("k950", "cold-dim")).toDF("k", "d")
    val plain = skewed.join(dim, Seq("k"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .select("k", "v", "d").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 901)
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
        .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("graft_ta")
      (1 to 3000).map(i => (((i % 1000) + 1).toLong, s"l$i")).toDF("k", "lv")
        .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("graft_tb")
      val joined = spark.table("graft_ta").join(spark.table("graft_tb"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // both sides pre-bucketed: no shuffle
      assert(joined.count() == 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
    }
  }
}
