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

  test("join-driven dynamic partition pruning reaches the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("dpp-test").toString + "/fact"
    // 10 date partitions × 50 rows
    (0 until 500).map(i => (f"2024-05-${i % 10 + 1}%02d", i.toLong))
      .toDF("d", "v").write.partitionBy("d").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP requires a SELECTIVE predicate on the pruning side — a bare
    // table never prunes. The dim must be storage-backed: a literal
    // local table constant-folds the filter away (ConvertToLocalRelation)
    // and with it the selectivity evidence.
    val dimDir = java.nio.file.Files.createTempDirectory("dpp-dim").toString
    Seq(("2024-05-03", "keep"), ("2024-05-04", "drop"))
      .toDF("dd", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    // force the decision path that matters: DPP must come from the JOIN,
    // not from column stats this tiny test lacks
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    try {
      val j = fact.join(dim, col("d") === col("dd"))
      val scan = j.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).find(_.contains("PartitionFilters")).getOrElse("")
      // the fact scan's partition filter is a runtime subquery on the
      // dim side — only the joined date's files are ever read
      assert(scan.contains("dynamicpruning"), scan)
      assert(j.count() == 50)
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("clusterByZ: every output file is a tight rectangle in BOTH keys") {
    import graft.ops.Layout
    // 64×64 uniform grid → 16 z-range files; with a plain x-sort each
    // file would span ALL of y. Z-clustering must bound both.
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4000)((rnd.nextInt(64).toLong * 1024,
      rnd.nextInt(64).toLong * 1024)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.clusterByZ(pts, col("x"), col("y"), 16).write.parquet(dir)
    val spans = spark.read.parquet(dir)
      .select(col("x"), col("y"), input_file_name().as("f"))
      .groupBy("f").agg(
        (max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .as[(String, Long, Long)].collect()
    assert(spans.length >= 8, s"expected many files, got ${spans.length}")
    val full = 63L * 1024
    // Files that straddle a top-level quadrant boundary legitimately
    // span one dimension wide (inherent to quantile cuts on a z-curve),
    // so the layout claim is aggregate: the mean envelope AREA must be
    // a small fraction of the full rectangle (a 1-d sort pins xs but
    // leaves ys == full on EVERY file → mean area ≈ full²/nFiles·full).
    val meanArea = spans.map { case (_, xs, ys) => xs.toDouble * ys }.sum /
      spans.length
    assert(meanArea <= full.toDouble * full / 8, s"mean area $meanArea")
    // and the typical file is tight in BOTH dimensions
    val tight = spans.count { case (_, xs, ys) => xs <= full / 2 && ys <= full / 2 }
    assert(tight * 4 >= spans.length * 3, s"only $tight/${spans.length} tight")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // one hot key (80% of rows) in a forced sort-merge join; thresholds
    // lowered so the test's KBs register as "skew" — the mechanism under
    // test is the plan surgery, not the absolute sizes
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val skewed = (1 to 40000)
        .map(i => (if (i % 5 != 0) 7L else i.toLong, s"payload_$i"))
        .toDF("k", "v")
      val dim = (1 to 40000).map(_.toLong).toDF("k").withColumn("tag",
        concat(lit("t"), col("k")))
      val j = skewed.join(dim, "k")
      // execute THIS dataframe's plan (count() builds its own, whose
      // adaptive result we would not see here)
      assert(j.collect().length == 40000)
      // the FINAL adaptive plan marks the rebalanced join skew=true
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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

  test("fanout-output aggregation keeps its width: no record-heavy " +
    "stage runs single-task (the q331 AQE-coalesce class)") {
    // THE regression gate for VERDICT r12 #1: a pair-expanding
    // aggregate's ENSURE_REQUIREMENTS exchange carries few compressed
    // bytes per unit of downstream work, so AQE's coalescer collapses
    // it to ONE partition and the whole candidate-pair set aggregates
    // serially — at cluster scale, one executor does the entire job.
    // Graph.adamicAdar pins that exchange (Fanout.pin on the pair
    // keys); this spec runs it on a fanout-heavy fixture under a
    // task-level listener and asserts every record-heavy stage kept
    // its width. Remove the pin and the final-aggregate stage reads
    // all ~39k candidate pairs in one task — this test goes red.
    import scala.collection.mutable
    val tasks = mutable.Map[Int, Int]().withDefaultValue(0)
    val recs = mutable.Map[Int, Long]().withDefaultValue(0L)
    // straggler task-end events still queued from EARLIER tests on the
    // shared session could land in the maps and a stale record-heavy
    // single-task stage would fail the width assertion spuriously
    // (ADVICE r13) — admit only stages of jobs started AFTER this
    // listener attached (i.e. this probe's own jobs)
    val ownStages = mutable.Set[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { js.stageInfos.foreach(ownStages += _.stageId) }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        synchronized {
          if (ownStages.contains(te.stageId)) {
            tasks(te.stageId) += 1
            val m = te.taskMetrics
            if (m != null) recs(te.stageId) +=
              m.shuffleReadMetrics.recordsRead + m.inputMetrics.recordsRead
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // 50 via vertices × 40 incident nodes: 2 000 input rows fan out
      // to 50·C(40,2) = 39 000 candidate pairs — far over any one
      // stage's legitimate single-task load here, far under the AQE
      // advisory byte size (the hazard's signature)
      val inc = (for (v <- 0 until 50; n <- 0 until 40)
        yield (v * 1000L + n, v.toLong)).toDF("node", "via")
      val out = graft.ops.Graph.adamicAdar(inc, "node", "via", k = 20)
      assert(out.count() == 20)
      // listener events are async: wait for the task counts to settle
      var prev = -1
      var settled = 0
      var spins = 0
      while (settled < 2 && spins < 50) {
        Thread.sleep(100)
        val now = listener.synchronized(tasks.values.sum)
        if (now == prev) settled += 1 else { settled = 0; prev = now }
        spins += 1
      }
      val heavy = listener.synchronized {
        recs.filter(_._2 >= 20000L).keys.map(s => s -> tasks(s)).toMap
      }
      assert(heavy.nonEmpty,
        s"fixture no longer fanout-heavy: per-stage records=$recs")
      for ((stage, n) <- heavy)
        assert(n > 1,
          s"stage $stage read ${recs(stage)} records in ONE task — " +
            s"the fanout-output aggregate lost its width (pin removed?)")
    } finally spark.sparkContext.removeSparkListener(listener)
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
