package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.FlightStream

/** The `flight_events` DataSourceV2 connector: schema, determinism,
  * partition split, pushed column pruning, micro-batch streaming, and
  * the json-column contract with the parse pipeline. */
class FlightSourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int = 4) =
    spark.read.format("flight_events")
      .option("rows", rows).option("partitions", parts).load()

  test("batch read: row count, schema, and range-split partitions") {
    val df = read(1000, 7)
    assert(df.schema.fieldNames.toSeq == Seq("event_id", "ts", "json"))
    assert(df.count() == 1000)
    // every id exactly once: the 7-way split covers [0, rows) disjointly
    assert(df.agg(countDistinct(col("event_id")).as("n"),
      min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .head().toSeq == Seq(1000L, 0L, 999L))
    assert(df.rdd.getNumPartitions == 7)
  }

  test("generation is a pure function of the index: re-reads identical") {
    val a = read(500).collect().map(_.toString).sorted
    val b = read(500, 2).collect().map(_.toString).sorted
    assert(a.sameElements(b)) // partition count cannot change content
  }

  test("column pruning pushes into the source (no json synthesis)") {
    val df = read(100).select(col("event_id"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty)
    assert(scans.head.readSchema().fieldNames.toSeq == Seq("event_id"))
  }

  test("limit pushdown caps generation at the source") {
    val df = read(1000000, 8).limit(5)
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    // the scan itself now generates 5 rows, not a million then a limit
    assert(scans.head.description().contains("range=[0,5)"),
      scans.head.description())
    assert(df.count() == 5)
  }

  test("event_id range filters prune generation at the source") {
    // a key-slice query on a billion-row topic synthesizes ONLY the slice
    val df = read(1000000000, 8)
      .filter(col("event_id") >= 1000 && col("event_id") < 1100)
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    assert(scan.description().contains("range=[1000,1100)"), scan.description())
    val ids = df.select(col("event_id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1000L until 1100L))
    // filter + limit compose: limit applies AFTER the pushed range
    val lim = read(1000000000, 8)
      .filter(col("event_id") > 500).limit(3)
    val limScan = lim.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    assert(limScan.description().contains("range=[501,504)"),
      limScan.description())
    assert(lim.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(501L, 502L, 503L))
    // an equality probe generates exactly one row
    val eq = read(1000000000, 8).filter(col("event_id") === 777)
    assert(eq.count() == 1)
    // a contradictory range generates nothing
    assert(read(1000, 8)
      .filter(col("event_id") > 900 && col("event_id") < 100).isEmpty)
  }

  test("ts range filters prune via the monotone time grid") {
    // topic start 1700000000 = 2023-11-14T22:13:20Z, 60s steps.
    // [22:20:00, 22:30:00) → offsets [400s, 1000s) → indices [7, 17)
    val df = read(1000000000, 8).filter(
      col("ts") >= lit("2023-11-14 22:20:00").cast("timestamp") &&
        col("ts") < lit("2023-11-14 22:30:00").cast("timestamp"))
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    assert(scan.description().contains("range=[7,17)"), scan.description())
    assert(df.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      == (7L until 17L))
    // on-grid equality → exactly one generated row
    val eq = read(1000, 8).filter(
      col("ts") === lit("2023-11-14 22:14:20").cast("timestamp")) // i = 1
    assert(eq.select(col("event_id")).collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    // off-grid equality can never match: generation is empty
    val off = read(1000, 8).filter(
      col("ts") === lit("2023-11-14 22:14:21").cast("timestamp"))
    assert(off.isEmpty)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answer from range arithmetic — " +
    "no aggregation in the plan, one metadata-only row") {
    // correctness first: values match the unpushed computation
    val df = read(1000)
    val agg = df.agg(count(lit(1)).as("n"), min(col("event_id")).as("lo"),
      max(col("event_id")).as("hi"), min(col("ts")).as("t0"),
      max(col("ts")).as("t1"))
    val r = agg.collect().head
    assert(r.getLong(0) == 1000L && r.getLong(1) == 0L && r.getLong(2) == 999L)
    assert(r.getTimestamp(3).getTime == 1700000000L * 1000L)
    assert(r.getTimestamp(4).getTime == (1700000000L + 999L * 60L) * 1000L)
    // the plan: completely pushed — the scan reports the AGG range and
    // Spark plans NO exchange (a non-pushed global agg needs one)
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("flight_events AGG"), p.take(800))
    assert(!p.contains("Exchange"), s"pushed agg still shuffles:\n${p.take(800)}")
    // composes with filter pushdown: the clamped range answers the agg
    val f = df.filter(col("event_id") >= 100 && col("event_id") < 200)
      .agg(count(lit(1)), min(col("event_id")), max(col("event_id")))
      .collect().head
    assert(f.getLong(0) == 100L && f.getLong(1) == 100L && f.getLong(2) == 199L)
    // empty range: SQL global-agg semantics
    val e = df.filter(col("event_id") < 0)
      .agg(count(lit(1)), min(col("event_id"))).collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1))
    // group-by stays UNPUSHED (only global aggregates qualify)
    val g = df.groupBy((col("event_id") % 2).as("k")).count()
    assert(!g.queryExecution.executedPlan.toString.contains("flight_events AGG"))
    assert(g.collect().map(_.getLong(1)).sorted.toSeq == Seq(500L, 500L))
  }

  test("reported statistics drive broadcast join planning without a hint") {
    val small = read(50).select(col("event_id").as("sid"), col("ts"))
    val big = spark.read
      .parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id"))
    val plan = big.join(small, col("event_id") === col("sid"))
      .queryExecution.executedPlan.toString
    // exact v2 statistics (rows × width) put the topic side under the
    // broadcast threshold — no broadcast() hint anywhere
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("json payload parses under the pipeline's event schema, no nulls") {
    val parsed = FlightStream.parse(read(200).select(col("json")))
    assert(parsed.count() == 200)
    // parse failures would surface as all-null structs
    assert(parsed.filter(col("flight_key").isNull).count() == 0)
    assert(parsed.filter(col("status").isNull).count() == 0)
    // the synthesized event times are the declared 60s apart
    val d = parsed.select(countDistinct(col("flight_date")).as("n")).head()
    assert(d.getLong(0) >= 1)
  }

  test("micro-batch stream: bounded offsets drain exactly the topic") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("flight_src_ckpt").toString
    val q = spark.readStream.format("flight_events")
      .option("rows", 250).option("rowsPerBatch", 100)
      .load()
      .writeStream.format("memory").queryName("flight_topic")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // 3 triggers: 100 + 100 + 50, then latestOffset stays at 250
      val deadline = System.currentTimeMillis() + 60000
      def n(): Long = spark.table("flight_topic").count()
      while (n() < 250 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(n() == 250)
      val ids = spark.table("flight_topic")
        .agg(countDistinct(col("event_id"))).head().getLong(0)
      assert(ids == 250) // offset ranges replay disjoint slices
    } finally q.stop()
  }

  test("full topology: connector stream → pipeline → versioned warehouse") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("flight_wh_e2e").toString
    val sink = new graft.stream.WarehouseSink(spark, s"$dir/wh")
    val raw = spark.readStream.format("flight_events")
      .option("rows", 300).option("rowsPerBatch", 150)
      .load()
    val now = lit(1700000000L + 299L * 60L).cast("timestamp")
    val q = sink.start(
      FlightStream.pipeline(raw.select(col("json")), now), s"$dir/cp")
    try {
      val deadline = System.currentTimeMillis() + 90000
      def fact() = Option(sink.warehouse).map(_.fact.count()).getOrElse(0L)
      // 300 events, every 5th cancelled → 240 distinct flight keys land
      while (fact() < 240 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(fact() == 240)
      // two micro-batches → two committed warehouse versions on disk
      assert(new java.io.File(s"$dir/wh/v1/_COMMITTED").exists)
      assert(new java.io.File(s"$dir/wh/v2/_COMMITTED").exists)
      // the curated view resolves dims for every fact row
      val view = graft.ops.LoadCycle.curatedView(sink.warehouse)
      assert(view.count() == 240)
      assert(view.filter(col("airline_name").isNull).count() == 0)
    } finally q.stop()
  }

  test("end to end: streaming source → parse/filter pipeline → staging sink") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("flight_e2e_out").toString
    val ckpt = Files.createTempDirectory("flight_e2e_ckpt").toString
    val raw = spark.readStream.format("flight_events")
      .option("rows", 300).option("rowsPerBatch", 150)
      .load()
    // now = last event time of the bounded topic (300 rows, 60s apart)
    val now = lit(1700000000L + 299L * 60L).cast("timestamp")
    val staged = FlightStream.pipeline(raw.select(col("json")), now)
    val q = FlightStream.startStagingSink(staged, out, ckpt)
    try {
      val deadline = System.currentTimeMillis() + 60000
      def n(): Long =
        try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
      // 300 events span 5h => all inside the 3-day window; cancelled
      // (every 5th) dropped by the status filter: 240 staging rows
      while (n() < 240 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(n() == 240)
      val st = spark.read.parquet(out)
      assert(st.columns.toSeq == graft.schema.FlightSchemas.stagingColumns)
      assert(st.filter(col("status") =!= "active").count() == 0)
      assert(st.filter(col("dep_scheduled").isNull).count() == 0)
    } finally q.stop()
  }
}
