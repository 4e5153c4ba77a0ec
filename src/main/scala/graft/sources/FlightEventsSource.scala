package graft.sources

import java.util
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `flight_events` — a native DataSourceV2 connector that synthesizes the
  * reference producer's flight-event topic
  * (/root/reference/apps/producer/run_producer.py:59-131: REST poll →
  * JSON records → Kafka) inside the engine, batch and micro-batch.
  *
  * Records mirror a Kafka topic row: `(event_id, ts, json)`, where `json`
  * is the producer's event payload (the [[graft.schema.FlightSchemas
  * .eventSchema]] shape that [[graft.stream.FlightStream.parse]]
  * consumes). Generation is a pure function of the row index — no RNG, no
  * clock — so any range of the topic is bit-identical across reads,
  * executors, retries, and engines: the same determinism contract as the
  * rest of the library.
  *
  * Scale design:
  * - batch reads split the row range into `partitions` independent
  *   [[InputPartition]]s — parallelism is declared to Spark, not
  *   simulated; each task generates exactly its slice;
  * - column pruning is pushed into the source
  *   ([[SupportsPushDownRequiredColumns]]): a query that never touches
  *   `json` (the fat column — ~700 bytes/row) skips JSON synthesis
  *   entirely, the v2 analog of parquet's ReadSchema pruning;
  * - the micro-batch stream advances a row-count offset by
  *   `rowsPerBatch` per trigger — bounded, replayable batches keyed by
  *   (start, end] offsets, the exactly-once contract Structured
  *   Streaming expects from a source (same offset range ⇒ same rows);
  * - global COUNT/MIN/MAX over `event_id`/`ts` push COMPLETELY into the
  *   source ([[SupportsPushDownAggregates]]): the generator knows its
  *   own (filter-clamped) range, so the answer is O(1) driver
  *   arithmetic and the plan has no aggregation or exchange at all —
  *   the v2 analog of parquet's metadata-only count.
  *
  * Options: `rows` (total, default 1000), `partitions` (batch split,
  * default 8), `rowsPerBatch` (streaming, default 100),
  * `startTs` (epoch seconds of event 0, default 1700000000),
  * `stepSec` (event-time spacing, default 60 — the reference's poll
  * interval, run_producer.py:163-165).
  */
object FlightSynth {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("json", StringType, nullable = false)))

  private val fmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)
  private val dayFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  def tsMicros(i: Long, startTs: Long, stepSec: Long): Long =
    (startTs + i * stepSec) * 1000000L

  /** The producer's JSON payload for event `i` — field-for-field the
    * shape `FlightStream.parse` expects. Deterministic in `i`. */
  def json(i: Long, startTs: Long, stepSec: Long): String = {
    val sec = startTs + i * stepSec
    val t = Instant.ofEpochSecond(sec)
    val iso = fmt.format(t)
    val isoArr = fmt.format(t.plusSeconds(7200))
    val status = if (i % 5 == 0) "cancelled" else "active"
    val user = i % 150
    s"""{"flight_key":"${user}_$i","flight_date":"${dayFmt.format(t)}",""" +
      s""""status":"$status",""" +
      s""""airline":{"iata":"AA","icao":"AAL","name":"American"},""" +
      s""""flight":{"number":"AA$i","iata":null,"icao":null},""" +
      s""""departure":{"airport":"Origin Intl","iata":"ORG","icao":"KORG",""" +
      s""""gate":"1","terminal":"A","schedule":"${iso}Z","estimated":null,""" +
      s""""actual":null,"delay_min":${i % 30}},""" +
      s""""arrival":{"airport":"Dest Intl","iata":"DST","icao":"KDST",""" +
      s""""gate":null,"terminal":"B","schedule":"$isoArr+00:00",""" +
      s""""estimated":null,"actual":null,"delay_min":null},""" +
      s""""ingest_time":"$iso","source":"synthetic"}"""
  }
}

class FlightEventsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "flight_events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlightSynth.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FlightEventsTable
}

class FlightEventsTable extends Table with SupportsRead {
  override def name(): String = "flight_events"
  override def schema(): StructType = FlightSynth.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FlightScanBuilder(options)
}

class FlightScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = FlightSynth.schema
  private var limit: Long = Long.MaxValue
  private var fLo: Long = 0L
  private var fHi: Long = Long.MaxValue
  private var accepted: Array[sources.Filter] = Array.empty
  private var pushedAgg: Option[Seq[String]] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    // the engine passes a subset of schema() in source field order
    required = requiredSchema
  // LIMIT n caps generation itself: the topic is ordered by event_id, so
  // the first n rows ARE the limit's result (fully, not partially, pushed)
  override def pushLimit(n: Int): Boolean = { limit = n.toLong; true }
  override def isPartiallyPushed: Boolean = false
  // event_id IS the row index, and ts is strictly monotone in it
  // (ts(i) = (startTs + i·stepSec) s), so range predicates on EITHER
  // column prune GENERATION — the source-side analog of parquet
  // row-group pruning: a key slice or a time slice on a billion-row
  // topic synthesizes only the slice. Accepted filters are fully
  // applied here (Spark drops them from the post-scan Filter);
  // everything else stays residual.
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val startTs = options.getLong("startTs", 1700000000L)
    val stepSec = options.getLong("stepSec", 60L)
    // validate HERE too: pushdown runs during optimization, BEFORE
    // build()'s checks — stepSec=0 would otherwise surface as a raw
    // division by zero in the grid arithmetic below
    require(stepSec > 0, s"flight_events: stepSec=$stepSec must be > 0")
    def id(a: Any): Option[Long] = a match {
      case n: Number => Some(n.longValue); case _ => None
    }
    // micros of a pushed timestamp literal (Timestamp or Instant)
    def tsUs(a: Any): Option[Long] = a match {
      case t: java.sql.Timestamp =>
        Some(t.getTime * 1000L + t.getNanos / 1000L % 1000L)
      case t: java.time.Instant =>
        Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
      case _ => None
    }
    val stepUs = stepSec * 1000000L
    val baseUs = startTs * 1000000L
    // smallest i with ts(i) >= us  /  largest-exclusive bound for < us
    def ceilIdx(us: Long): Long = Math.floorDiv(us - baseUs + stepUs - 1, stepUs)
    def supported(f: sources.Filter): Boolean = f match {
      case sources.EqualTo(c, a) =>
        (c == "event_id" && id(a).isDefined) || (c == "ts" && tsUs(a).isDefined)
      case sources.GreaterThan(c, a) =>
        (c == "event_id" && id(a).isDefined) || (c == "ts" && tsUs(a).isDefined)
      case sources.GreaterThanOrEqual(c, a) =>
        (c == "event_id" && id(a).isDefined) || (c == "ts" && tsUs(a).isDefined)
      case sources.LessThan(c, a) =>
        (c == "event_id" && id(a).isDefined) || (c == "ts" && tsUs(a).isDefined)
      case sources.LessThanOrEqual(c, a) =>
        (c == "event_id" && id(a).isDefined) || (c == "ts" && tsUs(a).isDefined)
      case sources.IsNotNull("event_id") | sources.IsNotNull("ts") =>
        true // never null: no-op
      case _ => false
    }
    val (sup, residual) = filters.partition(supported)
    def clampLo(x: Long): Unit = fLo = math.max(fLo, x)
    def clampHi(x: Long): Unit = fHi = math.min(fHi, x)
    sup.foreach {
      case sources.EqualTo("event_id", a) =>
        id(a).foreach { x => clampLo(x)
          clampHi(if (x == Long.MaxValue) x else x + 1) }
      case sources.GreaterThan("event_id", a) =>
        id(a).foreach(x => clampLo(if (x == Long.MaxValue) x else x + 1))
      case sources.GreaterThanOrEqual("event_id", a) => id(a).foreach(clampLo)
      case sources.LessThan("event_id", a) => id(a).foreach(clampHi)
      case sources.LessThanOrEqual("event_id", a) =>
        id(a).foreach(x => clampHi(if (x == Long.MaxValue) x else x + 1))
      case sources.EqualTo("ts", a) => tsUs(a).foreach { us =>
        // ts(i) = us has a solution only on the step grid
        if ((us - baseUs) % stepUs == 0 && us >= baseUs) {
          val i = (us - baseUs) / stepUs; clampLo(i); clampHi(i + 1)
        } else { clampLo(0L); clampHi(0L) } // off-grid: empty
      }
      case sources.GreaterThan("ts", a) =>
        tsUs(a).foreach(us => clampLo(ceilIdx(us + 1)))
      case sources.GreaterThanOrEqual("ts", a) =>
        tsUs(a).foreach(us => clampLo(ceilIdx(us)))
      case sources.LessThan("ts", a) =>
        tsUs(a).foreach(us => clampHi(ceilIdx(us)))
      case sources.LessThanOrEqual("ts", a) =>
        tsUs(a).foreach(us => clampHi(ceilIdx(us + 1)))
      case _ => ()
    }
    accepted = sup
    residual
  }
  override def pushedFilters(): Array[sources.Filter] = accepted

  // COUNT(*)/MIN/MAX over event_id/ts answer from the (filter-clamped)
  // generation range itself — event_id IS the index and ts is strictly
  // monotone in it, so a global aggregate over a billion-row topic is
  // O(1) arithmetic, the source-side analog of parquet's metadata-only
  // count. Complete pushdown only (no group-by, no partial rows): the
  // scan then emits ONE row in the aggregate schema and Spark plans no
  // aggregation at all (PlanContractSpec/FlightSourceSpec-asserted).
  private def parseAgg(agg: aggregate.Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: org.apache.spark.sql.connector.expressions.NamedReference
        if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
      case _ => None
    }
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: aggregate.CountStar => Some("count")
      case m: aggregate.Min =>
        colOf(m.column).collect { case c @ ("event_id" | "ts") => s"min:$c" }
      case m: aggregate.Max =>
        colOf(m.column).collect { case c @ ("event_id" | "ts") => s"max:$c" }
      case _ => None
    }
    if (kinds.forall(_.isDefined)) Some(kinds.map(_.get)) else None
  }
  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    parseAgg(agg).isDefined
  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    val parsed = parseAgg(agg)
    pushedAgg = parsed
    parsed.isDefined
  }

  override def build(): Scan = {
    val rows = options.getLong("rows", 1000L)
    val partitions = options.getInt("partitions", 8)
    val rowsPerBatch = options.getLong("rowsPerBatch", 100L)
    val stepSec = options.getLong("stepSec", 60L)
    // fail at planning, not with a silently empty read
    require(rows >= 0, s"flight_events: rows=$rows must be >= 0")
    require(partitions > 0, s"flight_events: partitions=$partitions must be > 0")
    require(rowsPerBatch > 0, s"flight_events: rowsPerBatch=$rowsPerBatch must be > 0")
    require(stepSec > 0, s"flight_events: stepSec=$stepSec must be > 0")
    // generation range: topic bounds ∩ pushed range, then LIMIT (which
    // applies AFTER filters — the first n surviving rows)
    val lo = math.min(math.max(0L, fLo), rows)
    val hi0 = math.max(lo, math.min(rows, fHi))
    val hi = if (limit == Long.MaxValue || lo + limit < 0) hi0
      else math.min(hi0, lo + limit)
    pushedAgg match {
      case Some(kinds) =>
        // aggregates push after filters, never under a limit — the agg
        // scan answers from the clamped range [lo, hi0)
        new FlightAggScan(lo, hi0, kinds,
          options.getLong("startTs", 1700000000L), stepSec)
      case None => new FlightScan(
        lo = lo,
        hi = hi,
        partitions = partitions,
        rowsPerBatch = rowsPerBatch,
        startTs = options.getLong("startTs", 1700000000L),
        stepSec = stepSec,
        required = required)
    }
  }
}

/** Completely-pushed global aggregate over the topic: one partition, one
  * row, O(1) arithmetic on the generation range. Empty range follows SQL
  * global-agg semantics (count 0, min/max NULL). */
class FlightAggScan(lo: Long, hi: Long, kinds: Seq[String],
    startTs: Long, stepSec: Long) extends Scan {
  override def readSchema(): StructType = StructType(kinds.zipWithIndex.map {
    case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
    case (k, i) if k.endsWith(":ts") =>
      StructField(s"agg_$i", TimestampType, nullable = true)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def description(): String =
    s"flight_events AGG range=[$lo,$hi) ${kinds.mkString(",")}"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(FlightRange(lo, hi))
    override def createReaderFactory(): PartitionReaderFactory = {
      val empty = hi <= lo
      val values: Array[Any] = kinds.toArray.map {
        case "count" => (hi - lo).max(0L)
        case _ if empty => null
        case "min:event_id" => lo
        case "max:event_id" => hi - 1
        case "min:ts" => FlightSynth.tsMicros(lo, startTs, stepSec)
        case "max:ts" => FlightSynth.tsMicros(hi - 1, startTs, stepSec)
      }
      new FlightAggReaderFactory(values)
    }
  }
}

/** Serializable single-row factory for the pushed-aggregate scan: the
  * answer is computed on the DRIVER (range arithmetic) and shipped as
  * literals; the one task just emits it. */
class FlightAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
}

case class FlightRange(start: Long, end: Long) extends InputPartition

class FlightScan(lo: Long, hi: Long, partitions: Int, rowsPerBatch: Long,
    startTs: Long, stepSec: Long, required: StructType)
    extends Scan with SupportsReportStatistics {
  private val rows = hi - lo
  override def readSchema(): StructType = required
  override def description(): String =
    s"flight_events range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** Exact statistics (the generator knows its own cardinality) — feeds
    * DataSourceV2Relation.computeStats, so join planning broadcasts a
    * small topic WITHOUT a hint, the way parquet's size metadata does. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val width = required.fieldNames.map {
      case "json" => 700L // measured payload width
      case _ => 8L
    }.sum.max(8L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  private def factory = new FlightReaderFactory(required, startTs, stepSec)

  private def split(start: Long, end: Long, n: Int): Array[InputPartition] = {
    val total = end - start
    if (total <= 0) Array.empty
    else (0 until n).flatMap { p =>
      val lo = start + total * p / n
      val hi = start + total * (p + 1) / n
      if (hi > lo) Some(FlightRange(lo, hi)) else None
    }.toArray
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      split(lo, hi, partitions)
    override def createReaderFactory(): PartitionReaderFactory = factory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      // row-count offsets: each trigger exposes the next `rowsPerBatch`
      // slice; a (start, end] range always re-plans the same rows, so
      // replay after failure is exact
      // start at the pushed lower bound, not 0: offsets are absolute, so
      // skipping the pruned prefix preserves replay semantics and avoids
      // lo/rowsPerBatch empty catch-up triggers on a filtered stream
      @volatile private var available = lo
      override def initialOffset(): Offset = FlightOffset(lo)
      override def latestOffset(): Offset = {
        available = math.min(hi, available + rowsPerBatch)
        FlightOffset(available)
      }
      override def deserializeOffset(json: String): Offset =
        FlightOffset(json.trim.toLong)
      // offsets are ABSOLUTE topic positions; a pushed event_id range
      // intersects each batch's slice, so filtered streams replay the
      // same (pruned) rows for the same offset pair
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        split(math.max(start.asInstanceOf[FlightOffset].n, lo),
          math.min(end.asInstanceOf[FlightOffset].n, hi), partitions)
      override def createReaderFactory(): PartitionReaderFactory = factory
      // a restarted stream resumes from the checkpoint's committed end:
      // fold it into `available` so latestOffset never reports behind it
      // (a behind offset is harmless — an empty (start, end] plans zero
      // partitions — but this saves the idle catch-up triggers)
      override def commit(end: Offset): Unit =
        available = math.max(available, end.asInstanceOf[FlightOffset].n)
      override def stop(): Unit = ()
    }
}

case class FlightOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class FlightReaderFactory(required: StructType, startTs: Long, stepSec: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val FlightRange(start, end) = partition.asInstanceOf[FlightRange]
    // resolve the projection ONCE per partition, not per row
    val gens: Array[Long => Any] = required.fieldNames.map {
      case "event_id" => (i: Long) => i
      case "ts" => (i: Long) => FlightSynth.tsMicros(i, startTs, stepSec)
      case "json" =>
        (i: Long) => UTF8String.fromString(FlightSynth.json(i, startTs, stepSec))
      case other => throw new IllegalArgumentException(
        s"flight_events: unknown column '$other'")
    }
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(i)))
      override def close(): Unit = ()
    }
  }
}
