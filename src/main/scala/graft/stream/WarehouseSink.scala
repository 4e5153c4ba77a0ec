package graft.stream

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.ops.LoadCycle
import graft.ops.LoadCycle.Warehouse

/** Continuous warehouse maintenance: the reference's 60-second loader
  * loop (/root/reference/apps/loader/load_warehouse.py:331-346) as a
  * streaming sink — each micro-batch of staged rows runs one load cycle
  * against the current warehouse version.
  *
  * Two properties the reference delegates to Postgres, done Spark-side:
  * - **Transactionality (U6)**: compute-all-then-swap. Each cycle's
  *   dims/fact are WRITTEN to a fresh versioned directory and re-read
  *   before the version pointer moves — readers see either version N or
  *   N+1, never a mix (SURVEY §7.4(5)).
  * - **Bounded lineage**: materializing per cycle also cuts the logical
  *   plan chain — without it, cycle N's plan nests all N−1 predecessors.
  *
  * Exactly-once: the checkpoint replays unacknowledged batches; replayed
  * rows are re-merged idempotently (latest-per-key, ST4) — asserted by
  * LoadCycleSpec's replay test.
  */
class WarehouseSink(spark: SparkSession, baseDir: String) {

  private val current = new AtomicReference[Warehouse]
  private var version = 0L

  def warehouse: Warehouse = current.get()

  private def materialize(wh: Warehouse): Warehouse = {
    version += 1
    val dir = s"$baseDir/v$version"
    def swap(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$dir/$name")
      spark.read.parquet(s"$dir/$name")
    }
    Warehouse(
      swap(wh.dimAirline, "dim_airline"),
      swap(wh.dimAirport, "dim_airport"),
      swap(wh.dimRoute, "dim_route"),
      swap(wh.fact, "fact"),
      wh.staging)
  }

  /** Latest persisted version under `baseDir`, or 0 if none exist. */
  private def latestPersistedVersion(): Long = {
    val path = new org.apache.hadoop.fs.Path(baseDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else fs.listStatus(path).iterator.map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .foldLeft(0L)(math.max)
  }

  /** Start the loader: `staged` is the staging-projection stream
    * ([[FlightStream.pipeline]] output shape).
    *
    * Restart recovery: warehouse state must survive the JVM, or the
    * checkpoint (which skips already-committed batches) and the
    * process-local `current` disagree — the warehouse would silently
    * bootstrap empty and re-number versions over directories earlier
    * readers may still hold. Recover both from the newest `$baseDir/vN`
    * before consuming any batch. */
  def start(staged: DataFrame, checkpointDir: String): StreamingQuery = {
    val recovered = latestPersistedVersion()
    if (recovered > 0L && current.get() == null) {
      version = recovered
      val dir = s"$baseDir/v$recovered"
      val empty = staged.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), staged.schema)
      current.compareAndSet(null, Warehouse(
        spark.read.parquet(s"$dir/dim_airline"),
        spark.read.parquet(s"$dir/dim_airport"),
        spark.read.parquet(s"$dir/dim_route"),
        spark.read.parquet(s"$dir/fact"),
        empty))
    }
    current.compareAndSet(null,
      LoadCycle.emptyWarehouse(staged.sparkSession
        .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          staged.schema)))
    staged.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // data-derived cutoff: everything in this batch loads this cycle
          val cutoff = batch.agg(max(col("ingest_time"))).first().getTimestamp(0)
          // dims are multi-consumer within the cycle: persist for its
          // duration, release once the version swap re-reads from parquet
          val cached = scala.collection.mutable.Buffer.empty[DataFrame]
          val next = LoadCycle.run(
            current.get().copy(staging = batch), lit(cutoff),
            materialize = { df => cached += df.persist(); df })
          current.set(materialize(next)) // atomic version swap
          cached.foreach(_.unpersist(blocking = false))
        }
      }
      .start()
  }
}
