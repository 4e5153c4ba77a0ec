package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * The reference maintains 11 Postgres b-tree indexes
  * (/root/reference/db/00_warehous.sql:63-67,137-142) to serve lookups
  * on several independent columns. A parquet lake has no secondary
  * indexes — file/row-group min-max stats are the only pruning
  * structure, and they only help for columns the layout is clustered
  * by. Sorting by one column makes its stats tight and every other
  * column's useless; interleaving the bits of two keys gives a single
  * sort order whose range blocks are tight rectangles in BOTH
  * dimensions — the standard Z-order layout trick for multi-predicate
  * file skipping at 100 TB.
  *
  * Everything here is composed from intrinsic bitwise expressions
  * (shiftleft/and/or) — fully codegen'd, engine-portable, no UDF.
  */
object Layout {

  /** Bit-spread of the low 16 bits of `c` to even positions 0,2,…,30
    * (the classic magic-number doubling chain). */
  private def spread(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code interleaving the low 16 bits of `x` (even bit
    * positions) and `y` (odd positions). Monotone locality: rows close
    * in z are close in both x and y. */
  def zOrderKey(x: Column, y: Column): Column =
    spread(x.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread(y.cast("long").bitwiseAND(lit(0xFFFFL))), 1))

  /** Range-cluster `df` into `numFiles` write tasks by z-value and sort
    * within each — the write-side layout operator: each output file's
    * (x, y) min-max envelope is a tight rectangle, so predicates on
    * EITHER key prune files. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame = {
    val z = zOrderKey(x, y)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Small-file compaction planner (the lakehouse OPTIMIZE primitive):
    * assign files to ~`targetBytes` output bins by a running byte sum.
    *
    * The streaming side of the reference lands a micro-batch of rows
    * every trigger (/root/reference/apps/spark_app/flight_stream.py:
    * 335-341) — on a lake that is the classic small-file problem, and
    * compaction is the maintenance op that keeps scan task counts sane
    * at 100 TB. This operator plans the rewrite over file METADATA
    * (listing-sized: ~10^6 rows for a 100 TB table, kilobytes per row),
    * never the data. The window partitions by the table's partition
    * columns — files of different partitions never share an output
    * bin, so each partition's running sum is independent and the plan
    * parallelizes across partitions; no global sort exists. A file
    * spanning a bin boundary belongs to the bin its first byte falls
    * in, so every bin except a partition's last carries at least
    * `targetBytes − maxFileSize` bytes. Deterministic in `ord` —
    * replays and retries plan identical bins. */
  def compactionBins(files: DataFrame, partCols: Seq[String], size: Column,
      ord: Column, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(ord)
    files
      .withColumn("__start", sum(size).over(w) - size)
      .groupBy(partCols.map(col) :+
        floor(col("__start") / lit(targetBytes.toDouble)).as("bin"): _*)
      .agg(count(lit(1)).as("n_files"), sum(size).as("bytes"))
  }

  /** Zone-map (min/max segment) pruning advisor — "would sorting this
    * table by the predicate column actually help?" quantified, the
    * decision every Parquet/Delta/Iceberg layout choice turns on
    * (Moerkotte 1998 small materialized aggregates; the zone-map /
    * data-skipping statistic of every modern warehouse): simulate
    * `nSegments` equal-width zones under BOTH layouts — arrival order
    * (zones cut the arrival-id space) and key-sorted (zones cut the
    * key's value range, what a range partitioner produces) — probe
    * each with `probeK` md5-sampled point predicates, and report the
    * fraction of zones a point lookup must scan. Sorted layouts
    * concentrate each value into ~1 zone (scan ≈ 1/nSegments);
    * arrival layouts leave every zone's [min, max] wide (scan ≈ 1).
    * Probes key on floor(v·100 + 0.5) (an exact integer — md5 of a
    * raw double's string rendering is NOT engine-portable).
    *
    * Scale shape: one stats pass (broadcast one-row), one map-side
    * zone assignment + per-zone min/max rollup (2·nSegments rows),
    * probe selection via orderBy.limit (TakeOrderedAndProject — a
    * k-row heap, never a global sort), and a zones×probes broadcast
    * join. No window anywhere. Returns one row per layout:
    * (layout, n_segments, n_probes, scan_frac). */
  def zoneMapPruning(df: DataFrame, arrival: Column, key: Column,
      nSegments: Int = 32, probeK: Int = 20): DataFrame = {
    require(nSegments >= 2 && probeK >= 1,
      s"zoneMapPruning: nSegments=$nSegments probeK=$probeK")
    val base = df.select(arrival.cast("long").as("aid"),
      key.cast("double").as("v")).filter(col("v").isNotNull)
    val stats = base.agg(max(col("aid")).as("amax"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val segArr = least(floor(col("aid").cast("double") *
      lit(nSegments.toDouble) / (col("amax").cast("double") + lit(1.0))),
      lit(nSegments - 1.0)).cast("long")
    val segSort = when(col("vmax") > col("vmin"),
      least(floor((col("v") - col("vmin")) / (col("vmax") - col("vmin")) *
        lit(nSegments.toDouble)), lit(nSegments - 1.0)).cast("long"))
      .otherwise(lit(0L))
    val withStats = base.crossJoin(broadcast(stats))
    val zones = Seq(("arrival", segArr), ("sorted", segSort)).map {
      case (name, seg) =>
        withStats.groupBy(lit(name).as("layout"), seg.as("seg"))
          .agg(min(col("v")).as("zmin"), max(col("v")).as("zmax"))
    }.reduce(_.unionByName(_))
    // md5 min-k probe values over the EXACT integer key (2-dp grid)
    val probes = base
      .select(floor(col("v") * lit(100.0) + lit(0.5)).cast("long")
        .as("pk")).distinct()
      .orderBy(md5(col("pk").cast("string")), col("pk"))
      .limit(probeK)
      .select((col("pk").cast("double") / lit(100.0)).as("pv"))
    zones.join(broadcast(probes))
      .groupBy(col("layout"))
      .agg(countDistinct(col("seg")).as("n_segments"),
        countDistinct(col("pv")).as("n_probes"),
        sum(when(col("pv") >= col("zmin") && col("pv") <= col("zmax"),
          1L).otherwise(0L)).as("hits"))
      .select(col("layout"), col("n_segments"), col("n_probes"),
        round(col("hits").cast("double") /
          (col("n_segments") * col("n_probes")).cast("double"), 6)
          .as("scan_frac"))
  }
  /** Write a DataFrame as a BUCKETED (and bucket-sorted) managed
    * table: `buckets` files per partition keyed by hash(key), the
    * layout that makes repeated joins/aggregations on `key` FREE of
    * their shuffle — two tables bucketed the same way join with zero
    * Exchange, and (one file per bucket + the
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` flag) zero
    * Sort as well (PlanContractSpec proves both on the physical
    * plan). This is the
    * at-rest counterpart of [[clusterByZ]]'s in-file ordering and THE
    * standard answer for a 100 TB fact table that is joined on the
    * same key every day: pay the shuffle once at write time, never at
    * read time. Spark-native bucketing (hash pre-partitioning recorded
    * in the catalog), no custom machinery. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"writeBucketed: buckets=$buckets")
    // repartition on the SAME hash first so each task holds exactly
    // one bucket -> ONE file per bucket: Spark only trusts (and
    // elides) the bucket sort order when a bucket is a single file
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

}
