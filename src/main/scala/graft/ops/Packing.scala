package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: concatenate documents (in
  * deterministic id order) into one virtual token stream and chunk it
  * into fixed-size context windows — each doc gets its global token
  * offset and the range of training sequences it lands in. The
  * concat-then-chunk packing GPT-style pipelines use; a doc may
  * straddle two sequences, exactly like the real thing.
  *
  * Scale design: the global running offset is a DISTRIBUTED prefix sum,
  * not one global window (which would move the whole corpus to a single
  * partition — the WindowExec "No Partition Defined" trap):
  *   1. docs bucket by id range; per-bucket token totals aggregate with
  *      map-side combine (one tiny row per bucket);
  *   2. the only unpartitioned window runs over the BUCKET TOTALS —
  *      |buckets| rows, thousands at 100 TB, not billions;
  *   3. within-bucket offsets are a window partitioned by bucket —
  *      parallel across buckets, state bounded by bucket width.
  */
object Packing {

  /** @param ctxTokens   context window length in tokens
    * @param bucketWidth id-range width per prefix-sum bucket; size it so
    *                    a bucket's rows fit one task (offsets stay exact
    *                    regardless of the choice) */
  def concatChunk(docs: DataFrame, id: Column, nTokens: Column,
      ctxTokens: Long, bucketWidth: Long = 1000L): DataFrame = {
    val base = docs.select(id.as("doc_id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("__b", floor(col("doc_id") / lit(bucketWidth)).cast("long"))
    val bucketTotals = base.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
    val wBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketTotals
      .withColumn("__boff", coalesce(sum(col("__bt")).over(wBuckets), lit(0L)))
      .drop("__bt")
    val wInBucket = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), Seq("__b"))
      .withColumn("start_off",
        col("__boff") + coalesce(sum(col("n_tokens")).over(wInBucket), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        floor(col("start_off") / lit(ctxTokens)).cast("long").as("seq_first"),
        floor((col("start_off") + col("n_tokens") - 1L) / lit(ctxTokens))
          .cast("long").as("seq_last"))
  }

  /** Sliding-window chunking with overlap: each document yields context
    * windows `[k·stride, min(k·stride + ctxTokens, n))` for every start
    * inside the doc — the strided variant of [[concatChunk]] used when
    * adjacent windows should share `ctxTokens − stride` tokens of
    * context (long-document training, retrieval passage splitting).
    *
    * Pure per-row generation: `sequence` + `explode`, output bounded by
    * ⌈n/stride⌉ chunks per doc, ZERO shuffles at any scale — chunking
    * never needs to know about any other document. */
  def slidingChunks(docs: DataFrame, id: Column, nTokens: Column,
      ctxTokens: Long, stride: Long): DataFrame = {
    require(stride > 0 && ctxTokens >= stride,
      s"slidingChunks: need 0 < stride ($stride) <= ctxTokens ($ctxTokens)")
    docs.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1L, lit(stride)))
          .as("chunk_start"))
      .select(col("doc_id"),
        (col("chunk_start") / lit(stride)).cast("long").as("chunk_idx"),
        col("chunk_start"),
        least(col("chunk_start") + lit(ctxTokens), col("n_tokens"))
          .as("chunk_end"))
  }
}
