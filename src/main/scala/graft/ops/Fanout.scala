package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Partition for the EXPANDED output, not the input: before an operator
  * that multiplies data (shingle/token explodes, pair scoring, JSON
  * synthesis), a compact input scan — often a single partition at small
  * scale — must be spread across the cluster or one task does all the
  * downstream work. Round-robin is safe wherever downstream aggregation
  * is order-independent (min/max, integer counts, per-row maps).
  */
object Fanout {
  def fanout(df: DataFrame): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)

  /** Pin the partitioning of a fanout OUTPUT before its aggregation:
    * `repartition(n, keys)` — REPARTITION_BY_NUM, which AQE's
    * shuffle-read coalescing is forbidden to collapse. [[fanout]]
    * guards the fanout's INPUT; the exchange the downstream
    * `groupBy(keys)` inserts on the fanout's OUTPUT is a plain
    * `ENSURE_REQUIREMENTS` exchange that AQE may coalesce to ONE
    * partition when the compressed pair bytes sit under the advisory
    * size — small bytes, huge per-byte CPU (the aggregation over the
    * whole candidate-pair set runs serially in one task; q331's
    * measured 12s mode). Pinning on the aggregation keys satisfies
    * the aggregate's required distribution — no second exchange —
    * while keeping the aggregation at full width. Use on every
    * pair-expanding aggregate whose exchange carries few bytes per
    * output row of work. */
  def pin(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      keys: _*)
}
