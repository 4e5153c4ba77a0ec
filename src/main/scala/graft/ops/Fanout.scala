package graft.ops

import org.apache.spark.sql.DataFrame

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
}
