package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left points to right `[lo, hi]` intervals
  * — another operator Spark has no native physical strategy for. A naive
  * `join(points, lo <= p && p <= hi)` plans as BroadcastNestedLoopJoin:
  * O(|L|·|R|) comparisons, a non-starter at scale.
  *
  * Scale design — bucket quantization: choose a bucket width comparable
  * to typical interval length; each interval explodes to the buckets it
  * overlaps (short intervals → few buckets), each point maps to exactly
  * one bucket; an EQUI-join on the bucket prunes candidates to
  * same-bucket pairs, and the residual `between` filter restores exact
  * semantics. Cost: one shuffle of points + intervals×(buckets covered),
  * candidate pairs ≈ those that actually overlap — the standard
  * quantized interval-join used by spatial/temporal engines.
  */
object RangeJoin {

  /** @param points      left side, one row per point
    * @param pointCol    point column (numeric/timestamp expressed as long micros externally)
    * @param intervals   right side with `[loCol, hiCol]` inclusive bounds
    * @param bucketWidth quantization width in the point's units
    */
  def rangeJoin(points: DataFrame, pointCol: Column,
      intervals: DataFrame, loCol: Column, hiCol: Column,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(pointCol / lit(bucketWidth)).cast("long"))
    val i = intervals
      .withColumn("__blo", floor(loCol / lit(bucketWidth)).cast("long"))
      .withColumn("__bhi", floor(hiCol / lit(bucketWidth)).cast("long"))
      .withColumn("__bucket", explode(sequence(col("__blo"), col("__bhi"))))
      .drop("__blo", "__bhi")
    p.join(i, Seq("__bucket"))
      .filter(pointCol >= loCol && pointCol <= hiCol)
      .drop("__bucket")
  }
}
