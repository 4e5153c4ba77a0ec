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
  /** Interval-OVERLAP join: match left `[aLo, aHi)` to right
    * `[bLo, bHi)` intervals that intersect — the interval×interval
    * sibling of [[rangeJoin]]'s point×interval (sessions × outage
    * windows, spans × spans), which a naive
    * `join(aLo < bHi && bLo < aHi)` also plans as an O(|A|·|B|)
    * BroadcastNestedLoopJoin.
    *
    * Scale design: both sides explode to the `binWidth` bins they
    * cover and EQUI-join on the bin; the residual half-open overlap
    * predicate restores exact semantics; and each overlapping pair is
    * kept EXACTLY ONCE — at the FIRST bin both intervals share,
    * `bin == max(floor(aLo/w), floor(bLo/w))` — so no distinct-dedupe
    * shuffle is ever paid (the standard spatial-join reporting trick:
    * every true overlap contains its own max-of-starts, and that point
    * lies in exactly one bin). Cost: one shuffle of
    * intervals×(bins covered) per side; candidates ≈ bin-cohabiting
    * pairs. Pick `binWidth` near the typical interval length: too
    * small multiplies the explode, too large multiplies candidates.
    *
    * Emits all columns of both inputs plus `overlap` =
    * max(0-safe) intersection length in the interval units. */
  def overlapJoin(a: DataFrame, aLo: Column, aHi: Column,
      b: DataFrame, bLo: Column, bHi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"overlapJoin: binWidth=$binWidth")
    def bins(lo: Column, hi: Column): Column =
      // half-open [lo, hi): the last covered bin is floor((hi-1)/w)
      sequence(floor(lo.cast("long") / lit(binWidth)).cast("long"),
        floor((hi.cast("long") - 1L) / lit(binWidth)).cast("long"))
    val ax = a.withColumn("__alo", aLo.cast("long"))
      .withColumn("__ahi", aHi.cast("long"))
      .filter(col("__ahi") > col("__alo"))
      .withColumn("__bin", explode(bins(col("__alo"), col("__ahi"))))
    val bx = b.withColumn("__blo", bLo.cast("long"))
      .withColumn("__bhi", bHi.cast("long"))
      .filter(col("__bhi") > col("__blo"))
      .withColumn("__bin", explode(bins(col("__blo"), col("__bhi"))))
    ax.join(bx, Seq("__bin"))
      .filter(col("__alo") < col("__bhi") && col("__blo") < col("__ahi"))
      // first-shared-bin reporting: exactly-once without distinct
      .filter(col("__bin") ===
        floor(greatest(col("__alo"), col("__blo")) / lit(binWidth))
          .cast("long"))
      .withColumn("overlap",
        least(col("__ahi"), col("__bhi")) -
          greatest(col("__alo"), col("__blo")))
      .drop("__bin", "__alo", "__ahi", "__blo", "__bhi")
  }

}
