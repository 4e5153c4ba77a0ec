package graft.stream

import org.apache.spark.sql.{Column, DataFrame}

import graft.ops.Sketch

/** Streaming sketches: the relational sketch family of
  * [[graft.ops.Sketch]] maintained incrementally over a stream.
  *
  * The HLL register matrix is a max-semilattice over (group, bucket)
  * rows — merging is `max`, which is exactly what a streaming
  * aggregation in Update mode computes incrementally. So the streaming
  * form IS the batch expression, unchanged: Spark's state store holds
  * the ≤ 2^b registers per group (bounded by construction — registers
  * only grow, never retract, and no watermark is needed for
  * correctness), and every micro-batch emits only the registers it
  * changed. The contract — streaming registers after any prefix equal
  * [[Sketch.hllRegisters]] run as a batch over the same prefix — is the
  * same mergeability that combines 100 TB shard partials, and is
  * spec-asserted (`StatefulStreamSpec`).
  */
object StreamSketch {

  /** Running distinct-count registers over a stream. Run with
    * `OutputMode.Update`; feed changed registers to
    * [[Sketch.hllEstimate]] per micro-batch (foreachBatch) or keep the
    * max-per-(group,bucket) downstream — since registers are monotone,
    * ANY fold of emitted rows by max reconstructs the current sketch. */
  def hllRunningRegisters(stream: DataFrame, groupCols: Seq[String],
      item: Column, b: Int = 6): DataFrame =
    Sketch.hllRegisters(stream, groupCols, item, b)
}
