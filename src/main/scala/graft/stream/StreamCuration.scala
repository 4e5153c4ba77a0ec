package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming example construction — [[graft.ops.Packing.spanCorruption]]
  * on an arriving document stream: each micro-batch of new documents is
  * masked into (input, target) denoising examples at ingest time. The
  * masking is a pure per-document function of (doc, startPct, spanLen)
  * — md5-derived span starts, no RNG state, no cross-document
  * dependence — so the union of batch outputs is bit-identical to the
  * batch construction over the unioned docs (CurationOpsSpec) and
  * at-least-once replay is idempotent. Zero long-lived state; empty
  * batches skip (the S7 guard). The same split as every serving sink
  * here: parameters decided offline, per-batch work purely functional.
  */
object StreamCuration {

  def startSpanCorruptionSink(docStream: DataFrame, idCol: String,
      textCol: String, startPct: Int, spanLen: Int, checkpointDir: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.ops.Packing.spanCorruption(batch, col(idCol),
            col(textCol), startPct, spanLen), epochId)
        }
      }
      .start()

  /** q170's fill-in-the-middle construction at INGEST time: like the
    * span-corruption sink, the construction is a pure per-document
    * md5-derived function — union of batch outputs ≡ batch construction
    * over the unioned docs, at-least-once replay is idempotent, zero
    * long-lived state. */
  /** Per-epoch PSI drift of an arriving score stream against a STATIC
    * reference corpus (q175's monitor at ingest time): each micro-batch
    * reports, per group, how far its score distribution sits from the
    * reference — the alarm a scored admission pipeline needs while the
    * gate is live. The reference is an offline decision (the same
    * train-once/serve-many split as the NB model and the IVF·PQ
    * index); per-batch work is one psiDrift over (reference, batch).
    * Bin edges derive from reference ∪ batch min/max, so each epoch is
    * a self-contained diagnostic (documented: a batch extending the
    * score range re-bins its own epoch, never past ones). Uses
    * `identity` materialization inside the batch — micro-batches are
    * small and a checkpoint per epoch would dominate. */
  def startPsiDriftSink(reference: DataFrame, scoreStream: DataFrame,
      grpCol: String, xCol: String, bins: Int, checkpointDir: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    scoreStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.ops.Analytics.psiDrift(reference, batch,
            col(grpCol), col(xCol), bins, materialize = df => df), epochId)
        }
      }
      .start()

  def startFimSink(docStream: DataFrame, idCol: String, textCol: String,
      spmPct: Int, checkpointDir: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.ops.Packing.fimSplit(batch, col(idCol), col(textCol),
            spmPct), epochId)
        }
      }
      .start()
}
