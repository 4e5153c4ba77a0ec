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

  /** ADMISSION-TIME curation gating — the q182 funnel's per-row gates
    * applied to each arriving micro-batch against STATIC serving
    * artifacts (the train-once/serve-many split, three models at once):
    * Gopher rules (pure per-row), the per-source NLL gate scored
    * against a broadcastable (term, p) unigram-probability table with
    * per-source thresholds, and bloom-staged decontamination against a
    * fixed mask. Emits one row per doc with the three flags and the
    * conjunctive `admit` bit — route-or-drop is the sink's choice.
    * Every decision is a pure function of (row, static artifacts), so
    * union-of-batches ≡ batch gating of the unioned docs and replay is
    * idempotent; the dedup gate is deliberately NOT here — canonical
    * retention needs maintained state, which is
    * [[StreamDedup.startDedupGroupSink]]'s job downstream.
    *
    * `probs` = (term, p); `thresholds` = (source, threshold) — both
    * model-sized and broadcast; `benchMask` = a
    * [[graft.ops.Sketch.bloomMask]] one-row frame. NLL scoring follows
    * the q73 contract (Snap 1e9 sum, 4-dp mean); unseen terms get
    * `pUnseen` (the corpus-min probability is the usual choice). */
  def startAdmissionSink(docStream: DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      probs: DataFrame, pUnseen: Double, thresholds: DataFrame,
      benchMask: DataFrame, bits: Int, k: Int,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import graft.expr.{Snap, TextStats}
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val base = batch.select(col(idCol).as("doc_id"),
            col(textCol).as("text"), col(sourceCol).as("source"))
          val gopher = TextStats.gopherRules(base, col("doc_id"),
              col("text"))
            .select(col("doc_id"), col("keep").as("f_gopher"))
          val nll = base
            .select(col("doc_id"),
              explode(TextStats.tokens(col("text"))).as("term"))
            .groupBy(col("doc_id"), col("term"))
            .agg(count(lit(1)).as("tf"))
            .join(broadcast(probs), Seq("term"), "left")
            .groupBy(col("doc_id"))
            .agg(sum(col("tf")).as("n_tok"),
              round(-Snap.snappedSum(col("tf").cast("double") *
                  log(coalesce(col("p"), lit(pUnseen))), 1e9) /
                sum(col("tf")).cast("double"), 4).as("nll"))
          val contaminated = graft.ops.Sketch.bloomPruneMask(
              graft.ops.TextDedup.shingleSet(base, col("doc_id"),
                col("text"), 5),
              col("shingle"), benchMask, bits, k)
            .select(col("doc_id")).distinct()
            .withColumn("f_hit", lit(true))
          val flags = base.select(col("doc_id"), col("source"))
            .join(gopher, "doc_id")
            .join(nll.select(col("doc_id"), col("nll")), "doc_id")
            .join(broadcast(thresholds), "source")
            .join(contaminated, Seq("doc_id"), "left")
            .select(col("doc_id"), col("source"), col("f_gopher"),
              (col("nll") <= col("threshold")).as("f_nll"),
              col("f_hit").isNull.as("f_clean"))
            .withColumn("admit",
              col("f_gopher") && col("f_nll") && col("f_clean"))
          sink(flags, epochId)
        }
      }
      .start()
  }

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

  /** q170's fill-in-the-middle construction at INGEST time: like the
    * span-corruption sink, the construction is a pure per-document
    * md5-derived function — union of batch outputs ≡ batch construction
    * over the unioned docs, at-least-once replay is idempotent, zero
    * long-lived state. */
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
