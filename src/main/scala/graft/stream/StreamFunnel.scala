package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming ordered-funnel maintenance — the online half of q216
  * ([[graft.ops.Analytics.funnel]]): per micro-batch, fold the new
  * events into one maintained MIN-arrival timestamp per (unit, stage)
  * and emit the refreshed stage-count funnel. State is |stages|
  * timestamps per unit — never an event list — the same bounded-state
  * shape as the batch operator's join chain.
  *
  * Semantics contract (documented, spec-pinned): stage-k arrivals
  * evaluate STRICTLY AFTER the unit's stage-(k−1) arrival as known AT
  * BATCH TIME — in-order delivery reproduces the batch funnel exactly
  * (QualitySpec); an out-of-order unlocking event (a view arriving
  * AFTER a click already streamed past) does not replay history — the
  * standard watermark-style approximation every one-timestamp-per-
  * stage streaming funnel makes (exact retroactive semantics would
  * need the full event history as state).
  */
object StreamFunnel {

  def startFunnelSink(eventStream: DataFrame, unitCol: String,
      tsCol: String, stageCol: String, stages: Seq[String],
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(stages.nonEmpty, "startFunnelSink: no stages")
    val spark0 = eventStream.sparkSession
    // state: (u, i, t) — min arrival per (unit, stage index)
    val empty = spark0.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("u",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType))))
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](
      empty.localCheckpoint(true))
    eventStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val ev = batch.select(col(unitCol).cast("string").as("u"),
            col(tsCol).cast("long").as("ts"), col(stageCol).as("st"))
            .localCheckpoint(true) // one consumer per stage below
          // fold stages sequentially: stage k's candidates gate on the
          // JUST-refreshed stage-(k−1) arrival
          var prevArr: DataFrame = null
          val arrivals = stages.zipWithIndex.map { case (st, i) =>
            val old = state.get().filter(col("i") === i)
              .select(col("u"), col("t"))
            val cand0 = ev.filter(col("st") === st)
            val cand = if (i == 0) cand0.select(col("u"), col("ts"))
              else cand0.join(prevArr.select(col("u"),
                  col("t").as("tp")), "u")
                .filter(col("ts") > col("tp"))
                .select(col("u"), col("ts"))
            val arr = cand.groupBy(col("u"))
              .agg(min(col("ts")).as("t"))
              .join(old.select(col("u"), col("t").as("told")),
                Seq("u"), "full_outer")
              .select(col("u"),
                least(coalesce(col("t"), col("told")),
                  coalesce(col("told"), col("t"))).as("t"))
              .localCheckpoint(true) // consumers: next stage, state, count
            prevArr = arr
            arr.select(col("u"), lit(i).as("i"), col("t"))
          }
          val next = arrivals.reduce(_.unionByName(_)).localCheckpoint(true)
          state.set(next)
          val counts = arrivals.zip(stages).zipWithIndex.map {
            case ((a, st), i) => a.agg(count(lit(1)).as("n_units"))
              .select(lit(i + 1L).as("stage_idx"), lit(st).as("stage"),
                col("n_units"))
          }.reduce(_.unionByName(_))
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col("stage_idx"))
          sink(counts
            .withColumn("prev", lag(col("n_units"), 1).over(w))
            .withColumn("first", first(col("n_units")).over(
              w.rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))
            .select(col("stage_idx"), col("stage"), col("n_units"),
              round(col("n_units").cast("double") /
                col("prev").cast("double"), 6).as("conv_prev"),
              round(col("n_units").cast("double") /
                col("first").cast("double"), 6).as("conv_first")),
            epochId)
        }
      }
      .start()
  }
}
