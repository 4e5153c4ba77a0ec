package graft.stream

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the streaming-native form of
  * [[graft.ops.Dedup.exactDedup]] for at-least-once ingest (the
  * reference's duplicate staging appends, SURVEY ST4).
  *
  * `dropDuplicatesWithinWatermark` keeps one state row per key only
  * until the event-time watermark passes it + `delay` — the same
  * bounded-state property as [[StatefulLatest]]: state size tracks keys
  * active within the horizon, not stream history.
  */
object StreamDedup {

  def exactDedupStream(df: DataFrame, keys: Seq[String],
      eventTimeCol: String, delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
