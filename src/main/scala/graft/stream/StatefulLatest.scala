package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native latest-per-key (the reference keeps this state in
  * Postgres via `DISTINCT ON` + upsert,
  * /root/reference/apps/loader/load_warehouse.py:209-278; here it lives in
  * the Spark state store — SURVEY §2 ST6 / §7.4(8)).
  *
  * Scale design: state is one row per live key, partitioned by the
  * group-by shuffle exactly like a streaming aggregation; the event-time
  * TTL mirrors the reference's 3-day retention window
  * (flight_stream.py:246) so state size is bounded by (keys active within
  * TTL), not by stream history — the property that keeps a 100 TB/day
  * stream's state store flat.
  */
object StatefulLatest {

  /** Update-mode latest-per-key over a watermarked stream.
    *
    * Emits a key's row whenever its latest-so-far changes (monotone in
    * `ordMicros`; ties keep the incumbent, matching the merge layer's
    * GREATEST semantics). State for a key is dropped once the event-time
    * watermark passes `latest + ttl`.
    *
    * Input must carry a watermark (`ds.withWatermark(...)`) — required by
    * the event-time timeout and what makes `ttl` meaningful.
    */
  /** Per-key running statistics (count / sum / latest value) via
    * `mapGroupsWithState` — the "one output row per key per batch" shape,
    * complementing [[latestPerKey]]'s flatMap (0-or-1 rows) form. The
    * running aggregate is the streaming-native version of the loader's
    * cumulative fact columns. Same event-time TTL contract: state for a
    * key is dropped once the watermark passes `latestMicros + ttl`. */
  def runningStats[T](ds: Dataset[T], keyFn: T => String, ordMicros: T => Long,
      valueFn: T => Double, ttl: java.time.Duration)
      : Dataset[(String, Long, Double, Double)] = {
    implicit val stateEnc: Encoder[(Long, Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble, Encoders.scalaDouble)
    implicit val outEnc: Encoder[(String, Long, Double, Double)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
        Encoders.scalaDouble, Encoders.scalaDouble)
    val ttlMs = ttl.toMillis
    ds.groupByKey(keyFn)(Encoders.STRING)
      .mapGroupsWithState[(Long, Long, Double, Double),
        (String, Long, Double, Double)](GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[T],
            state: GroupState[(Long, Long, Double, Double)]) =>
          if (state.hasTimedOut) {
            val (_, n, sum, last) = state.get
            state.remove()
            (key, n, sum, last) // final flush on expiry
          } else {
            var (maxOrd, n, sum, last) =
              state.getOption.getOrElse((Long.MinValue, 0L, 0.0, 0.0))
            rows.foreach { r =>
              n += 1
              sum += valueFn(r)
              val o = ordMicros(r)
              if (o > maxOrd) { maxOrd = o; last = valueFn(r) }
            }
            state.update((maxOrd, n, sum, last))
            state.setTimeoutTimestamp(
              math.max(maxOrd / 1000L + ttlMs, state.getCurrentWatermarkMs + 1))
            (key, n, sum, last)
          }
      }
  }

  def latestPerKey[T](ds: Dataset[T], keyFn: T => String, ordMicros: T => Long,
      ttl: java.time.Duration)(implicit enc: Encoder[T]): Dataset[T] = {
    implicit val stateEnc: Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, enc)
    val ttlMs = ttl.toMillis
    ds.groupByKey(keyFn)(Encoders.STRING)
      .flatMapGroupsWithState[(Long, T), T](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[T], state: GroupState[(Long, T)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (bestOrd, best) = state.getOption.getOrElse((Long.MinValue, null.asInstanceOf[T]))
            var changed = false
            rows.foreach { r =>
              val o = ordMicros(r)
              if (o > bestOrd) { bestOrd = o; best = r; changed = true }
            }
            if (changed) {
              state.update((bestOrd, best))
              // TTL anchored to the key's own latest event time; clamp
              // above the current watermark (required by the API).
              state.setTimeoutTimestamp(
                math.max(bestOrd / 1000L + ttlMs, state.getCurrentWatermarkMs + 1))
              Iterator.single(best)
            } else Iterator.empty
          }
      }
  }
}
