package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream correlation — the streaming-native upgrade
  * of the reference's "match departure and arrival snapshots of the same
  * flight in the warehouse" (the loader joins dep/arr rows by key in
  * Postgres, /root/reference/apps/loader/load_warehouse.py:236-243; here
  * both sides are live streams and the join runs in the state store).
  *
  * Scale design: the equi-key condition makes this a shuffled
  * symmetric-hash join partitioned by the key; the TIME-INTERVAL bound
  * plus both watermarks is what lets Spark evict state — without the
  * interval the state store grows with stream history. State per side is
  * bounded by (events within watermark + interval), the same
  * bounded-by-time property as [[StatefulLatest]].
  */
object StreamJoin {

  /** Inner interval join: rows of `left` match rows of `right` with the
    * same `key` whose `rightTs` lies in [leftTs, leftTs + maxGap].
    * Both inputs MUST carry watermarks for state cleanup. The output
    * keeps ONE unambiguous `key` column (the left side's); the right
    * side's duplicate is dropped so consumers can select/group by it. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, maxGap: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $maxGap"),
      "inner")
      .drop(right(key))

  /** Stream-static enrichment: every micro-batch left-joins the live
    * stream against a STATIC dimension table (the airline/airport lookup
    * the reference does per loader cycle in Postgres,
    * load_warehouse.py:167-199 — here it happens inline in the stream,
    * no round-trip). The static side is broadcast: each micro-batch is
    * a map-side hash lookup, no shuffle of the stream, no streaming
    * state at all (Spark re-plans the static side per batch, so a
    * replaced dim TABLE is picked up on the next trigger at the
    * source level). Left-outer keeps unmatched stream rows — enrichment
    * must never drop events (the reference's dim misses become NULL
    * keys, same semantics). */
  def enrichStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
