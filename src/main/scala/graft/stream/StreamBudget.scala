package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-source budget admission — the online counterpart of
  * [[graft.ops.Sampling.sourceBudget]]: admit a document while its
  * source's RUNNING total of payload size stays within `budget`, then
  * drop everything after (quota enforcement at ingest, before any
  * storage or downstream compute is spent on over-quota domains).
  *
  * Semantics: the batch operator's PREFIX-CUT rule, applied in
  * arrival order across batches (the online setting has no global md5
  * order to replay): the running total charges EVERY document seen —
  * admitted or not — and a document is admitted iff the total
  * including it stays ≤ budget. Once a source overflows, everything
  * after drops (no greedy back-fill with smaller documents), exactly
  * like [[graft.ops.Sampling.sourceBudget]]'s cumulative filter.
  * Within a batch the buffered group sorts on (ordKey, row.toString) —
  * a deterministic total order — so a checkpointed replay of the same
  * batches admits the same documents.
  *
  * Scale shape: state is ONE long per source (the running total) —
  * bounded by the number of sources, not stream history, with no TTL
  * needed; per-batch memory is one source's batch slice (the sort
  * buffer), the same bound as any per-key stateful op. */
object StreamBudget {

  /** @param key     source/domain of a row
    * @param ordKey  deterministic within-batch admission order (e.g.
    *                md5 of the id — any total order)
    * @param size    payload size of a row
    * @return        admitted rows only */
  def admitWithinBudget[T](ds: Dataset[T], key: T => String,
      ordKey: T => String, size: T => Long, budget: Long)
      (implicit rowEnc: Encoder[T]): Dataset[T] = {
    require(budget > 0, s"admitWithinBudget: need budget > 0 ($budget)")
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState[Long, T](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[T], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val admitted = rows.toSeq
            .sortBy(r => (ordKey(r), r.toString))
            .flatMap { r =>
              cum += size(r) // charge every arrival: prefix-cut, not greedy
              if (cum <= budget) Some(r) else None
            }
          state.update(cum)
          admitted.iterator
      }
  }
}
