package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar derivations from the reference's producer + Tableau layer. */
object Flags {

  /** On-time flag (/root/reference/README.md:257-271): NULL-guarded
    * `delay <= threshold` → 1/0, NULL delay → NULL. */
  def onTimeFlag(delay: Column, threshold: Double = 5.0): Column =
    when(delay.isNull, lit(null).cast("int"))
      .when(delay <= threshold, lit(1)).otherwise(lit(0))

  /** Flight-number fallback chain
    * (/root/reference/apps/producer/run_producer.py:50-59). */
  def flightNum(iata: Column, icao: Column, number: Column): Column =
    coalesce(iata, icao, number, lit("UNKNOWN"))

  /** Stable dedup/merge key `"<num>_<dep_sched>"`
    * (/root/reference/apps/producer/run_producer.py:54-63). */
  def flightKey(num: Column, depSched: Column): Column =
    concat_ws("_", num, depSched)

  /** Deterministic surrogate key for a dimension natural key — replaces the
    * reference's stateful IDENTITY columns
    * (/root/reference/db/00_warehous.sql:79,88,98) with a distributable,
    * order-independent 60-bit hash. NULL natural keys stay NULL (mirrors
    * the reference's NULL-unique handling, load_warehouse.py:51-55).
    *
    * md5-derived (the library's shared hashing vocabulary, as in
    * [[graft.ops.Merge.tableChecksum]]) rather than xxhash64 so any
    * engine can replay the id: `CAST(('0x' || substr(md5(canon), 1, 15))
    * AS BIGINT)` in DuckDB. Field framing is injection-proof: each
    * non-NULL component renders as `length:value` so a '|' INSIDE a
    * value cannot shift field boundaries — ("a|b","c") and ("a","b|c")
    * canonicalize differently. NULL components render as the bare
    * sentinel (no length prefix, so a literal sentinel VALUE renders
    * "1:␀" and cannot collide with NULL). */
  def surrogateId(naturalKey: Column*): Column = {
    val anyNonNull = naturalKey.map(_.isNotNull).reduce(_ || _)
    val canon = concat_ws("|", naturalKey.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("␀"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*)
    when(anyNonNull, Similarity.md5PrefixLong(canon, 15))
      .otherwise(lit(null).cast("long"))
  }
}
