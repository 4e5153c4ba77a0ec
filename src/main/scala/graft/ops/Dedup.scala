package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-per-key / distinct operators — the reference's signature
  * aggregation (`DISTINCT ON (key) … ORDER BY key, ingest_time DESC`,
  * /root/reference/apps/loader/load_warehouse.py:33-41,209-213).
  */
object Dedup {

  /** Latest full row per key, aggregation form: `max_by(struct(*), ord)`.
    *
    * Preferred at scale over the window form — partial aggregation
    * combines map-side before the shuffle, so the shuffle carries one row
    * per (partition, key) instead of every row. `orderCols` must be a
    * deterministic total order (append a unique id as tie-break).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(orderCols: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(col("__row.*"))
  }

  /** Latest-per-key with a FULL-PAYLOAD tie-break, packed form:
    * `max(struct(ordPrefix…, remaining-columns-sorted))`.
    *
    * Equivalent to [[latestPerKey]] with
    * `orderCols = ordPrefix :+ struct(payload)` — the total order
    * compares the prefix first, then the remaining columns
    * lexicographically by name — but the shuffle carries each row ONCE:
    * `max_by(payload, ord)` ships (payload, ord) and a full-payload
    * tie-break makes that 2× the row; `max` over one packed struct
    * halves the dedup's shuffle volume. Used by the load cycle, where
    * staging has no unique row id and equal ingest_times are common
    * (every unparsable ingest_ts in a batch gets the same fallback). */
  def latestPerKeyTotal(df: DataFrame, keys: Seq[String],
      ordPrefix: Seq[String]): DataFrame = {
    val rest = df.columns
      .filterNot(c => keys.contains(c) || ordPrefix.contains(c)).sorted
    val packed = struct((ordPrefix ++ rest).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__row"))
      .select(df.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"__row.$c")).toIndexedSeq: _*)
  }

  /** Window-function form (`row_number over partitionBy(key) = 1`) — the
    * literal rewrite of Postgres `DISTINCT ON`. Sorts every group; use
    * when you also need the rank or explicit NULL-ordering control. */
  def latestPerKeyWindow(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** `SELECT DISTINCT <cols>` (route-pair projection, D3). */
  def distinctPairs(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Exact content dedup: group identical content by hash, keep the lowest
    * id as canonical survivor. Shuffles only (hash, id) pairs after
    * map-side partial agg. */
  def exactDedup(df: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(contentCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
}
