package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-driven incremental export
  * (/root/reference/apps/sheets_sink/sheets_sink.py:88-105,246-335):
  * read rows strictly newer than the watermark in deterministic order,
  * bounded batch; advance the watermark monotonically.
  */
object Incremental {

  /** F6 + O1: `WHERE wmCol > watermark ORDER BY orderCols LIMIT n`.
    * Plans as TakeOrderedAndProject — no global sort materialization. */
  def exportBatch(df: DataFrame, wmCol: Column, watermark: Column,
      orderCols: Seq[Column], n: Int): DataFrame =
    df.filter(wmCol > watermark).orderBy(orderCols: _*).limit(n)

  /** U7/A2: next watermark = greatest(old, max(batch)) — monotonic. */
  def advanceWatermark(batch: DataFrame, wmCol: Column, old: Column): DataFrame =
    batch.agg(greatest(max(wmCol), old).as("watermark"))

  /** The sink's main loop (sheets_sink.py:300-335): drain the table in
    * watermark order, `n` rows per batch, advancing the watermark after
    * each append — returns the batches in export order. Driver-side loop
    * by design (state = one scalar), each batch a distributed
    * TakeOrdered job. Requires `wmCol` values unique per row (the
    * reference's `last_updated`); ties at a batch boundary would
    * otherwise re-export. */
  def drainAll(df: DataFrame, wmCol: Column, orderCols: Seq[Column],
      start: Any, n: Int): Seq[DataFrame] = {
    var wm: Any = start
    val out = Seq.newBuilder[DataFrame]
    var done = false
    while (!done) {
      val batch = exportBatch(df, wmCol, lit(wm), orderCols, n)
      val rows = batch.agg(count(lit(1)), max(wmCol)).first()
      if (rows.getLong(0) == 0L) done = true
      else { out += batch; wm = rows.get(1) }
    }
    out.result()
  }
}
