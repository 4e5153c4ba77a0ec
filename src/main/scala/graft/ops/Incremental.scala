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
}
