package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent floating-point aggregation: snap each term to a
  * fixed grid and sum as exact decimals, so the result is identical
  * under ANY summation order — partitioning, engine, or retry cannot
  * flip a rounded digit. The single definition of the snapping contract
  * shared by the entropy (q104), NLL (q73/q113), and silhouette (q115)
  * aggregates; the oracle SQL writes the same
  * `sum(CAST(floor(term * grid + 0.5) AS DECIMAL(38,0))) / grid`.
  *
  * Domain: |term| · grid must stay under 2^63 (Spark's floor(double)
  * yields a long) — e.g. |term| < 9e9 on the 1e9 grid. Every current
  * caller's terms are probabilities, logs of probabilities, or
  * unit-scale squared distances, far inside the bound.
  */
object Snap {

  /** Σ terms, each snapped half-up to 1/grid resolution.
    *
    * The per-row snap routes double → LONG → decimal(38,0): within the
    * documented |term|·grid < 2^63 domain the long cast is exact (same
    * value the direct double→decimal cast produces), and a long-backed
    * Decimal keeps Spark's fast non-BigDecimal accumulation path in the
    * sum buffer — measurably cheaper on million-row pair aggregations
    * (q282). The SUM itself stays decimal(38,0): totals may exceed
    * 2^63 and must not wrap. */
  def snappedSum(term: Column, grid: Double): Column =
    sum(floor(term * lit(grid) + lit(0.5)).cast("long")
        .cast("decimal(38,0)"))
      .cast("double") / lit(grid)
}
