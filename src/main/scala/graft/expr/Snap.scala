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
  * Domain: exact to ~1e38 · 1/grid. Terms with |term| · grid < 2^63
  * take a long-backed fast path; larger terms fall back to the direct
  * double→decimal cast (see snappedSum) — either way the snap is exact,
  * never saturated. Every current caller's terms are probabilities,
  * logs of probabilities, or unit-scale squared distances, far inside
  * even the fast-path bound.
  */
object Snap {

  /** Σ terms, each snapped half-up to 1/grid resolution.
    *
    * The per-row snap routes double → LONG → decimal(38,0): within the
    * |term|·grid < 2^63 domain the long cast is exact (same value the
    * direct double→decimal cast produces), and a long-backed Decimal
    * keeps Spark's fast non-BigDecimal accumulation path in the sum
    * buffer — measurably cheaper on million-row pair aggregations
    * (q282). The fast path is GUARDED, not assumed: a scaled term at or
    * beyond 2^63 (where the non-ANSI double→long cast would silently
    * saturate at Long.MaxValue) falls back to the exact double→decimal
    * cast, good to ~1e38 — so a 100 TB-scale weight blowup degrades to
    * the slow-but-correct path instead of a silently wrong sum. NaN
    * scaled terms take the fallback too and become NULL (ignored by
    * SUM), matching the pre-fast-path behavior rather than the long
    * cast's NaN→0. The SUM itself stays decimal(38,0): totals may
    * exceed 2^63 and must not wrap. */
  def snappedSum(term: Column, grid: Double): Column =
    sum(snapTerm(term, grid)).cast("double") / lit(grid)

  /** [[snappedSum]] as a WINDOW aggregate: the identical per-term snap
    * summed over `w`'s WHOLE partition. Lets a per-group normalizer
    * (the q169 softmax Σexp) ride a chained window pass — one exchange
    * + sort — instead of a groupBy + join back, with bit-identical
    * values (the snap makes the sum order-free, so the window's
    * evaluation order cannot matter either). The full-partition frame
    * is FORCED here (ADVICE r13): on an ORDER BY'd spec the default
    * frame is unboundedPreceding..currentRow, which would silently
    * turn the normalizer into a running sum — the override makes the
    * whole-partition contract structural instead of scaladoc-only. */
  def snappedSumOver(term: Column, grid: Double,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    import org.apache.spark.sql.expressions.Window
    sum(snapTerm(term, grid))
      .over(w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing))
      .cast("double") / lit(grid)
  }

  /** DRIVER twin of [[snappedSum]] — bit-identical by construction
    * (≡-property-tested): the same per-term snap (fast-path long floor
    * under the 2^63 guard, exact BigDecimal fallback above it,
    * non-finite terms dropped like the NULL-ignoring SUM), the same
    * decimal accumulation, the same final double cast and grid divide.
    * For iterative operators whose per-round state is dim-sized and
    * already ships through the driver as a broadcast (Bradley–Terry's
    * strength vector): normalizing ON the driver replaces a per-round
    * checkpoint barrier with one collect, with identical values —
    * the snap exists precisely so accumulation order (including
    * "driver vs executors") cannot matter. */
  def snappedSumDriver(terms: Iterator[Double], grid: Double): Double = {
    var acc = java.math.BigDecimal.ZERO
    while (terms.hasNext) {
      val t = terms.next()
      val d = t * grid + 0.5
      if (math.abs(d) < Long.MaxValue.toDouble)
        acc = acc.add(java.math.BigDecimal.valueOf(math.floor(d).toLong))
      else if (!d.isNaN && !d.isInfinite && math.abs(d) < 1e38)
        // the column fallback is a double→decimal(38,0) CAST: Spark
        // converts via the shortest decimal repr (BigDecimal.valueOf)
        // with HALF_UP, and a decimal(38,0) overflow becomes NULL
        // (dropped) — replicated exactly, incl. the 1e38 bound
        acc = acc.add(java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP))
    }
    acc.doubleValue() / grid
  }

  private def snapTerm(term: Column, grid: Double): Column = {
    // Guard on the RAW scaled double, NOT on floor(d): Spark's
    // floor(double) itself returns LongType, so it saturates at
    // Long.MaxValue before any downstream guard could look — testing
    // after floor is testing the saturated value.
    val d = term * lit(grid) + lit(0.5)
    // Long.MaxValue.toDouble == 2^63 exactly. Below it, floor's
    // double→long is exact (the fast path — a long-backed Decimal in
    // the sum buffer). At or above it, |d| ≥ 2^63 > 2^53 means d is
    // ALREADY an exact integer (ulp ≥ 2048): floor and the +0.5 are
    // no-ops, and the direct double→decimal cast is exact to ~1e38.
    // NaN fails the comparison and becomes NULL via the decimal cast
    // (ignored by SUM) — never the long cast's NaN→0.
    when(abs(d) < lit(Long.MaxValue.toDouble),
         floor(d).cast("decimal(38,0)"))
      .otherwise(d.cast("decimal(38,0)"))
  }
}
