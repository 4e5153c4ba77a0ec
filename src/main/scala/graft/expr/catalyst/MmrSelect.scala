package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Whole-greedy-loop MMR selection (Carbonell & Goldstein 1998) as ONE
  * native expression over a per-query candidate array — the executor-side
  * replacement for [[graft.ops.Ann.mmrRerank]]'s former k-step driver
  * loop (~50 sequential tiny jobs at the q155 call site; VERDICT r13 #1).
  * Per-query MMR state is shortlist²-bounded, so the whole iteration
  * belongs INSIDE one row's eval, not across k Spark jobs: job count is
  * now independent of k, and on a real cluster the query costs one
  * aggregation instead of k × per-job scheduler latency.
  *
  * Input: `array<struct<n_id: orderable, rel: double, v: array<double|float>>>`
  * (one element per shortlist candidate of one query). Output:
  * `array<struct<pos: long, n_id, rel, maxsim, mmr>>` — the k greedy
  * picks, pos 1-based, fewer than k when the shortlist runs dry.
  *
  * Bit-faithful to the former relational unrolling (and to the DuckDB
  * oracle that replays it):
  *  - pairwise sims are [[VectorOps.cosine]] (the exact accumulation
  *    order of `aggregate(zip_with(...))`), snapped to 6 dp;
  *  - each step scores round(λ·rel − (1−λ)·maxsim, 6) with Spark's own
  *    double `round` semantics ([[MmrSelect.round6]], ≡-property-tested
  *    against the `round` column function) and (1−λ) the same IEEE
  *    driver-side subtraction `lit(1.0 - lambda)` performed;
  *  - the argmax replays `min(struct(-score, n_id, rel, maxsim))`:
  *    lexicographic, per-field nulls-first, doubles in Spark's total
  *    order (java.lang.Double.compare: NaN greatest, -0.0 < 0.0),
  *    n_id by the type's interpreted ordering;
  *  - maxsim is max over sims to the selected set ignoring NULL sims
  *    (zero-norm / length-mismatch vectors), 0.0 when none — the
  *    `coalesce(max(sim), 0.0)` of the former left join;
  *  - a pick retires EVERY candidate row sharing its n_id (the former
  *    per-step anti-join was keyed on n_id).
  *
  * Evaluation is CodegenFallback: it sits once-per-query above a
  * collect_list aggregation (never in a corpus-sized hot path) and does
  * O(k · shortlist · |selected|) bounded work per row with sims computed
  * on demand and memoized.
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"MmrSelect: k=$k")
  require(lambda >= 0.0 && lambda <= 1.0, s"MmrSelect: lambda=$lambda")

  private def candFields: Array[StructField] = child.dataType match {
    case ArrayType(StructType(fields), _) => fields
    case _ => Array.empty
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = candFields
    val ok = f.length == 3 && f(1).dataType == DoubleType &&
      (f(2).dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }) && TypeUtils.checkForOrderingExpr(f(0).dataType, prettyName)
        .isSuccess
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<id: orderable, rel: double, " +
        s"v: array<float|double>>>, got ${child.dataType.sql}")
  }

  private lazy val idField: StructField = candFields(0)
  private lazy val vecFloat: Boolean =
    candFields(2).dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idField.dataType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("n_id", idField.dataType, idField.nullable),
    StructField("rel", DoubleType, nullable = true),
    StructField("maxsim", DoubleType, nullable = false),
    StructField("mmr", DoubleType, nullable = true))), containsNull = false)

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_mmr_select"

  // nulls-first comparison of boxed doubles under Spark's total order
  private def cmpNs(a: java.lang.Double, b: java.lang.Double): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else java.lang.Double.compare(a.doubleValue(), b.doubleValue())

  private def cmpId(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else idOrdering.compare(a, b)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Any](n)
    val rels = new Array[java.lang.Double](n)
    val vecs = new Array[ArrayData](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 3)
        ids(m) =
          if (row.isNullAt(0)) null
          else InternalRow.copyValue(row.get(0, idField.dataType))
        rels(m) =
          if (row.isNullAt(1)) null
          else java.lang.Double.valueOf(row.getDouble(1))
        vecs(m) = if (row.isNullAt(2)) null else row.getArray(2)
        m += 1
      }
      i += 1
    }
    // pairwise 6-dp sims, memoized on demand (only candidate × selected
    // pairs are ever requested — ≤ k·m of the m² grid)
    val simVal = new Array[java.lang.Double](m * m)
    val simDone = new Array[Boolean](m * m)
    def simAt(a: Int, b: Int): java.lang.Double = {
      val idx = a * m + b
      if (!simDone(idx)) {
        val s =
          if (vecs(a) == null || vecs(b) == null) null
          else VectorOps.cosine(vecs(a), vecFloat, vecs(b), vecFloat)
        simVal(idx) =
          if (s == null) null
          else java.lang.Double.valueOf(MmrSelect.round6(s.doubleValue()))
        simDone(idx) = true
      }
      simVal(idx)
    }
    val oneMinus = 1.0 - lambda
    val retired = new Array[Boolean](m)
    val selIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 1
    var dry = false
    while (pos <= k && !dry) {
      var best = -1
      var bestNs: java.lang.Double = null
      var bestMs = 0.0
      var cand = 0
      while (cand < m) {
        if (!retired(cand)) {
          // maxsim vs the selected set: max of non-null sims, else 0.0
          var ms = 0.0
          var found = false
          var s = 0
          while (s < selIdx.length) {
            val sv = simAt(cand, selIdx(s))
            if (sv != null &&
                (!found ||
                  java.lang.Double.compare(sv.doubleValue(), ms) > 0)) {
              ms = sv.doubleValue(); found = true
            }
            s += 1
          }
          if (!found) ms = 0.0
          val ns: java.lang.Double =
            if (rels(cand) == null) null
            else java.lang.Double.valueOf(-MmrSelect.round6(
              lambda * rels(cand).doubleValue() - oneMinus * ms))
          val better =
            if (best == -1) true
            else {
              val c0 = cmpNs(ns, bestNs)
              if (c0 != 0) c0 < 0
              else {
                val c1 = cmpId(ids(cand), ids(best))
                if (c1 != 0) c1 < 0
                else {
                  // degenerate duplicate-id rows: rel then maxsim, the
                  // former struct-min's trailing fields
                  val c2 = cmpNs(rels(cand), rels(best))
                  if (c2 != 0) c2 < 0
                  else java.lang.Double.compare(ms, bestMs) < 0
                }
              }
            }
          if (better) { best = cand; bestNs = ns; bestMs = ms }
        }
        cand += 1
      }
      if (best == -1) dry = true
      else {
        selIdx += best
        // retire every row of this n_id (former anti-join on n_id)
        var r = 0
        while (r < m) {
          if (!retired(r) && cmpId(ids(r), ids(best)) == 0) retired(r) = true
          r += 1
        }
        val mmr: Any =
          if (bestNs == null) null else java.lang.Double.valueOf(-bestNs.doubleValue())
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](pos.toLong, ids(best), rels(best), bestMs, mmr))
        pos += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrSelect {
  /** Spark's `round(double, 6)` semantics (RoundBase on DoubleType):
    * NaN/Infinity pass through, else shortest-repr BigDecimal HALF_UP —
    * ≡-property-tested against the column function in AnnSpec. */
  def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
