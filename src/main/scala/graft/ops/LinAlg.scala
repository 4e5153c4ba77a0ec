package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra for closed-form model fitting: the
  * sufficient-statistics pattern. Linear/ridge regression, PCA and
  * Mahalanobis whitening all need only X^T X and X^T y — d×d numbers
  * regardless of row count — so the cluster computes ONE mergeable
  * aggregation over the corpus and the driver solves the d×d system.
  * This is the third shape of "ML in the relational engine" here:
  * closed-form (this), iterative-with-driver-state ([[Ann.kmeansLloyd]]),
  * and graph-fixpoint ([[Graph.pagerank]]).
  */
object LinAlg {

  /** Upper triangle of the Gram matrix G = A^T A of the augmented design
    * matrix A = [1 | X | y] built from the first `nFeatures + 1` entries
    * of `vec` (features x_1..x_d, then the target y as the last column;
    * leading 1 = intercept). Row (i, j, sxx, n) carries
    * Σ a_i·a_j over all rows — which packs X^T X, X^T y AND y^T y in one
    * result: everything normal equations, R² and residual variance need.
    *
    * Scale shape: each input row expands to the (d+2)(d+3)/2 literal
    * index pairs in a single codegen'd projection (no join, no
    * posexplode of data columns), then ONE map-side-combinable
    * aggregation keyed by (i, j) — partial Gram matrices merge by cell
    * sum exactly like the sketch family. Shuffle volume: #partitions ×
    * pairs rows, independent of corpus size.
    *
    * Determinism: per-row products are exact IEEE doubles (same two
    * doubles → same product on every engine); sums run as
    * decimal(30,12) — order-independent, so retries, partitionings and
    * the DuckDB oracle agree bit-for-bit; one rounded-double boundary at
    * the end. */
  def gramMatrix(rows: DataFrame, vec: Column, nFeatures: Int): DataFrame = {
    val d = nFeatures + 1 // features + target
    val aug = concat(array(lit(1.0d)),
      transform(slice(vec, 1, d), _.cast("double")))
    val pairs = for { i <- 0 to d; j <- i to d } yield (i, j)
    val cells = array(pairs.map { case (i, j) =>
      struct(lit(i).as("i"), lit(j).as("j"),
        (element_at(col("__a"), i + 1) * element_at(col("__a"), j + 1))
          .cast("decimal(30,12)").as("p"))
    }: _*)
    Fanout.fanout(rows.select(aug.as("__a")))
      .select(explode(cells).as("c"))
      .select(col("c.i").cast("long").as("i"),
        col("c.j").cast("long").as("j"), col("c.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(round(sum(col("p")).cast("double"), 6).as("sxx"),
        count(lit(1)).as("n"))
  }

  /** Top principal direction by POWER ITERATION, never materializing
    * the Gram matrix: each iteration is two corpus passes computing
    * G·v = Σ_rows x·(x·v) directly — O(d) work per row instead of the
    * O(d²) cell expansion of [[gramMatrix]], which is the move that
    * matters when d is embedding-sized (64+) and the corpus is 100 TB.
    * The learned direction is the data-driven complement to the q167
    * random (JL) projection: same output shape, maximal retained
    * variance instead of distributional guarantees.
    *
    * Determinism (every step engine-replayable):
    *  - v₀ = 1/√d in every coordinate (√ and ÷ are correctly rounded
    *    IEEE ops — both engines produce the identical double);
    *  - per-row dots fold LEFT-TO-RIGHT in index order (`aggregate`
    *    over `zip_with` here ≡ DuckDB's `list_sum∘list_transform`);
    *  - the d accumulations Σ x_i·(x·v) are 1e9-snapped
    *    order-independent sums;
    *  - the driver normalizes in index order and snaps each new
    *    coordinate to the 1e6 grid before it re-enters the plan as a
    *    literal (the [[Ann.kmeansLloyd]] driver-state contract — d
    *    doubles, two collects per iteration).
    * Returns (vec_id, pc1 = x·v_final rounded 4 dp); the sign is an
    * artifact of the deterministic trajectory, stable across engines. */
  def pcaPowerProject(vecs: DataFrame, id: Column, vec: Column,
      iters: Int = 2): DataFrame = {
    import graft.expr.Snap
    val base = Fanout.fanout(vecs).select(id.as("vec_id"),
      transform(vec, _.cast("double")).as("e"))
    // dim probe on the RAW input (one aggregate row, no fanout shuffle
    // paid just to read lengths). Probe min AND max over the WHOLE
    // corpus — a first-row probe would let a ragged corpus slip
    // through, where zip_with pads the short side with NULLs and the
    // dot products silently go NULL (the binaryHammingEval contract,
    // Ann.scala). NULL-safe: all-NULL vectors probe as NULL.
    val probe = vecs.agg(
      max(size(vec)).as("dmax"), min(size(vec)).as("dmin"))
      .collect().head
    require(!probe.isNullAt(0),
      "pcaPowerProject: empty vectors (or all vectors NULL)")
    val d = probe.getInt(0)
    require(probe.getInt(1) == d && d > 0,
      s"pcaPowerProject: ragged vector widths [${probe.getInt(1)}, $d]" +
        " — zip_with would NULL-pad the short rows; fix the corpus " +
        "width upstream")
    def dot(v: Array[Double]): Column =
      aggregate(zip_with(col("e"), array(v.map(lit): _*), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val u = base.select(col("vec_id"), dot(v).as("s"),
          posexplode(col("e")).as(Seq("pos", "xv")))
        .groupBy(col("pos"))
        .agg(Snap.snappedSum(col("xv") * col("s"), 1e9).as("u"))
        .orderBy(col("pos"))
        .collect().map(_.getDouble(1))
      val nrm = math.sqrt(u.foldLeft(0.0)((acc, x) => acc + x * x))
      v = u.map(x => math.floor(x / nrm * 1e6 + 0.5) / 1e6)
    }
    base.select(col("vec_id"), round(dot(v), 4).as("pc1"))
  }

  /** Solve the normal equations from a collected [[gramMatrix]] result:
    * β = (X^T X)^{-1} X^T y via Gaussian elimination with partial
    * pivoting on the driver ((d+1)×(d+1) — trivial). `cells` maps
    * (i, j) → Σ a_i·a_j with the target at index d+1 (the gramMatrix
    * layout). Driver-side by design: the cluster's job ended when the
    * sufficient statistics were reduced. */
  def solveNormal(cells: Map[(Int, Int), Double], nFeatures: Int): Array[Double] = {
    val d = nFeatures + 1 // intercept + features
    def g(i: Int, j: Int): Double =
      cells.getOrElse((i min j, i max j),
        sys.error(s"gram cell ($i,$j) missing"))
    // augmented system [XtX | Xty]
    val m = Array.tabulate(d, d + 1) { (i, j) =>
      if (j < d) g(i, j) else g(i, d)
    }
    for (p <- 0 until d) {
      val piv = (p until d).maxBy(r => math.abs(m(r)(p)))
      val tmp = m(p); m(p) = m(piv); m(piv) = tmp
      require(math.abs(m(p)(p)) > 1e-12, "singular normal equations")
      for (r <- p + 1 until d) {
        val f = m(r)(p) / m(p)(p)
        for (c <- p to d) m(r)(c) -= f * m(p)(c)
      }
    }
    val beta = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = m(i)(d)
      for (j <- i + 1 until d) s -= m(i)(j) * beta(j)
      beta(i) = s / m(i)(i)
    }
    beta
  }

  /** Energy-distance two-sample statistic between embedding groups
    * (Székely & Rizzo 2004, "Testing for equal distributions in high
    * dimension"): E = 2·E‖X−Y‖ − E‖X−X′‖ − E‖Y−Y′‖ — zero iff the
    * DISTRIBUTIONS match, sensitive to any difference (mean, scale,
    * shape) where the per-coordinate drift family (q83/q180/q284) sees
    * only marginals. Evaluated on md5-deterministic min-k samples per
    * group — the estimand is the sampled-pair statistic, stated
    * up-front: exact all-pairs is a corpus² join, while two k-row
    * samples bound every pair leg at k² regardless of corpus size.
    *
    * Determinism: sample membership is an md5 order + limit
    * (TakeOrderedAndProject); distances use the q32-certified dot
    * decomposition ‖a−b‖² = a·a − 2a·b + b·b (the HOF fold and
    * DuckDB's list_dot_product sum in the same element order);
    * per-leg sums snap at 1e9; exact pair counts. Within-group legs
    * use the V-statistic form (all ordered pairs, zero self-terms,
    * n² denominator), so E ≥ 0 always and E = 0 exactly on identical
    * samples. Returns one row: (n_a, n_b, mean_cross, mean_within_a,
    * mean_within_b, energy_dist, t_stat). */
  def energyDistance(vecs: DataFrame, id: Column, vec: Column,
      isA: Column, k: Int = 40,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.{Similarity, Snap}
    require(k >= 2, s"energyDistance: k=$k")
    val b = vecs.select(id.cast("long").as("vid"), vec.as("v"),
      isA.as("a"))
    def samp(side: Boolean) = materialize(
      b.filter(col("a") === side)
        .orderBy(md5(col("vid").cast("string")), col("vid")).limit(k)
        .select(col("vid"), col("v")))
    val sx = samp(true); val sy = samp(false)
    def dist(va: Column, vb: Column): Column =
      sqrt(greatest(lit(0.0), Similarity.dot(va, va) -
        lit(2.0) * Similarity.dot(va, vb) + Similarity.dot(vb, vb)))
    val xy = sx.select(col("v").as("va"))
      .crossJoin(sy.select(col("v").as("vb")))
      .agg(count(lit(1)).as("nxy"),
        Snap.snappedSum(dist(col("va"), col("vb")), 1e9).as("sxy"))
    // V-statistic form: ALL ordered pairs including i = j (zero
    // self-terms, n² denominator) — E is then ≥ 0 and EXACTLY 0 on
    // identical samples, where the i<j U-form goes negative
    def within(s: DataFrame, nOut: String, sOut: String) =
      s.select(col("v").as("va"))
        .crossJoin(s.select(col("v").as("vb")))
        .agg(count(lit(1)).as(nOut),
          Snap.snappedSum(dist(col("va"), col("vb")), 1e9).as(sOut))
    val xx = within(sx, "nxx", "sxx")
    val yy = within(sy, "nyy", "syy")
    val na = sx.agg(count(lit(1)).as("n_a"))
    val nb = sy.agg(count(lit(1)).as("n_b"))
    val mXY = col("sxy") / col("nxy").cast("double")
    val mXX = col("sxx") / col("nxx").cast("double")
    val mYY = col("syy") / col("nyy").cast("double")
    val e = lit(2.0) * mXY - mXX - mYY
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val ok = col("nxy") > 0L && col("nxx") > 0L && col("nyy") > 0L
    na.crossJoin(nb).crossJoin(xy).crossJoin(xx).crossJoin(yy)
      .select(col("n_a"), col("n_b"),
        round(when(ok, mXY), 6).as("mean_cross"),
        round(when(ok, mXX), 6).as("mean_within_a"),
        round(when(ok, mYY), 6).as("mean_within_b"),
        round(when(ok, e), 6).as("energy_dist"),
        round(when(ok, naD * nbD / (naD + nbD) * e), 6).as("t_stat"))
  }

  /** Embedding-space anisotropy report (Ethayarajh 2019, "How
    * contextual are contextualized word representations?"; Mu &
    * Viswanath 2018's all-but-the-top diagnosis): the expected cosine
    * between two RANDOM vectors. In an isotropic space it is ~0; the
    * ~0.3–0.9 values real encoders produce mean every cosine
    * similarity (q25/q32's dedup signal) rides a large constant
    * offset — this is the calibration constant those thresholds
    * implicitly absorb.
    *
    * The scale trick is an identity, not a sample: for unit-normalized
    * x̂, E_pairs[cos(x, y)] = ‖mean(x̂)‖² EXACTLY — so the report is
    * one corpus pass + a dim-sized rollup, no pair sampling, no pair
    * join. Norms and per-dim unit sums snap at 1e9 (order-free);
    * zero-norm vectors are excluded and counted. Returns one row:
    * (n_vectors, n_zero_norm, dim, mean_norm, anisotropy_cos). */
  def anisotropyReport(vecs: DataFrame, id: Column, vec: Column)
      : DataFrame = {
    import graft.expr.Snap
    val ex = vecs.select(id.as("vid"), posexplode(vec).as(Seq("pos", "x0")))
      .select(col("vid"), col("pos"), col("x0").cast("double").as("x"))
    val norms = ex.groupBy(col("vid"))
      .agg(Snap.snappedSum(col("x") * col("x"), 1e9).as("n2"),
        (max(col("pos")) + lit(1)).as("d"))
      .select(col("vid"), sqrt(col("n2")).as("nrm"), col("d"))
    val counts = norms.agg(
      sum(when(col("nrm") > 0.0, 1L).otherwise(0L)).as("n"),
      sum(when(col("nrm") > 0.0, 0L).otherwise(1L)).as("nz"),
      max(col("d")).cast("long").as("dim"),
      Snap.snappedSum(when(col("nrm") > 0.0, col("nrm"))
        .otherwise(lit(0.0)), 1e9).as("snrm"))
    val unit = ex.join(norms.filter(col("nrm") > 0.0), "vid")
      .groupBy(col("pos"))
      .agg(Snap.snappedSum(col("x") / col("nrm"), 1e9).as("u"))
    val aniso = unit.crossJoin(broadcast(counts))
      .agg(Snap.snappedSum(
        (col("u") / col("n").cast("double")) *
          (col("u") / col("n").cast("double")), 1e9).as("a"))
    val nD = col("n").cast("double")
    counts.crossJoin(broadcast(aniso))
      .select(col("n").as("n_vectors"), col("nz").as("n_zero_norm"),
        col("dim"),
        round(when(col("n") > 0L, col("snrm") / nD), 6).as("mean_norm"),
        round(when(col("n") > 0L, col("a")), 6).as("anisotropy_cos"))
  }
}
