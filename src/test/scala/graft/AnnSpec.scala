package graft

import org.apache.spark.sql.functions._
import graft.ops.Ann

/** IVF recall behavior on real embedding data: recall is monotone in
  * nprobe and exact when every cell is probed. */
class AnnSpec extends SparkSpec {

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ivfTopK: recall monotone in nprobe; nprobe=allCells ≡ brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val cells = emb.select("label").distinct().count().toInt
    val exact = topkSet(Ann.bruteForceTopK(emb, q, 10))
    def recall(np: Int) =
      topkSet(Ann.ivfTopK(emb, q, "label", 10, nprobe = np))
        .intersect(exact).size.toDouble / exact.size
    val r1 = recall(1)
    val r3 = recall(3)
    val rAll = recall(cells)
    assert(r1 <= r3 + 1e-9 && r3 <= rAll + 1e-9, s"$r1 / $r3 / $rAll")
    assert(rAll == 1.0) // probing every cell = exact search
  }

  test("kmeansLloyd: deterministic, complete codebook, SSE non-increasing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val total = emb.count()
    def run(iters: Int) = Ann.kmeansLloyd(emb, k = 4, iters = iters)

    val cb = run(2).collect()
    // complete codebook: every surviving cluster carries all 64 dims,
    // populations are dim-independent and sum to the corpus size
    val byCluster = cb.groupBy(_.getLong(0))
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 64L), s"cluster $c")
      assert(rows.map(_.getLong(3)).distinct.length == 1, s"cluster $c n varies")
    }
    assert(byCluster.values.map(_.head.getLong(3)).sum == total)
    // deterministic end-to-end (driver state + snapping, no RNG)
    assert(run(2).collect().map(_.toString).sorted.toSeq ==
      cb.map(_.toString).sorted.toSeq)

    // Lloyd descent: SSE against each run's OWN codebook never increases
    // with more iterations
    def sse(iters: Int): Double = {
      val cents = run(iters).groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cluster"), transform(col("dm"), s => s.getField("m")).as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      emb.select(col("embedding").cast("array<double>")).collect().map { r =>
        val v = r.getSeq[Double](0)
        cents.values.map(c => v.zip(c).map { case (a, b) =>
          (a - b) * (a - b) }.sum).min
      }.sum
    }
    val s1 = sse(1); val s2 = sse(2); val s3 = sse(3)
    assert(s2 <= s1 + 1e-6 && s3 <= s2 + 1e-6, s"SSE rose: $s1 / $s2 / $s3")
  }

  test("lshTopK: bucket-restricted, self-excluded, planes=0 ≡ brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    // 0 planes → a single bucket (signature 0 everywhere) → exact search
    val all = topkSet(Ann.lshTopK(emb, q, planes = 0, k = 10))
    assert(all == topkSet(Ann.bruteForceTopK(emb, q, 10)))
    val lsh = Ann.lshTopK(emb, q, planes = 4, k = 10)
    assert(lsh.filter(col("q_id") === col("n_id")).isEmpty) // self excluded
    // every reported neighbor genuinely shares the query's 4-bit bucket
    val hits = topkSet(lsh)
    assert(hits.nonEmpty && hits.subsetOf(
      topkSet(Ann.lshTopK(emb, q, planes = 0, k = Int.MaxValue))))
    // per-query result count ≤ k
    val counts = lsh.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 10))
  }

  test("hyperplaneSigns: deterministic ±1, md5-derived (engine-portable)") {
    val s1 = Ann.hyperplaneSigns(4, 64)
    val s2 = Ann.hyperplaneSigns(4, 64)
    assert(s1.zip(s2).forall { case (a, b) => a.sameElements(b) })
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    // not degenerate: both signs occur in every plane
    assert(s1.forall(p => p.contains(1.0) && p.contains(-1.0)))
  }

  test("silhouette: tight separated clusters ≈ 1, straddling point scores low") {
    import spark.implicits._
    // cluster A around (0,0), cluster B around (10,10); one B-labeled
    // point sits midway — its s is small, dragging B's mean under A's
    val rows = Seq(
      (1L, "A", Seq(0.0, 0.1)), (2L, "A", Seq(0.1, 0.0)),
      (3L, "A", Seq(-0.1, 0.0)),
      (4L, "B", Seq(10.0, 10.1)), (5L, "B", Seq(10.1, 10.0)),
      (6L, "B", Seq(5.2, 5.2))) // straddler
      .toDF("vec_id", "label", "embedding")
    val out = Ann.silhouette(rows, "label")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("A")._1 == 3L && out("B")._1 == 3L)
    assert(out("A")._2 > 0.9, s"tight cluster should score ~1: ${out("A")}")
    assert(out("B")._2 < out("A")._2)
    // every per-cluster mean stays in the silhouette range
    assert(out.values.forall(v => v._2 >= -1.0 && v._2 <= 1.0))
  }

  test("pqAdcTopK: codebook ≥ corpus → ADC ≡ exact snapped-L2 ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 40)
    val q = emb.filter(col("vec_id") < 3)
    // kCodes = N, iters = 1: the codebook IS the corpus sub-vectors, so
    // every vector's code is its own entry and ADC = the true squared L2
    // distance (per-subspace snapped) — PQ degenerates to exact search
    val pq = Ann.pqAdcTopK(emb, q, m = 4, kCodes = 40, iters = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def adc(a: Array[Double], b: Array[Double]): Long =
      (0 until 4).map { j =>
        val d2 = (j * 16 until (j + 1) * 16).map { i =>
          val d = a(i) - b(i); d * d
        }.sum
        math.floor(d2 * 1e6 + 0.5).toLong
      }.sum
    val expected = (0L until 3L).flatMap { qid =>
      vecs.toSeq.filter(_._1 != qid)
        .map { case (nid, v) => (adc(vecs(qid), v), nid) }
        .sorted.take(10).zipWithIndex
        .map { case ((_, nid), i) => (qid, (i + 1).toLong, nid) }
    }.sorted
    assert(pq.toSeq == expected)
  }

  test("pqAdcTopK: partition-invariant; finer codebooks raise recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val a = Ann.pqAdcTopK(emb, q, m = 4, kCodes = 4, iters = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val b = Ann.pqAdcTopK(emb.repartition(7), q, m = 4, kCodes = 4,
        iters = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // recall@10 vs exact cosine (unit vectors: L2-rank ≡ cosine-rank)
    val exact = topkSet(Ann.bruteForceTopK(emb, q, 10))
    def recall(kCodes: Int): Double =
      topkSet(Ann.pqAdcTopK(emb, q, m = 4, kCodes = kCodes, iters = 2, k = 10))
        .intersect(exact).size.toDouble / exact.size
    val coarse = recall(1) // 1 code/subspace: ADC constant, rank = id order
    val fine = recall(16)
    assert(fine >= coarse, s"$fine < $coarse")
    assert(fine >= 0.3, s"16^4-cell PQ recall collapsed: $fine")
  }

  test("ivfPqTopK: recall monotone in nprobe; nprobe=kCells ≡ full " +
    "PQ-ADC scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    // the full-scan ADC ranking is the recall baseline: IVF pruning can
    // only lose candidates relative to it, never re-rank survivors
    val full = topkSet(Ann.pqAdcTopK(emb, q, m = 4, kCodes = 4,
      iters = 2, k = 10))
    def recall(np: Int): Double =
      topkSet(Ann.ivfPqTopK(emb, q, kCells = 4, nprobe = np, m = 4,
        kCodes = 4, iters = 2, k = 10))
        .intersect(full).size.toDouble / full.size
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r1 <= r2 + 1e-9, s"recall not monotone: $r1 / $r2")
    assert(r1 > 0.0, s"nprobe=1 found nothing: $r1")
    // probing every cell reproduces the exhaustive scan EXACTLY (same
    // codebooks, same snapped-integer scores, same tie-breaks)
    val all = Ann.ivfPqTopK(emb, q, kCells = 4, nprobe = 4, m = 4,
      kCodes = 4, iters = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val scan = Ann.pqAdcTopK(emb, q, m = 4, kCodes = 4, iters = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(all == scan)
  }

  test("ivfPqTopK residual (IVFADC): recall@10 ≥ raw encoding at the " +
    "same m/kCodes/nprobe; deterministic under repartition") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val exact = topkSet(Ann.bruteForceTopK(emb, q, 10))
    def recall(residual: Boolean): Double =
      topkSet(Ann.ivfPqTopK(emb, q, kCells = 4, nprobe = 2, m = 4,
        kCodes = 4, iters = 2, k = 10, residual = residual))
        .intersect(exact).size.toDouble / exact.size
    val raw = recall(residual = false)
    val res = recall(residual = true)
    // residuals concentrate around the origin, so the same code budget
    // quantizes finer — the whole point of IVFADC vs IVF-Flat-style PQ
    assert(res >= raw, s"residual recall $res < raw $raw")
    assert(res > 0.0, s"residual IVF-PQ found nothing")
    // partition-invariant (driver-literal books, snapped-integer ADC)
    val a = Ann.ivfPqTopK(emb, q, kCells = 4, nprobe = 2, m = 4,
      kCodes = 4, iters = 2, k = 10, residual = true)
      .collect().map(_.toString).sorted.toSeq
    val b = Ann.ivfPqTopK(emb.repartition(7), q, kCells = 4, nprobe = 2,
      m = 4, kCodes = 4, iters = 2, k = 10, residual = true)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("opqIvfPqIndex: balanced-energy permutation is a true " +
    "subspace-balanced permutation (distinct subspaces per rank block, " +
    "energy spread ≤ identity split); search returns results; " +
    "deterministic under repartition — recall vs residual is " +
    "corpus-dependent and is MEASURED by q191/q142, not pinned here") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val coarse = Ann.kmeansCentroids(emb, 4, 2)
    val perm = Ann.opqPermutation(emb, coarse, 4)
    // a real permutation of 0..63, dealt 16 dims to each subspace
    assert(perm.sorted == (0 until 64).toList, s"not a permutation: $perm")
    assert(perm.size == 64)
    val (p2, idx) = Ann.opqIvfPqIndex(emb, kCells = 4, m = 4, kCodes = 4,
      iters = 2, coarse0 = Some(coarse))
    assert(p2 == perm, "index learned a different permutation")
    // the DEFINING property: every rank-block of m dims lands in m
    // distinct subspaces (the snake deal), so each subspace holds one
    // dim from every energy stratum
    val en = Ann.residualEnergies(emb, coarse).toMap
    val ranked = en.toSeq.sortBy { case (p, e) => (-e, p) }.map(_._1)
    val subOf = perm.grouped(16).zipWithIndex
      .flatMap { case (dims, j) => dims.map(_ -> j) }.toMap
    ranked.grouped(4).foreach { blk =>
      assert(blk.map(subOf).toSet.size == 4,
        s"rank block $blk not dealt to distinct subspaces") }
    // and the deal BALANCES energy: permuted subspace energies are
    // tighter than the identity contiguous split's (fixture pin — the
    // recall consequence is corpus-dependent and is measured, not
    // assumed: q191's oracle rows vs q142's residual rows)
    def spread(assign: Int => Int): Double = {
      val sums = (0 until 64).groupBy(assign)
        .map { case (_, ds) => ds.map(en).sum }
      sums.max - sums.min
    }
    assert(spread(subOf) <= spread(_ / 16),
      "snake deal did not tighten the subspace energy spread")
    val exact = topkSet(Ann.bruteForceTopK(emb, q, 10))
    val opq = topkSet(Ann.opqSearch(idx, perm, q, nprobe = 2, k = 10))
      .intersect(exact).size
    assert(opq > 0, "opq index found nothing")
    // partition-invariant (snapped energies + driver-literal books)
    val permR = Ann.opqPermutation(emb.repartition(7), coarse, 4)
    assert(permR == perm, "permutation depends on partitioning")
    val a = Ann.opqSearch(idx, perm, q, nprobe = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val b = Ann.opqSearch(idx, perm, q.repartition(3), nprobe = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("opqAppend: frozen-book + frozen-permutation append ≡ one full " +
    "encode of the union; served rankings agree") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val (perm, idx) = Ann.opqIvfPqIndex(base, kCells = 4, m = 4,
      kCodes = 4, iters = 2)
    val appended = Ann.opqAppend(idx, perm, batch)
    val rebuilt = Ann.opqAppend(idx.copy(codes = idx.codes.limit(0)),
      perm, emb)
    assert(appended.codes.collect().map(_.toString).sorted.toSeq ==
      rebuilt.codes.collect().map(_.toString).sorted.toSeq,
      "appended codes differ from full frozen-book encode")
    val sa = Ann.opqSearch(appended, perm, q, nprobe = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val sr = Ann.opqSearch(rebuilt, perm, q, nprobe = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(sa == sr, "served rankings differ after opq append")
  }

  test("ivfPqAppend: frozen-book append ≡ encoding the unioned corpus; " +
    "search over the appended index ≡ search over a full frozen-book " +
    "encode (both residual and raw)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    for (residual <- Seq(false, true)) {
      val base = emb.filter(col("vec_id") % 3 =!= 0)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      val idx = Ann.ivfPqIndex(base, kCells = 4, m = 4, kCodes = 4,
        iters = 2, residual = residual)
      val appended = Ann.ivfPqAppend(idx, batch)
      // encoding is per-row under frozen books: appending the batch is
      // bit-identical to encoding the unioned corpus in one pass
      val rebuilt = Ann.ivfPqAppend(idx.copy(codes = idx.codes.limit(0)), emb)
      assert(appended.codes.collect().map(_.toString).sorted.toSeq ==
        rebuilt.codes.collect().map(_.toString).sorted.toSeq,
        s"residual=$residual: appended codes differ from full encode")
      // and the served ranking agrees
      val sa = Ann.ivfPqSearch(appended, q, nprobe = 2, k = 10)
        .collect().map(_.toString).sorted.toSeq
      val sr = Ann.ivfPqSearch(rebuilt, q, nprobe = 2, k = 10)
        .collect().map(_.toString).sorted.toSeq
      assert(sa == sr, s"residual=$residual: served rankings differ")
    }
  }

  test("sq8TopK: near-exact recall vs brute force (unit vectors: " +
    "L2-rank ≡ cosine-rank); partition-invariant; constant dims " +
    "reconstruct exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val exact = topkSet(Ann.bruteForceTopK(emb, q, 10))
    val sq = Ann.sq8TopK(emb, q, 10)
    val recall = topkSet(sq).intersect(exact).size.toDouble / exact.size
    // 8 bits/dim on bounded data: error ≤ scale/2 per dim — recall
    // should be near-exact, far above any coded ANN at the same k
    assert(recall >= 0.9, s"SQ8 recall collapsed: $recall")
    val a = sq.collect().map(_.toString).sorted.toSeq
    val b = Ann.sq8TopK(emb.repartition(7), q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // constant dimension: scale 0 must reconstruct the exact value,
    // so a corpus whose vectors differ only in non-constant dims ranks
    // identically to brute force
    import spark.implicits._
    val tiny = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.5)), (2L, Seq(1.0, 1.0)),
      (3L, Seq(1.0, 0.1))).toDF("vec_id", "embedding")
    val r = Ann.sq8TopK(tiny, tiny.filter(col("vec_id") === 0L), 3)
      .collect().map(x => (x.getLong(1), x.getLong(2))).sorted.toSeq
    assert(r == Seq((1L, 3L), (2L, 1L), (3L, 2L)), r.toString)
  }

  test("ivfSq8TopK: recall monotone in nprobe; nprobe=kCells ≡ full " +
    "SQ8 scan bit-exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val full = topkSet(Ann.sq8TopK(emb, q, 10))
    def recall(np: Int): Double =
      topkSet(Ann.ivfSq8TopK(emb, q, kCells = 4, nprobe = np, iters = 2,
        k = 10)).intersect(full).size.toDouble / full.size
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r1 <= r2 + 1e-9, s"recall not monotone: $r1 / $r2")
    assert(r1 > 0.0)
    // probing every cell reproduces the exhaustive SQ8 scan exactly
    // (same bounds, same codes, same snapped distances and ties)
    val all = Ann.ivfSq8TopK(emb, q, kCells = 4, nprobe = 4, iters = 2,
      k = 10).collect().map(_.toString).sorted.toSeq
    val scan = Ann.sq8TopK(emb, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(all == scan)
  }

  test("ivfPqDriftEval: empty append batch → the appended and " +
    "retrained variants are row-identical (no phantom drift)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val r = Ann.ivfPqDriftEval(emb, emb.limit(0), q, kCells = 4,
        nprobe = 2, m = 4, kCodes = 4, iters = 2, k = 10)
      .collect().map(x => (x.getString(1), x.getLong(0)) -> x.getLong(2))
      .toMap
    val (ap, rt) = (r.filter(_._1._1 == "appended"),
      r.filter(_._1._1 == "retrained"))
    assert(ap.size == 5 && rt.size == 5)
    assert(ap.map { case ((_, q2), n) => q2 -> n } ==
      rt.map { case ((_, q2), n) => q2 -> n })
  }

  test("ivfPqRerank (IVFADC+R): nprobe=all + shortlist=corpus ≡ exact " +
    "brute force; finite shortlist recall ≥ the unrefined ADC ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val idx = Ann.ivfPqIndex(emb, kCells = 4, m = 4, kCodes = 4, iters = 2,
      residual = true)
    // probe everything, rescore everything → quantization fully cancels
    val all = Ann.ivfPqRerank(idx, emb, q, nprobe = 4, shortlist = n, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val brute = Ann.bruteForceTopK(emb, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(all == brute)
    // the two-stage point: rescoring a 20-deep shortlist can only help
    // recall vs serving the raw ADC order at the same probe budget
    val exact = topkSet(Ann.bruteForceTopK(emb, q, 10))
    def recall(s: Set[(Long, Long)]) =
      s.intersect(exact).size.toDouble / exact.size
    val reranked = recall(topkSet(
      Ann.ivfPqRerank(idx, emb, q, nprobe = 2, shortlist = 20, k = 10)))
    val adcOnly = recall(topkSet(
      Ann.ivfPqSearch(idx, q, nprobe = 2, k = 10)))
    assert(reranked >= adcOnly, s"rerank $reranked < adc $adcOnly")
  }

  test("truncationEval: full-width prefix is the identity ranking " +
    "(recall 1.0); truncated tiers stay in [0, 1] with one row per " +
    "(query, tier)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val r = Ann.truncationEval(emb, q, Seq(16, 64), 10)
      .collect().map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r.size == 10) // 5 queries × 2 tiers
    // dim = the full 64: truncation is the identity, overlap is exact
    (0L until 5L).foreach { qid =>
      assert(r((qid, 64)) == ((10L, 1.0)), s"q$qid full-dim: ${r((qid, 64))}")
      val (n16, rec16) = r((qid, 16))
      assert(n16 >= 0L && n16 <= 10L && rec16 >= 0.0 && rec16 <= 1.0)
    }
  }

  test("diverseTopK: per-cell quota binds (≤perCell per (query, cell)), " +
    "slack quota degenerates to the brute-force ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val coarse = Ann.kmeansCentroids(emb, 4, 2)
    val div = Ann.diverseTopK(emb, q, coarse, k = 5, perCell = 2).collect()
    // quota: never more than 2 results from one cell for one query
    val perCellCounts = div.groupBy(r => (r.getLong(0), r.getLong(3)))
      .view.mapValues(_.length)
    assert(perCellCounts.values.forall(_ <= 2), perCellCounts.toMap.toString)
    assert(div.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    // ranks are 1..n dense per query, ordered by (cos desc, n_id)
    div.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // perCell ≥ k: the quota never binds — identical to brute force
    val slack = Ann.diverseTopK(emb, q, coarse, k = 5, perCell = 5)
      .select("q_id", "rank", "n_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val brute = Ann.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(slack == brute)
  }

  test("jlEval: one row per (query, tier), recall bounded, sign rows " +
    "deterministic (partition-invariant), overlap matches a driver-side " +
    "recount for the 16-dim tier") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val r = Ann.jlEval(emb, q, Seq(8, 16), 10)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r.size == 10)
    r.values.foreach { case (n, rec) =>
      assert(n >= 0L && n <= 10L && rec >= 0.0 && rec <= 1.0)
    }
    val r2 = Ann.jlEval(emb.repartition(7), q, Seq(8, 16), 10)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r2 == r)
    // independent recount: project driver-side with the same signs,
    // rank by cosine, intersect with the exact baseline
    val signs = Ann.hyperplaneSigns(16, 64)
    val vecs = emb.collect().map(x =>
      x.getLong(0) -> x.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def proj(v: Array[Double]) = signs.map(s =>
      BigDecimal(s.zip(v).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).toArray
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val pv = vecs.view.mapValues(proj).toMap
    val exact = Ann.bruteForceTopK(emb, q, 10).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSet
    (0L until 5L).foreach { qid =>
      val top = vecs.keys.filter(_ != qid).toSeq
        .map(n => (n, cos(pv(n), pv(qid))))
        .sortBy { case (n, c) => (-c, n) }.take(10).map(_._1).toSet
      val overlap = top.count(n => exact.contains((qid, n))).toLong
      assert(r((qid, 16L))._1 == overlap, s"q$qid")
    }
  }

  test("semantic leakage-safe split: cosine near-dup pairs never " +
    "straddle splits; every vector is assigned exactly once") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Ann.cosineNearDupPairs(emb, "label", 0.28)
    val split = graft.ops.Sampling.leakageSafeSplit(emb, "vec_id",
        pairs, "id_a", "id_b", Seq(10 -> "val", 20 -> "test", 100 -> "train"))
      .select(col("vec_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == emb.count())
    val p = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(p.nonEmpty, "threshold found no near-dup pairs — test is vacuous")
    p.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a, $b) straddles splits")
    }
  }

  test("hardNegatives: every mined negative has a different label; " +
    "ranking equals brute force over the other-label sub-corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anchors = emb.filter(col("vec_id") < 3)
    val mined = Ann.hardNegatives(emb, anchors, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    mined.foreach { case (q, _, n, nl, _) =>
      assert(nl != labels(q) && nl == labels(n), s"anchor $q neg $n")
    }
    // per anchor: ≡ brute-force top-5 over the corpus minus its label
    anchors.select("vec_id", "label").collect().foreach { a =>
      val (qid, ql) = (a.getLong(0), a.getInt(1))
      val want = Ann.bruteForceTopK(emb.filter(col("label") =!= ql),
          emb.filter(col("vec_id") === qid), 5)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val got = mined.filter(_._1 == qid).map(t => (t._2, t._3, t._5)).toSet
      assert(got == want, s"anchor $qid")
    }
  }

  test("ndcgEval: matches a hand-computed snapped DCG over the served " +
    "ranking; bounded in [0, 1]; one row per (query, tier)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val idx = Ann.ivfPqIndex(emb, kCells = 4, m = 4, kCodes = 4, iters = 2,
      residual = true)
    val got = Ann.ndcgEval(emb, q, idx, Seq(1, 2, 4), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == 15)
    assert(got.values.forall { case (d, n) => d >= 0 && n >= 0 && n <= 1 })
    // independent recomputation for nprobe=2
    def snap9(x: Double) = math.floor(x * 1e9 + 0.5)
    val exact = Ann.bruteForceTopK(emb, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val served = Ann.ivfPqSearch(idx, q, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val idcg = (1 to 10).map(p => snap9(math.log(2.0) / math.log(p + 1.0))).sum / 1e9
    val byQ = served.groupBy(_._1)
    (0L until 5L).foreach { qid =>
      val dcgRaw = byQ.getOrElse(qid, Array.empty[(Long, Long, Long)])
        .filter(t => exact.contains((qid, t._3)))
        .map(t => snap9(math.log(2.0) / math.log(t._2 + 1.0))).sum / 1e9
      val want = (BigDecimal(dcgRaw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(dcgRaw / idcg).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got((qid, 2L)) == want, s"q$qid")
    }
  }

  test("mrrEval: matches an independent first-hit recomputation; " +
    "rr = 1/first_rank; misses report 0; one row per (query, tier)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val idx = Ann.ivfPqIndex(emb, kCells = 4, m = 4, kCodes = 4, iters = 2,
      residual = true)
    val got = Ann.mrrEval(emb, q, idx, Seq(1, 2, 4), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 15)
    got.values.foreach { case (fr, rr) =>
      if (fr == 0L) assert(rr == 0.0)
      else {
        assert(fr >= 1L && fr <= 10L)
        assert(rr == BigDecimal(1.0 / fr)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val exact = Ann.bruteForceTopK(emb, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val served = Ann.ivfPqSearch(idx, q, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (0L until 5L).foreach { qid =>
      val hits = served.filter(t => t._1 == qid &&
        exact.contains((qid, t._3))).map(_._2)
      val want = if (hits.isEmpty) 0L else hits.min
      assert(got((qid, 2L))._1 == want, s"q$qid first rank")
    }
  }

  test("contrastiveTriplets: positive = best same-label, negative = " +
    "hardNegatives top-1, margin identity, singleton-label anchors " +
    "dropped") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anchors = emb.filter(col("vec_id") < 10)
    val got = Ann.contrastiveTriplets(emb, anchors)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val labels = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // negative leg ≡ hardNegatives at k=1
    val hn = Ann.hardNegatives(emb, anchors, 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(4))))
      .toMap
    got.foreach { case (q, (posId, posCos, negId, negCos, margin)) =>
      assert(labels(posId) == labels(q), s"q$q positive crosses labels")
      assert(labels(negId) != labels(q), s"q$q negative shares the label")
      assert(hn(q) == ((negId, negCos)), s"q$q negative != hardNegatives")
      assert(margin == BigDecimal(posCos - negCos)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // positive leg ≡ brute force restricted to the anchor's label
    (0L until 3L).foreach { qid =>
      val sub = emb.filter(col("label") === labels(qid) ||
        col("vec_id") === qid)
      val bf = Ann.bruteForceTopK(sub, anchors.filter(col("vec_id") === qid), 1)
        .collect().head
      assert((got(qid)._1, got(qid)._2) == ((bf.getLong(2), bf.getDouble(3))),
        s"q$qid positive != same-label brute force")
    }
    assert(got.size == 10)
  }

  test("missAttribution: partition identity, recall tie-out, and " +
    "zero probe loss when every cell is probed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val idx = Ann.ivfPqIndex(emb, kCells = 4, m = 4, kCodes = 4, iters = 2,
      residual = true)
    val got = Ann.missAttribution(emb, q, idx, Seq(1, 2, 4), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 15)
    got.foreach { case (k0, (m, qu, pr)) =>
      assert(m == qu + pr, s"$k0 partition broken") }
    // recall tie-out at nprobe=2: misses = 10 − |served ∩ exact|
    val exact = Ann.bruteForceTopK(emb, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val served = Ann.ivfPqSearch(idx, q, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    (0L until 5L).foreach { qid =>
      val overlap = exact.count(e => e._1 == qid && served.contains(e))
      assert(got((qid, 2L))._1 == 10L - overlap, s"q$qid miss count")
    }
    // probing all 4 cells leaves only quantization losses
    got.filter(_._1._2 == 4L).values.foreach { case (_, _, pr) =>
      assert(pr == 0L, "probe loss with every cell probed") }
  }

  test("pqQuantError: counts cover the corpus, errors nonnegative, " +
    "and residual encoding reconstructs strictly better overall than " +
    "raw (the IVFADC claim, measured)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def overallMean(residual: Boolean): (Long, Double) = {
      val idx = Ann.ivfPqIndex(emb, kCells = 4, m = 4, kCodes = 4,
        iters = 2, residual = residual)
      val rows = Ann.pqQuantError(emb, idx).collect()
      val n = rows.map(_.getLong(1)).sum
      rows.foreach { r =>
        assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= r.getDouble(2)) }
      (n, rows.map(r => r.getLong(1) * r.getDouble(2)).sum / n)
    }
    val (nRes, meanRes) = overallMean(residual = true)
    val (nRaw, meanRaw) = overallMean(residual = false)
    assert(nRes == emb.count() && nRaw == nRes)
    assert(meanRes < meanRaw,
      s"residual books must reconstruct better: $meanRes vs $meanRaw")
  }

  test("mmrRerank: λ=1 degenerates to the relevance ranking; λ<1 " +
    "penalizes picks by their similarity to already-selected results") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    // λ=1: the novelty term vanishes — picks are the brute-force order
    val pure = Ann.mmrRerank(emb, q, shortlist = 10, k = 4, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute = Ann.bruteForceTopK(emb, q, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pure == brute)
    // λ=0.7: every non-first pick carries the max-sim penalty it was
    // charged, computed against the selected set at its pick time
    val div = Ann.mmrRerank(emb, q, shortlist = 10, k = 4, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    div.foreach { case ((qid, pos), (nid, rel, maxsim, mmr)) =>
      if (pos == 1L) assert(maxsim == 0.0)
      assert(math.abs(mmr - BigDecimal(0.7 * rel - (1.0 - 0.7) * maxsim)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"($qid,$pos)")
    }
    // picks are distinct per query
    assert(div.keys.groupBy(_._1).forall { case (qid, ks) =>
      ks.map(k => div(k)._1).toSet.size == 4 })
  }

  test("MmrSelect.round6 ≡ the round(col, 6) column function on a " +
    "hostile double grid (exact 6-dp half-way points, negatives, " +
    "huge magnitudes, NaN, ±Inf) — the expression's score rounding " +
    "IS Spark's") {
    import spark.implicits._
    val rng = new java.util.Random(77)
    val hostile = Seq(0.1234565, -0.1234565, 0.12345650000001,
      0.9999995, -0.9999995, 1e-7, -1e-7, 0.0, -0.0, 1e17, -1e17,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, 4.9999995, -4.9999995)
    val random = (1 to 3000).map { _ =>
      rng.nextInt(3) match {
        case 0 => (rng.nextDouble() - 0.5) * 2        // cosine-scale
        case 1 => (rng.nextDouble() - 0.5) * 2e-6     // grid-edge
        case _ => (rng.nextDouble() - 0.5) * 2e12     // huge
      }
    }
    val xs = hostile ++ random
    val viaSpark = xs.toDF("x")
      .select(round(col("x"), 6).as("r")).collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    val viaExpr = xs.map(graft.expr.catalyst.MmrSelect.round6)
    xs.indices.foreach { i =>
      val (a, b) = (viaSpark(i), viaExpr(i))
      assert(java.lang.Double.compare(a, b) == 0 ||
        (a.isNaN && b.isNaN),
        s"round6 diverges at x=${xs(i)}: spark=$a expr=$b")
    }
  }

  test("MmrSelect edges: duplicate candidate ids retire together " +
    "(the former anti-join keyed on n_id), and a null/zero-norm " +
    "vector contributes no sim (maxsim falls back to 0.0)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    def run(cands: Seq[(Long, Double, Seq[Double])], k: Int)
        : Seq[(Long, Long, Double, Double)] = {
      val df = Seq(Tuple1(cands)).toDF("cands")
        .select(GraftBridge.column(graft.expr.catalyst.MmrSelect(
          GraftBridge.expression(
            col("cands").cast(
              "array<struct<n_id:bigint,rel:double,v:array<double>>>")),
          k, 0.7)).as("picks"))
        .select(explode(col("picks")).as("p"))
        .select(col("p.pos"), col("p.n_id"), col("p.maxsim"),
          col("p.mmr"))
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    }
    // duplicate id 10: picking it once must retire BOTH rows — k=3
    // over {10 (dup), 20} yields only 2 picks
    val dup = run(Seq(
      (10L, 0.9, Seq(1.0, 0.0)), (10L, 0.9, Seq(1.0, 0.0)),
      (20L, 0.5, Seq(0.0, 1.0))), k = 3)
    assert(dup.map(_._2) == Seq(10L, 20L), dup.toString)
    // a zero-norm vector has NULL cosine to everything: when it is
    // the only selected neighbor, the next pick's maxsim is the
    // coalesce fallback 0.0 (not null, not NaN)
    val zn = run(Seq(
      (1L, 0.9, Seq(0.0, 0.0)), (2L, 0.5, Seq(1.0, 0.0))), k = 2)
    assert(zn.map(_._2) == Seq(1L, 2L) && zn(1)._3 == 0.0, zn.toString)
    // and the mmr of that second pick is then pure λ·rel
    assert(math.abs(zn(1)._4 - 0.35) < 1e-9, zn.toString)
  }

  test("mmrRerank: short0 path ignores the shortlist parameter (no " +
    "require), matches the internally-built shortlist result, and a " +
    "shallow artifact yields fewer than k rows for affected queries") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val art = Ann.bruteForceTopK(emb, q, 10)
      .select(col("q_id"), col("n_id"), col("cos"))
    // shortlist=0 < k would fail the internal-path require; with
    // short0 the parameter is documented-ignored
    val viaArt = Ann.mmrRerank(emb, q, shortlist = 0, k = 4,
        lambda = 0.7, short0 = Some(art))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val internal = Ann.mmrRerank(emb, q, shortlist = 10, k = 4,
        lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(viaArt == internal)
    // a 2-deep artifact can serve at most 2 picks per query
    val shallow = Ann.bruteForceTopK(emb, q, 2)
      .select(col("q_id"), col("n_id"), col("cos"))
    val picked = Ann.mmrRerank(emb, q, shortlist = 0, k = 4,
        lambda = 0.7, short0 = Some(shallow))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(picked.values.forall(_ == 2), picked.toString)
  }

  test("binaryHammingEval: sign-separable clusters give recall 1; " +
    "both 32-bit packing halves carry bits (a high-dim sign flip " +
    "changes the distance)") {
    import graft.ops.Ann
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // two sign-clusters in 64 dims: first half positive vs negative;
    // magnitudes vary so cosine and sign agree on the grouping
    def vec(sign: Float, mag: Float): Seq[Float] =
      Seq.tabulate(64)(d => if (d < 32) sign * mag else -sign * mag)
    val corpus = Seq(
      (0L, vec(1f, 1f)), (1L, vec(1f, 2f)), (2L, vec(1f, 3f)),
      (10L, vec(-1f, 1f)), (11L, vec(-1f, 2f)), (12L, vec(-1f, 3f)))
      .toDF("vec_id", "embedding")
    val r = Ann.binaryHammingEval(corpus,
      corpus.filter(col("vec_id") === 0L), 2)
      .collect().head
    assert(r.getLong(1) == 2L && r.getDouble(2) == 1.0)
    // flip ONE high-half dim (pos 35) of an otherwise-identical pair:
    // hamming must separate them via the w1 word
    val hi = Seq(
      (0L, Seq.tabulate(64)(d => if (d == 35) 1f else -1f)),
      (1L, Seq.tabulate(64)(_ => -1f)),
      (2L, Seq.tabulate(64)(d => if (d == 35) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val r2 = Ann.binaryHammingEval(hi, hi.filter(col("vec_id") === 0L), 1)
      .collect().head
    // exact cosine top-1 of q0 is v2 (identical); hamming's top-1 must
    // be v2 too (distance 0 beats distance 1) -> recall 1
    assert(r2.getDouble(2) == 1.0)
  }

  test("kCenterCoreset: min-id seed, farthest-first picks with " +
    "id-ascending ties, nonincreasing objective trajectory") {
    import graft.ops.Ann
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // v0 ~ v30 (cos ≈ 0.994), v10 ⊥ v20 ⊥ v0: seed v0, then the two
    // orthogonals (dist 1.0 each, id tie -> 10 before 20), then v30
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (10L, Seq(0f, 1f, 0f, 0f)),
      (20L, Seq(0f, 0f, 1f, 0f)), (30L, Seq(0.9f, 0.1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Ann.kCenterCoreset(corpus, k = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2))))
    assert(r.map(_._2).toSeq == Seq(0L, 10L, 20L, 30L))
    assert(r(0)._3 == None && r(1)._3 == Some(1.0) &&
      r(2)._3 == Some(1.0))
    assert(r(3)._3.get < 0.01) // the near-duplicate picked last, tiny
    // farthest-first distances never increase
    assert(r(2)._3.get >= r(3)._3.get)
  }

  test("rankBiasedOverlap: identical rankings score 1 - p^d, disjoint " +
    "score 0, and a hand partial overlap replays the tail constants") {
    import spark.implicits._
    def rk(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("q_id", "n_id", "rank")
    val d = 3; val p = 0.9
    val a = rk(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val tails = Ann.rboTails(d, p)
    def snapSum(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    // identical: every item contributes tails(rank); total = sum p^i
    val same = Ann.rankBiasedOverlap(a, a, d, p).collect().head
    assert(same.getLong(1) == 3L)
    assert(same.getDouble(2) ==
      r6((1.0 - p) / p * snapSum((1 to d).map(i => tails(i - 1)))))
    // disjoint: zero shared -> rbo exactly 0 (an answer, not NULL)
    val b = rk(Seq((1L, 20L, 1L), (1L, 21L, 2L), (1L, 22L, 3L)))
    val none = Ann.rankBiasedOverlap(a, b, d, p).collect().head
    assert(none.getLong(1) == 0L && none.getDouble(2) == 0.0)
    // partial: item 10 at ranks (1, 2) -> m = 2; item 12 at (3, 1) ->
    // m = 3; item 11 unshared
    val c = rk(Seq((1L, 12L, 1L), (1L, 10L, 2L), (1L, 21L, 3L)))
    val part = Ann.rankBiasedOverlap(a, c, d, p).collect().head
    assert(part.getLong(1) == 2L)
    assert(part.getDouble(2) ==
      r6((1.0 - p) / p * snapSum(Seq(tails(1), tails(2)))))
  }
}
