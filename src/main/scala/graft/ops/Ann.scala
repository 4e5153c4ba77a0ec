package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.Similarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set broadcasts (it is the small side by
  * construction); the corpus never shuffles for brute force — each
  * partition scores its own rows and per-query top-k is a bounded
  * window over (query × k) candidates. The IVF variant prunes the
  * corpus to the probed partition(s) before scoring, turning a full
  * scan into a fraction-of-corpus scan — the standard recall/cost knob.
  */
object Ann {

  /** Brute-force cosine top-k: exact baseline.
    * Ranking key is cosine rounded to 6 dp with id tie-break — fully
    * deterministic and oracle-comparable. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(q, col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"),
        round(Similarity.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs, bucketed: candidate pairs are
    * generated ONLY within a blocking bucket (here a coarse cluster/label
    * column — at scale an LSH band of the vector), so the join is an
    * equi-join on the bucket, never a full cross product. Emits ordered
    * (a < b) pairs with cosine ≥ threshold on the 4-dp rounded value
    * (rounding before comparison keeps the threshold decision
    * float-order-independent and oracle-comparable). */
  def cosineNearDupPairs(corpus: DataFrame, bucketCol: String,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // fanout the PROBE side before the join, never the joined pairs
    // after it (pair-sized rows × two vectors): when stats pick a
    // broadcast join the output parallelism follows the pre-spread
    // probe side, and when the corpus is big the bucket count is big
    // too (k-means cells at scale), so the shuffle join parallelizes by
    // bucket — the |bucket|² pair rows never cross an exchange
    val a = Fanout.fanout(corpus.select(col(bucketCol).as("bucket"),
      col(idCol).as("id_a"), col(vecCol).as("vec_a")))
    val b = corpus.select(col(bucketCol).as("bucket"),
      col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("vec_a"), col("vec_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Eval-set (semantic) decontamination: flag corpus vectors whose
    * nearest benchmark/eval vector by cosine meets `tau` — the
    * embedding-space counterpart of n-gram benchmark contamination
    * (q54): a train document that embeds onto an eval item leaks the
    * benchmark even when no 13-gram matches. Emits one row per flagged
    * corpus vector: (vec_id, bench_id = its nearest benchmark item with
    * lowest-id tie-break at 6 dp, cos at 4 dp).
    *
    * Scale shape: the benchmark is eval-set-sized — ALWAYS broadcast;
    * the corpus is scanned once and scored in place, and the per-vector
    * argmax is one map-side-combinable `max_by` aggregation (no window,
    * no corpus shuffle beyond the final id-keyed agg). Threshold is
    * applied to the 4-dp-rounded value ([[cosineNearDupPairs]]'s
    * float-order-independence contract). */
  def semanticDecontam(corpus: DataFrame, benchmark: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = broadcast(benchmark.select(col(idCol).as("bench_id"),
      col(vecCol).as("b_vec")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(b, col(idCol) =!= col("bench_id"))
      .select(col(idCol).as("vec_id"), col("bench_id"),
        round(Similarity.cosine(col(vecCol), col("b_vec")), 6).as("cos"))
    scored.groupBy(col("vec_id"))
      .agg(max_by(struct(col("bench_id"), col("cos")),
        struct(col("cos"), (lit(0L) - col("bench_id")).as("nb"))).as("m"))
      .select(col("vec_id"), col("m.bench_id").as("bench_id"),
        round(col("m.cos"), 4).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** SemDeDup (Abbas et al.): prune the corpus to one representative per
    * semantic near-duplicate neighborhood — a vector is DROPPED iff some
    * smaller-id vector in its bucket is a near-duplicate (cosine ≥
    * threshold on the 4-dp rounded value, [[cosineNearDupPairs]]'s
    * contract). One deterministic pass, no iteration: the keep set is a
    * pure function of the pair set, so any engine that agrees on the
    * pairs agrees on the survivors. (SemDeDup's cluster-then-prune shape:
    * `bucketCol` is the cluster — a k-means cell at scale, so candidate
    * pairs stay within-cluster and the join never goes all-pairs.)
    *
    * Scale shape: pairs are bucket-local ([[cosineNearDupPairs]]); the
    * drop list is pair-bounded and distinct-by-id; the final anti-join is
    * id-keyed. The corpus never self-joins outside its bucket. */
  def semDedup(corpus: DataFrame, bucketCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dropped = cosineNearDupPairs(corpus, bucketCol, threshold, idCol,
        vecCol)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  /** Incremental SemDeDup: near-duplicate PAIRS for a NEW vector batch
    * against a maintained corpus index (the bucketed corpus itself),
    * plus within-batch pairs — the corpus never re-pairs against
    * itself, the shape that admits a daily embedding shard into a
    * 100 TB index ([[graft.ops.TextDedup.incrementalCandidates]]'s
    * contract for the semantic side). Pair orientation is normalized
    * (doc_a < doc_b), so `semDedup`'s smaller-id-wins policy composes:
    * a new vector joins the survivors iff no smaller-id near-dup exists
    * in EITHER the corpus or its own batch. ≡-tested against the full
    * [[cosineNearDupPairs]] on the unioned corpus (restricted to pairs
    * touching the batch). */
  def incrementalCosinePairs(newBatch: DataFrame, corpus: DataFrame,
      bucketCol: String, threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // probe-side fanout (as cosineNearDupPairs) — pair rows never
    // cross an exchange
    val n = Fanout.fanout(newBatch.select(col(bucketCol).as("bucket"),
      col(idCol).as("id_n"), col(vecCol).as("vec_n")))
    val c = corpus.select(col(bucketCol).as("bucket"),
      col(idCol).as("id_c"), col(vecCol).as("vec_c"))
    val vsCorpus = n.join(c, Seq("bucket"))
      .filter(col("id_n") =!= col("id_c"))
      .select(least(col("id_n"), col("id_c")).as("id_a"),
        greatest(col("id_n"), col("id_c")).as("id_b"),
        round(Similarity.cosine(col("vec_n"), col("vec_c")), 4).as("cos"))
      .filter(col("cos") >= threshold)
    val withinNew = cosineNearDupPairs(newBatch, bucketCol, threshold,
      idCol, vecCol)
    vsCorpus.unionByName(withinNew).distinct()
  }

  /** Bucketed self-KNN GRAPH: every vector's top-`k` neighbors within
    * its blocking bucket by cosine (desc, id tiebreak) — the input
    * structure for graph-based near-dup clustering, kNN classification,
    * and hubness diagnostics. Candidate pairs are bucket-local (an
    * equi-join, as [[cosineNearDupPairs]]); the per-vector top-k is a
    * rank window that Spark plans as WindowGroupLimit — each task keeps
    * a k-row heap per source vector, so the full |bucket|² score set
    * never materializes past the partial limit. */
  def knnGraph(corpus: DataFrame, bucketCol: String, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"knnGraph: need k > 0 ($k)")
    // fanout the PROBE side before the join (vector-sized rows), never
    // the joined pairs after it (pair-sized × two vectors): when stats
    // pick a broadcast join (small/few-bucket corpora) the output
    // parallelism follows the pre-spread probe side, and when the
    // corpus is big the bucket count is big too (k-means cells), so
    // the shuffle join parallelizes by bucket — in neither regime do
    // the |bucket|² pair rows ever cross an exchange
    val a = Fanout.fanout(corpus.select(col(bucketCol).as("bucket"),
      col(idCol).as("src"), col(vecCol).as("va")))
    val b = corpus.select(col(bucketCol).as("bucket"),
      col(idCol).as("dst"), col(vecCol).as("vb"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Johnson–Lindenstrauss sign-projection retrieval eval: project the
    * corpus to `projDims` dimensions with the deterministic Rademacher
    * hyperplanes ([[hyperplaneSigns]] — Achlioptas 2003's ±1 database-
    * friendly JL variant), then measure recall@k of the projected
    * brute-force ranking against the exact full-dim baseline per tier.
    * The cousin of the truncation eval (q138) for embeddings WITHOUT
    * matryoshka structure: truncation keeps a prefix, JL mixes ALL
    * input dims into each output dim, so it works on any embedding —
    * this query measures what that buys at the same dim budget.
    *
    * Deterministic: signs are md5-derived (engine-portable), projected
    * components round to 6 dp before scoring, scoring is the q25
    * contract on the projected vectors.
    *
    * Scale shape: projection is a narrow per-row map (projDims fused
    * dot products, zero shuffle); each tier then follows the
    * [[bruteForceTopK]] shape; the exact baseline is the shared
    * artifact. Output: |Q|·|tiers| rows. */
  def jlEval(corpus: DataFrame, queries: DataFrame, projDims: Seq[Int],
      k: Int, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      exact0: Option[DataFrame] = None): DataFrame = {
    require(projDims.nonEmpty && k > 0, s"jlEval: projDims=$projDims k=$k")
    // a wrong dim would NULL every projection (zip_with pads with
    // nulls) and reduce 'recall' to id-order noise — fail loudly on the
    // first corpus row instead (the lshTopK guard)
    corpus.select(col(vecCol)).limit(1).collect().foreach { r =>
      val actual = r.getSeq[Any](0).length
      require(actual == dim,
        s"jlEval: embeddings are $actual-dimensional but dim=$dim — " +
          "projections would silently NULL")
    }
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    // project ONCE at the widest tier: lower tiers are component
    // PREFIXES of the same sign family (hyperplaneSigns(d) is a prefix
    // of hyperplaneSigns(maxD)), so they slice the projected vector
    // instead of re-running dot products per tier
    val signs = hyperplaneSigns(projDims.max, dim)
    def proj(df: DataFrame): DataFrame = df.select(col(idCol),
      array(signs.map { s =>
        round(aggregate(
          zip_with(col(vecCol).cast("array<double>"),
            typedLit(s.toSeq), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x), 6)
      }: _*).as(vecCol))
    val pc = materialize(proj(corpus))
    val pq = proj(queries)
    projDims.map { d =>
      def tier(df: DataFrame): DataFrame = df.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val t = bruteForceTopK(tier(pc), tier(pq), k, idCol, vecCol)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(t, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .select(col("q_id"), lit(d.toLong).as("proj_dim"), col("n_overlap"),
          round(col("n_overlap").cast("double") / lit(k.toDouble), 4)
            .as("recall"))
    }.reduce(_.unionByName(_))
  }

  /** Binary (sign) quantization + Hamming top-k, with recall against
    * the exact cosine ranking — the 1-bit bottom rung of the
    * quantization ladder (flat → SQ8 → PQ → binary: 32× smaller than
    * float32, and Hamming distance is XOR + popcount — the cheapest
    * distance a CPU can compute; the standard coarse pre-filter tier
    * in front of a re-ranker). Bit d is set when v_d > 0; vectors pack
    * into two 32-bit words carried as longs (32-bit halves keep every
    * engine's packed SUM inside signed-64 range — no sign-bit
    * ambiguity cross-engine); distance = popcount(w0⊕q0) +
    * popcount(w1⊕q1), top-k by (hamming asc, id asc).
    *
    * Scale shape: packing is one posexplode into a map-side-combined
    * per-id two-word aggregation (done ONCE, the index artifact);
    * queries broadcast as words; scoring is pure integer codegen per
    * corpus row, top-k via the window rank. Returns per query
    * (q_id, n_overlap, recall) vs `exact0` (or the exact cosine
    * ranking computed here). */
  def binaryHammingEval(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      exact0: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"binaryHammingEval: k=$k")
    // dim probe (one aggregate row): the packing below is
    // contractually two 32-bit words, so shiftleft's mod-64 shift
    // semantics would silently alias bits for d > 64 — fail loudly.
    // Probe the MAX width over the whole corpus (a first-row probe
    // would miss wider rows further in), NULL-safe for NULL vectors.
    val probe = corpus.agg(
      max(size(col(vecCol))).as("dmax"),
      min(size(col(vecCol))).as("dmin")).collect().head
    require(!probe.isNullAt(0),
      "binaryHammingEval: empty corpus (or all vectors NULL)")
    val dim = probe.getInt(0)
    require(probe.getInt(1) > 0 && dim <= 64,
      s"binaryHammingEval: vector widths [${probe.getInt(1)}, $dim] " +
        "violate the two-32-bit-word packing contract (1..64); use " +
        "SQ8/PQ tiers for wider vectors")
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    def words(df: DataFrame): DataFrame = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("v") > 0 && col("pos") < 32,
          expr("shiftleft(CAST(1 AS BIGINT), pos)")).otherwise(0L))
          .as("w0"),
        sum(when(col("v") > 0 && col("pos") >= 32,
          expr("shiftleft(CAST(1 AS BIGINT), pos - 32)")).otherwise(0L))
          .as("w1"))
    val cw = words(corpus)
    val qw = broadcast(words(queries).select(col(idCol).as("q_id"),
      col("w0").as("q0"), col("w1").as("q1")))
    val scored = cw.join(qw, col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"),
        (bit_count(col("w0").bitwiseXOR(col("q0"))) +
          bit_count(col("w1").bitwiseXOR(col("q1")))).as("hamming"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("n_id").asc)
    val top = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    exact.join(top, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("q_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / lit(k.toDouble), 4)
          .as("recall"))
  }

  /** Greedy k-center coreset (farthest-point / Gonzalez 1985
    * 2-approximation) over cosine distance — the DIVERSE-subset
    * selector of a training-data pipeline (random sampling over-picks
    * dense regions; farthest-point covers the embedding space, the
    * construction behind coreset-based data selection à la Sener &
    * Savarese 2018). Seed = the minimum id (deterministic); each round
    * picks the point FARTHEST from the chosen set (ties id-ascending)
    * and folds the new center into the running min-distance column —
    * so round i is ONE corpus pass of a single fused least(), never a
    * |corpus|×|centers| re-scores.
    *
    * Driver state is k (id, vector) pairs — the kmeansLloyd contract:
    * each selected vector re-enters the plan as a literal; distances
    * round to 6 dp at the fold (engine-replayable argmax). The emitted
    * `dist` is the selection-time distance to the previous set — the
    * k-center objective's trajectory (dist of pick k+1 bounds the
    * covering radius of the first k). Returns k rows
    * (pos, vec_id, dist); the seed's dist is NULL. */
  def kCenterCoreset(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(k >= 2, s"kCenterCoreset: k=$k")
    val spark0 = corpus.sparkSession
    val v = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("e"))
    def vecOf(vid: Long): Seq[Double] =
      v.filter(col("vid") === vid).head().getSeq[Double](1)
    def dist(center: Seq[Double]): Column =
      round(lit(1.0) - graft.expr.Similarity.cosine(col("e"),
        typedLit(center)), 6)
    val seedId = v.orderBy(col("vid")).select(col("vid")).head().getLong(0)
    val picks = scala.collection.mutable.ListBuffer[(Long, Long,
      Option[Double])]((1L, seedId, None))
    var md = materialize(v.select(col("vid"), col("e"),
      dist(vecOf(seedId)).as("mind")))
    (2 to k).foreach { i =>
      val far = md.orderBy(col("mind").desc, col("vid").asc).head()
      picks += ((i.toLong, far.getLong(0), Some(far.getDouble(2))))
      if (i < k) md = materialize(md.select(col("vid"), col("e"),
        least(col("mind"), dist(vecOf(far.getLong(0)))).as("mind")))
    }
    import spark0.implicits._
    picks.toSeq.toDF("pos", "vec_id", "dist")
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE
    * data-construction step, Karpukhin et al. 2020 §3.2): for each
    * anchor, the top-k most-SIMILAR vectors with a DIFFERENT label —
    * the negatives that actually move a metric-learning loss (random
    * negatives are trivially far; these sit just across the boundary).
    *
    * Scale shape: identical to [[bruteForceTopK]] — anchors broadcast,
    * corpus scored in one pass with the label-mismatch predicate fused
    * into the join, per-anchor top-k via WindowGroupLimit; at corpus
    * scale swap the scoring stage for an [[ivfPqSearch]] shortlist and
    * filter labels on the survivors. Deterministic: 6-dp cosine rank,
    * id tie-break, 4-dp output. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k > 0, s"hardNegatives: k=$k")
    val q = broadcast(anchors.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), col(labelCol).as("q_label")))
    val scored = corpus
      .select(col(idCol), col(vecCol), col(labelCol).as("n_label"))
      .join(q, col(idCol) =!= col("q_id") && col("n_label") =!= col("q_label"))
      .select(col("q_id"), col(idCol).as("n_id"), col("n_label"),
        round(Similarity.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("n_label"),
        round(col("cos"), 4).as("cos"))
  }

  /** Contrastive TRIPLET construction — the (anchor, positive,
    * negative) example builder of metric-learning data pipelines
    * (SimCSE/DPR-style): per anchor, the most-similar SAME-label
    * vector (hardest positive worth pulling closer) and the most-
    * similar OTHER-label vector ([[hardNegatives]]'s top-1 — the
    * negative just across the boundary), plus the margin
    * cos_pos − cos_neg the triplet loss would see (≤ 0 flags anchors
    * whose nearest other-label neighbor already out-scores their best
    * positive — the examples that actually move the loss).
    *
    * Scale shape: ONE corpus pass scores both sides — anchors
    * broadcast, the label-match flag computed inside the join
    * projection, and the two top-1s come from a single window
    * PARTITIONED on (anchor, same_label) (WindowGroupLimit on both
    * branches); the pivot to one row per anchor is an anchor-keyed
    * aggregation over ≤ 2 rows each. Anchors missing a positive or a
    * negative (singleton labels) are dropped by the inner pivot —
    * a triplet needs all three legs. Determinism: the q25 contract
    * (6-dp rank cosine, id tie-break, 4-dp output; margin from the
    * 4-dp outputs). */
  def contrastiveTriplets(corpus: DataFrame, anchors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = broadcast(anchors.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), col(labelCol).as("q_label")))
    val scored = corpus
      .select(col(idCol), col(vecCol), col(labelCol).as("n_label"))
      .join(q, col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"),
        (col("n_label") === col("q_label")).as("same"),
        round(Similarity.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"), col("same"))
      .orderBy(col("cos").desc, col("n_id").asc)
    val top = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
    top.groupBy(col("q_id"))
      .agg(
        max(when(col("same"), struct(col("n_id"), col("cos")))).as("p"),
        max(when(!col("same"), struct(col("n_id"), col("cos")))).as("n"))
      .filter(col("p").isNotNull && col("n").isNotNull)
      .select(col("q_id"), col("p.n_id").as("pos_id"),
        round(col("p.cos"), 4).as("pos_cos"),
        col("n.n_id").as("neg_id"), round(col("n.cos"), 4).as("neg_cos"))
      .select(col("q_id"), col("pos_id"), col("pos_cos"), col("neg_id"),
        col("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 4).as("margin"))
  }

  /** nDCG@k of an IVF·PQ serving ranking vs the exact cosine baseline,
    * per query and nprobe tier — the RANK-WEIGHTED complement to
    * [[ivfPqRecall]]: recall counts how many of the true top-k an index
    * returns; nDCG also charges WHERE it puts them (a true neighbor
    * served at position 10 earns 1/log2(11) of one served at 1 —
    * Järvelin & Kekäläinen 2002, binary relevance on the exact top-k).
    *
    * Determinism: each position gain ln(2)/ln(pos+1) snaps to the
    * shared [[graft.expr.Snap]] 1e9 grid before summation (order-free);
    * IDCG is the same snapped sum over the ideal positions 1..k,
    * computed relationally in BOTH engines (no baked-in constant that
    * one engine computed and the other parsed); dcg and ndcg round to
    * 4 dp from the raw sums.
    *
    * Scale shape: each tier is one [[ivfPqSearch]] (the q135 serving
    * contract) plus a baseline-keyed hit join and a per-query
    * aggregation over ≤k rows; the exact baseline is the shared
    * materialized artifact. Output: |Q|·|tiers| rows. */
  def ndcgEval(corpus: DataFrame, queries: DataFrame, index: IvfPqIndex,
      nprobes: Seq[Int], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      exact0: Option[DataFrame] = None): DataFrame = {
    require(nprobes.nonEmpty && k > 0, s"ndcgEval: nprobes=$nprobes, k=$k")
    import graft.expr.Snap
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    def gain(rank: Column): Column =
      log(lit(2.0)) / log(rank.cast("double") + lit(1.0))
    val idcg = broadcast(queries.sparkSession.range(1, k + 1L)
      .agg(Snap.snappedSum(gain(col("id")), 1e9).as("idcg")))
    val qIds = exact.select(col("q_id")).distinct()
    nprobes.map { np =>
      val hits = ivfPqSearch(index, queries, np, k, idCol, vecCol)
        .join(exact, Seq("q_id", "n_id"))
        .groupBy(col("q_id"))
        .agg(Snap.snappedSum(gain(col("rank")), 1e9).as("dcg"))
      qIds.join(hits, Seq("q_id"), "left").crossJoin(idcg)
        .select(col("q_id"), lit(np).cast("long").as("nprobe"),
          round(coalesce(col("dcg"), lit(0.0)), 4).as("dcg"),
          round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 4).as("ndcg"))
    }.reduce(_.unionByName(_))
  }

  /** MRR@k of the served index vs the exact ranking, per nprobe tier —
    * the first-relevant-position summary next to q142's recall (how
    * many true neighbors return) and q157's nDCG (where they all
    * rank): MRR answers the "is the TOP result right" question a
    * retrieval-augmented pipeline lives on. Per tier, one
    * [[ivfPqSearch]] under the q135 serving contract, one
    * baseline-keyed hit join, and a per-query integer min — eval cost
    * is tiers × serving cost. Queries whose served list contains no
    * true neighbor report first_rank 0 / rr 0 (not a dropped row).
    * Deterministic: ranks are exact integers; rr = 1/first_rank is one
    * IEEE division rounded to 6 dp. */
  def mrrEval(corpus: DataFrame, queries: DataFrame, index: IvfPqIndex,
      nprobes: Seq[Int], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      exact0: Option[DataFrame] = None): DataFrame = {
    require(nprobes.nonEmpty && k > 0, s"mrrEval: nprobes=$nprobes, k=$k")
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    val qIds = exact.select(col("q_id")).distinct()
    nprobes.map { np =>
      val first = ivfPqSearch(index, queries, np, k, idCol, vecCol)
        .join(exact, Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(min(col("rank")).as("fr"))
      qIds.join(first, Seq("q_id"), "left")
        .select(col("q_id"), lit(np).cast("long").as("nprobe"),
          coalesce(col("fr"), lit(0L)).as("first_rank"),
          round(coalesce(lit(1.0) / col("fr"), lit(0.0)), 6).as("rr"))
    }.reduce(_.unionByName(_))
  }

  /** Per-cell PQ RECONSTRUCTION error — the index-quality table that
    * predicts q189's quantization losses before any query runs: for
    * every encoded vector, the squared distance between its (residual)
    * subvectors and the codewords its codes name, summed over the m
    * subspaces and rolled up per coarse cell. A cell with outsized
    * mean error is where ADC rankings go wrong — re-train books, raise
    * kCodes, or re-rank exactly there. One zero-join corpus projection
    * (assignment, residual, and codeword lookups are all literal maps)
    * + one code-table join + one map-side-combined rollup; |cells|
    * output rows. Deterministic: per-subspace errors snap to the 1e6
    * grid (the ADC table contract) so sums are exact longs; means are
    * one division rounded to 6 dp. */
  def pqQuantError(corpus: DataFrame, index: IvfPqIndex,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val IvfPqIndex(codes, coarse, books, m, sub, residual) = index
    def subv(v: Column, j: Int): Column = slice(v, j * sub + 1, sub)
    val assigned = corpus
      .select(col(idCol).as("n_id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__cell", nearestCell(col("__v"), coarse))
    val res = if (residual)
      assigned.withColumn("__v", zip_with(col("__v"),
        cellCentroid(coarse)(col("__cell")), (x, y) => x - y))
    else assigned
    val errJ = (0 until m).map { j =>
      val cw = element_at(typedLit(books(j)), col(s"__c$j"))
      floor(aggregate(zip_with(subv(col("__v"), j), cw,
        (x, y) => { val d = x - y; d * d }), lit(0.0), (a, x) => a + x) *
        lit(1e6) + lit(0.5)).cast("long")
    }.reduce(_ + _)
    res.join(codes.drop("__cell"), "n_id")
      .select(col("__cell").as("cell"), errJ.as("err"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("err")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 6).as("mean_err"),
        round(max(col("err")).cast("double") / lit(1e6), 6).as("max_err"))
  }

  /** Retrieval MISS ATTRIBUTION — the "why" behind the recall curve
    * (q142 counts the misses; this names them): for every exact-top-k
    * neighbor the served list dropped, was its CELL even probed?
    * cell-not-probed → `probe_loss` (buy recall with nprobe);
    * cell-probed-but-outranked → `quant_loss` (buy recall with more
    * codebooks/residual encoding or an +R re-rank). The two counts
    * point at DIFFERENT knobs, which is the whole value of splitting
    * them. Per (query, tier): one serve, one anti-join against the
    * exact baseline, one join to the code table's cell assignment,
    * and one broadcast probe-set join — eval cost is tiers × serving
    * cost. Queries with no misses report zeros, not gaps. */
  def missAttribution(corpus: DataFrame, queries: DataFrame,
      index: IvfPqIndex, nprobes: Seq[Int], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      exact0: Option[DataFrame] = None): DataFrame = {
    require(nprobes.nonEmpty && k > 0, s"missAttribution: $nprobes, k=$k")
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    val qIds = exact.select(col("q_id")).distinct()
    val cellOf = index.codes.select(col("n_id"), col("__cell").as("n_cell"))
    nprobes.map { np =>
      val served = ivfPqSearch(index, queries, np, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))
      val missed = exact.join(served, Seq("q_id", "n_id"), "left_anti")
      val probeCells = slice(array_sort(array(index.coarse.map {
        case (cell, c) =>
          struct(snappedD2(col("__qv"), c).as("d"), lit(cell).as("cell"))
      }: _*)), 1, np)
      val probed = queries
        .select(col(idCol).as("q_id"),
          col(vecCol).cast("array<double>").as("__qv"))
        .select(col("q_id"), explode(probeCells).as("pc"))
        .select(col("q_id"), col("pc.cell").as("n_cell"),
          lit(true).as("hit"))
      val att = missed.join(cellOf, "n_id")
        .join(broadcast(probed), Seq("q_id", "n_cell"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_missed"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_quant_loss"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_probe_loss"))
      qIds.join(att, Seq("q_id"), "left")
        .select(col("q_id"), lit(np).cast("long").as("nprobe"),
          coalesce(col("n_missed"), lit(0L)).as("n_missed"),
          coalesce(col("n_quant_loss"), lit(0L)).as("n_quant_loss"),
          coalesce(col("n_probe_loss"), lit(0L)).as("n_probe_loss"))
    }.reduce(_.unionByName(_))
  }

  /** Cell-quota diversified top-k (the retrieval-diversity shape — MMR's
    * scalable relational cousin): exact cosine ranking, but at most
    * `perCell` results per coarse-quantizer cell before the global
    * top-k, so one dense semantic neighborhood cannot monopolize a
    * result page — the serving-side counterpart of cluster-balanced
    * SELECTION (q130's token apportionment), applied per query.
    *
    * Determinism: cell assignment is the shared coarse argmin ((d, cell)
    * tie-break), cosine the 6-dp snap, both windows (cos desc, id)
    * ordered — the oracle replays assignment, quota, and rank.
    *
    * Scale shape: queries broadcast; the corpus is scored in ONE pass;
    * both rank windows plan as WindowGroupLimit (a perCell-row heap per
    * (query, cell) task-side, then a k-row heap per query over the
    * ≤|cells|·perCell quota survivors — the global window's input is
    * quota-sized, not corpus-sized). For 100 TB serving compose the
    * same two windows over [[ivfPqSearch]]'s shortlist instead of the
    * exact scores: the quota/rank plan is identical, only the scoring
    * stage swaps. */
  def diverseTopK(corpus: DataFrame, queries: DataFrame,
      coarse: Seq[(Long, Seq[Double])], k: Int, perCell: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && perCell > 0, s"diverseTopK: k=$k, perCell=$perCell")
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec")))
    val scored = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", nearestCell(col("cv"), coarse))
      .join(q, col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"), col("cell"),
        round(Similarity.cosine(col("cv"), col("q_vec")), 6).as("cos"))
    val wc = Window.partitionBy(col("q_id"), col("cell"))
      .orderBy(col("cos").desc, col("n_id").asc)
    val wg = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("cell_rank", row_number().over(wc))
      .filter(col("cell_rank") <= perCell)
      .withColumn("rank", row_number().over(wg))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        col("cell"), round(col("cos"), 4).as("cos"))
  }

  /** Greedy MMR re-ranking proper (Carbonell & Goldstein 1998): from a
    * per-query shortlist, repeatedly pick
    * argmax λ·rel(i) − (1−λ)·max_{j∈selected} sim(i, j) — the iterative
    * relevance/novelty trade-off that [[diverseTopK]]'s cell quota
    * approximates in one pass.
    *
    * Execution shape (VERDICT r13 #1): per-query MMR state is
    * shortlist²-bounded, so the WHOLE greedy loop runs inside one
    * native expression ([[graft.expr.catalyst.MmrSelect]]) over a
    * per-query collect_list — ONE aggregation, ONE job, job count
    * independent of k. The former relational unrolling was ~50
    * sequential tiny jobs at the q155 call site (per-step
    * localCheckpoint barriers + per-step unions) whose per-job
    * scheduler latency WAS the query on a warm host — and would be
    * ~100 ms × jobs on a real cluster; the expression form replays it
    * bit-identically (6-dp sims via the same fused cosine loop, 6-dp
    * scores via Spark's own round semantics, struct-min argmax with
    * id-ascending ties, anti-join retirement keyed on n_id) without
    * any driver iteration.
    *
    * Determinism: rel is the 4-dp shortlist cosine, pairwise sims snap
    * to 6 dp, the MMR score to 6 dp BEFORE each argmax, ties break
    * id-ascending; λ enters as the same IEEE `1.0 - lambda` literal
    * the oracle writes.
    *
    * Scale shape: the shortlist is the one corpus pass ([[bruteForceTopK]]
    * here; swap [[ivfPqSearch]] at 100 TB — the greedy stage is
    * agnostic to how the shortlist was produced); candidates group by
    * q_id (ONE exchange of |Q| shortlist-sized lists), then the greedy
    * selection is embarrassingly parallel across queries — nothing
    * corpus-sized moves, and no per-step barrier exists to multiply
    * scheduler latency. `short0` supplies an already-materialized
    * shortlist (q_id, n_id, cos) — e.g. the session exact-ranking
    * artifact — skipping the corpus pass entirely. On that path the
    * `shortlist` parameter is IGNORED (the supplied table's own depth
    * governs); the caller owns supplying a table ≥ k deep per query —
    * a shallower artifact yields fewer than k reranked rows for the
    * affected queries (greedy steps past the depth select nothing).
    * Output: (q_id, pos, n_id, rel, maxsim, mmr). */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, shortlist: Int,
      k: Int, lambda: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      short0: Option[DataFrame] = None)
      : DataFrame = {
    // shortlist only governs the internally-built corpus pass; when
    // short0 carries its own depth the bound would be misleading
    require(short0.isDefined || shortlist >= k,
      s"mmrRerank: shortlist=$shortlist k=$k")
    require(k >= 1, s"mmrRerank: k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"mmrRerank: lambda=$lambda")
    val short = short0
      .map(_.select(col("q_id"), col("n_id"), col("cos").as("rel")))
      .getOrElse(
        bruteForceTopK(corpus, queries, shortlist, idCol, vecCol)
          .select(col("q_id"), col("n_id"), col("cos").as("rel")))
    val vecs = corpus.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("v"))
    val cands = short.join(vecs, Seq("n_id"))
      .groupBy(col("q_id"))
      .agg(collect_list(struct(col("n_id"), col("rel"), col("v")))
        .as("cands"))
    val picks = org.apache.spark.sql.GraftBridge.column(
      graft.expr.catalyst.MmrSelect(
        org.apache.spark.sql.GraftBridge.expression(col("cands")),
        k, lambda))
    cands.select(col("q_id"), explode(picks).as("p"))
      .select(col("q_id"), col("p.pos").as("pos"), col("p.n_id").as("n_id"),
        col("p.rel").as("rel"), col("p.maxsim").as("maxsim"),
        col("p.mmr").as("mmr"))
  }

  /** The ADDITIVE sufficient statistic of [[mmrRerank]]'s serving
    * diversity: per pick position, this query set's size and the
    * integer-grid (1e6) sums of relevance and redundancy (maxsim).
    * Against a FIXED index each query's greedy selection is
    * independent of every other query, so cells from disjoint query
    * batches merge by ADDITION — the *FromCells contract that lets
    * the streaming monitor maintain the grid incrementally
    * ([[graft.stream.StreamCuration.startMmrDiversitySink]]). rel is
    * the 4-dp shortlist cosine and maxsim the 6-dp pairwise max —
    * both EXACT on the 1e6 grid, so the sums are exact longs (far
    * under the floor-saturation bound: |rel|·1e6 ≤ 1e6 ≪ 2^63).
    * Queries whose shortlist ran dry before pos p simply don't
    * contribute to that row (n_queries is per-pos). Returns
    * (pos, n_queries, rel_sum_l, maxsim_sum_l). */
  def mmrPositionCells(corpus: DataFrame, queries: DataFrame,
      shortlist: Int, k: Int, lambda: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      short0: Option[DataFrame] = None): DataFrame =
    mmrRerank(corpus, queries, shortlist, k, lambda, idCol, vecCol,
        short0)
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n_queries"),
        sum(floor(col("rel") * lit(1e6) + lit(0.5)).cast("long"))
          .as("rel_sum_l"),
        sum(floor(col("maxsim") * lit(1e6) + lit(0.5)).cast("long"))
          .as("maxsim_sum_l"))

  /** Per-position readout of [[mmrPositionCells]]: mean relevance,
    * mean redundancy, and the mean MMR trade-off λ·rel − (1−λ)·maxsim
    * at each rank position, 6 dp — "how much relevance does the
    * result page trade for novelty at position p". Means are IEEE
    * divisions of exact integer-grid sums (correctly rounded, so
    * identical under any accumulation history), snapped at 6 dp. */
  def mmrFromCells(cells: DataFrame, lambda: Double): DataFrame = {
    val nD = col("n_queries").cast("double")
    val mr = col("rel_sum_l").cast("double") / nD / lit(1e6)
    val mm = col("maxsim_sum_l").cast("double") / nD / lit(1e6)
    cells.select(col("pos"), col("n_queries"),
      round(mr, 6).as("mean_rel"), round(mm, 6).as("mean_maxsim"),
      round(lit(lambda) * mr - lit(1.0 - lambda) * mm, 6)
        .as("mean_mmr"))
      .orderBy(col("pos"))
  }

  /** Deterministic Rademacher (±1) hyperplane entries derived from md5 —
    * the same values any engine's `md5()` derives, so LSH bucket
    * assignments are portable and reproducible (no RNG state). Entry
    * (p, i) is +1 iff the first hex nibble of md5("p|i") is even. */
  private[graft] def hyperplaneSigns(planes: Int, dim: Int): Seq[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      Array.tabulate(dim) { i =>
        val hex = digest.digest(s"$p|$i".getBytes("UTF-8"))
        // first hex char = high nibble of byte 0
        if (((hex(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** The hyperplane sign signature as a standalone column — the
    * bucketing half of [[lshTopK]], exposed so graph builders (q172's
    * label-propagation kNN edges) can bucket a corpus without running
    * a query join. Per-row codegen'd fold, no shuffle, no state;
    * planes=0 → the single bucket 0 (exact search). */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column =
    hyperplaneSigns(planes, dim).zipWithIndex.map { case (s, p) =>
      val plane = array(s.map(lit).toIndexedSeq: _*)
      when(Similarity.dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.foldLeft(lit(0L))(_ + _)

  /** Random-hyperplane LSH ANN (SimHash for vectors): bucket = the
    * `planes`-bit sign pattern of the vector's projections onto
    * hash-derived ±1 hyperplanes; each query searches ONLY its own
    * bucket, exact cosine re-ranks within it.
    *
    * Scale design: the signature is a per-row projection (codegen'd
    * fold over the array — no shuffle, no model state), so bucketing a
    * 100 TB corpus is a single narrow pass; the candidate join is an
    * equi-join on the bucket id. `planes` is the recall/cost knob:
    * each bit halves the expected bucket population. Unlike [[ivfTopK]]
    * there is no training/centroid pass at all. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, planes: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    // a wrong dim would NULL every projection (zip_with pads with nulls)
    // and silently collapse all rows into bucket 0 — i.e. a full cross
    // join instead of LSH. Fail loudly on the first corpus row instead.
    corpus.select(col(vecCol)).limit(1).collect().foreach { r =>
      val actual = r.getSeq[Any](0).length
      require(actual == dim,
        s"lshTopK: embeddings are $actual-dimensional but dim=$dim — " +
          "pass the correct dim or buckets degenerate")
    }
    def signature(vec: Column): Column = lshSignature(vec, planes, dim)
    val c = corpus.select(col(idCol), col(vecCol),
      signature(col(vecCol)).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), signature(col(vecCol)).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"),
        round(Similarity.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Lloyd's k-means over the embedding column — the full iterative loop
    * whose E-step is the q74 centroid pass and whose output is the
    * trained codebook [[ivfTopK]] probes.
    *
    * Scale design: centroids are DRIVER state (k×dim doubles — the same
    * shape MLlib's KMeans keeps), folded into the plan as literals, so
    * the assignment step is a zero-shuffle codegen'd projection: an
    * argmin over k literal-centroid squared-L2 distances, each a fixed
    * left-to-right `aggregate`/`zip_with` fold. Each iteration's ONLY
    * exchange is the k×dim map-side-combined partial-avg aggregation
    * (identical contract to q74); the corpus is never joined, never
    * re-partitioned, and read once per iteration.
    *
    * Determinism: init = the k smallest-id vectors (no RNG); every
    * centroid component is snapped to `floor(x·1e6 + 0.5)/1e6` at each
    * iteration boundary, so the whole trajectory — distances, argmin
    * assignments, next centroids — is bit-reproducible across runs,
    * partitionings, and engines (the DuckDB oracle replays it exactly);
    * argmin ties break to the lowest cluster id on both sides.
    *
    * Returns the final codebook relationally: (cluster, dim, m, n) with
    * 1-based dim, n = cluster population. Empty clusters drop out (both
    * engines agree). */
  /** Joinless nearest-centroid id for a double-array column: argmin over
    * literal centroids with (distance, centroid-id) tie-break — the
    * assignment expression shared by the Lloyd loop and IVF indexing. */
  private def nearestCell(v: Column,
      cents: Seq[(Long, Seq[Double])]): Column = {
    val dists = array(cents.map { case (_, c) =>
      aggregate(
        zip_with(v, typedLit(c), (x, y) => { val d = x - y; d * d }),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    element_at(typedLit(cents.map(_._1)),
      array_position(dists, array_min(dists)).cast("int"))
  }

  private def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  private def kmeansSrc(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))

  private def kmeansMStep(a: DataFrame): DataFrame = a
    .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "x")))
    .groupBy(col("cluster"), (col("pos") + 1).cast("long").as("dim"))
    .agg(r6(avg(col("x"))).as("m"), count(lit(1)).as("n"))

  /** The trained codebook (driver state) after `iters − 1` Lloyd
    * updates — the centroids [[kmeansLloyd]]'s final pass assigns
    * against, exposed for IVF indexing ([[ivfTrainedTopK]]). */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[(Long, Seq[Double])] = {
    require(k > 0 && iters > 0, s"kmeansCentroids: k=$k, iters=$iters")
    val src = kmeansSrc(corpus, idCol, vecCol)
    var cents: Seq[(Long, Seq[Double])] = src.orderBy(col("__id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    for (_ <- 1 until iters)
      cents = kmeansMStep(
        src.withColumn("cluster", nearestCell(col("__v"), cents)))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cluster"), transform(col("dm"), s => s.getField("m")).as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq
    cents
  }

  def kmeansLloyd(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = kmeansCentroids(corpus, k, iters, idCol, vecCol)
    kmeansMStep(kmeansSrc(corpus, idCol, vecCol)
      .withColumn("cluster", nearestCell(col("__v"), cents)))
  }

  /** 1-based POSITION of the nearest codebook entry (not its cell id):
    * argmin over literal centroids, ties to the first (= lowest-cell,
    * since codebooks are cell-ordered) position — the positional code
    * [[pqAdcTopK]] stores, so ADC can index a per-query distance table
    * with `element_at`. */
  private def nearestCellPos(v: Column, cents: Seq[Seq[Double]]): Column = {
    val dists = array(cents.map { c =>
      aggregate(
        zip_with(v, typedLit(c), (x, y) => { val d = x - y; d * d }),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    array_position(dists, array_min(dists)).cast("int")
  }

  /** All m per-subspace PQ codebooks in ONE corpus pass per Lloyd
    * iteration: the m independent [[kmeansCentroids]] trajectories
    * (same smallest-id init, same per-iteration 1e-6 snap, same
    * (distance, cell) tie-breaks) computed from a single aggregation
    * keyed by (subspace, cell, dim). The independent pin on this
    * trajectory is the DuckDB oracle replay (q133/q135/q142 rebuild
    * the per-subspace Lloyd loop from scratch in SQL and the hashes
    * must match); AnnSpec adds partition-invariance and the exact-ADC
    * degenerate case on top. Returns cell-ordered (cell, centroid) per
    * subspace; empty cells drop out, as in the per-subspace loop. */
  private def pqBooks(src: DataFrame, idCol: String, m: Int, sub: Int,
      kCodes: Int, iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    var books: Seq[Seq[(Long, Seq[Double])]] = {
      val rows = src.orderBy(col(idCol)).limit(kCodes)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
      (0 until m).map(j => rows.map { case (id, v) =>
        (id, v.slice(j * sub, (j + 1) * sub)) })
    }
    for (_ <- 1 until iters) {
      // per vector: m (subspace, assigned cell, sub-vector) structs —
      // assignment is the literal argmin against each subspace's current
      // book; the exploded rows feed one map-side-combined mean
      val perSub = array((0 until m).map { j =>
        struct(lit(j).as("j"),
          nearestCell(slice(col("__v"), j * sub + 1, sub), books(j)).as("cell"),
          slice(col("__v"), j * sub + 1, sub).as("sv"))
      }: _*)
      val agg = src.select(explode(perSub).as("s"))
        .select(col("s.j").as("j"), col("s.cell").as("cell"),
          posexplode(col("s.sv")).as(Seq("pos", "x")))
        .groupBy(col("j"), col("cell"), col("pos"))
        .agg(r6(avg(col("x"))).as("mval"))
        .collect()
      books = (0 until m).map { j =>
        agg.filter(_.getInt(0) == j)
          .groupBy(_.getLong(1))
          .map { case (cell, rows) =>
            (cell, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq) }
          .toSeq.sortBy(_._1)
      }
    }
    books
  }

  /** Squared L2 distance to a literal centroid, snapped half-up to the
    * 1e-6 grid as a long — the exact-integer ADC term ([[pqAdcTopK]]):
    * once each subspace distance is a long, the m-term sum and the
    * (distance, id) ranking are integer comparisons, deterministic
    * under any partitioning and bit-identical in the oracle. */
  private def snappedD2(v: Column, cent: Seq[Double]): Column =
    floor(aggregate(
      zip_with(v, typedLit(cent), (x, y) => { val d = x - y; d * d }),
      lit(0.0), (acc, x) => acc + x) * lit(1e6) + lit(0.5)).cast("long")

  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) with asymmetric distance
    * computation (ADC): split each `dim`-vector into `m` subspaces of
    * dim/m, train an independent `kCodes`-entry codebook per subspace
    * (the SAME deterministic Lloyd loop/contract as [[ivfTrainedTopK]] —
    * smallest-id init, 1e-6 snap, lowest-cell ties), store each corpus
    * vector as m small positional codes, and rank corpus vectors for a
    * query by the sum of per-subspace distances from the query's
    * PRECOMPUTED distance table to each codebook entry.
    *
    * Scale design — the memory-bound ANN path: the corpus collapses to
    * m codes per vector (m bytes at kCodes ≤ 256 vs dim floats — 32×
    * smaller at 64-dim/4-subspace), so a 100 TB embedding corpus scans
    * as ~3 TB of codes. Encoding is a zero-shuffle literal-argmin
    * projection (codebooks are m·kCodes·(dim/m) driver doubles, folded
    * into the plan); each query's m×kCodes distance table is computed
    * once on the broadcast side; scoring a candidate is m `element_at`
    * lookups + an integer sum — no per-pair O(dim) arithmetic anywhere.
    *
    * Determinism: ADC terms are 1e-6-snapped longs ([[snappedD2]]), so
    * scores and the (score, id) ranking are exact integer comparisons;
    * the Lloyd trajectory is the [[kmeansCentroids]] contract. The
    * oracle replays all m codebooks in one partitioned-by-subspace CTE.
    * Returns (q_id, rank, n_id, adc) with adc = score/1e6 rounded 4 dp. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, m: Int, kCodes: Int,
      iters: Int, k: Int, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && dim % m == 0, s"pqAdcTopK: dim=$dim not divisible by m=$m")
    require(k > 0 && kCodes > 0 && iters > 0,
      s"pqAdcTopK: k=$k, kCodes=$kCodes, iters=$iters")
    val sub = dim / m
    def subv(v: Column, j: Int): Column = slice(v, j * sub + 1, sub)
    val src = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    // independent per-subspace codebooks over the sliced sub-vectors,
    // cell-ordered → positional codes; trained by the FUSED loop (one
    // corpus pass per iteration for all m trajectories)
    val books: Seq[Seq[Seq[Double]]] =
      pqBooks(src, idCol, m, sub, kCodes, iters).map(_.map(_._2))
    val codes = src.select(col(idCol).as("n_id") +: (0 until m).map(j =>
      nearestCellPos(subv(col("__v"), j), books(j)).as(s"__c$j")): _*)
    // per-query ADC distance tables: one snapped-long entry per
    // (subspace, codebook position), built on the broadcast side
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("__qv"))
      .select(col("q_id") +: (0 until m).map(j =>
        array(books(j).map(c => snappedD2(subv(col("__qv"), j), c)): _*)
          .as(s"__dt$j")): _*))
    val scored = codes.crossJoin(q)
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(j => element_at(col(s"__dt$j"), col(s"__c$j")))
          .reduce(_ + _).as("__s"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("__s").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("__s").cast("double") / lit(1e6), 4).as("adc"))
  }

  /** IVF·PQ composed ANN (Jégou et al., TPAMI 2011 §IV — the IVFADC
    * system): a coarse quantizer prunes each query to its `nprobe`
    * nearest cells, and PQ asymmetric distance scores ONLY the probed
    * cells' codes. This is the 100 TB serving shape: [[pqAdcTopK]]'s
    * exhaustive corpus×queries scan becomes a cell equi-join, touching
    * nprobe/kCells of the code table per query.
    *
    * `residual = true` is IVFADC proper (Jégou §IV.A): PQ codebooks are
    * trained on, and codes encode, the RESIDUAL x − coarse_centroid(x)
    * rather than the raw sub-vector — residuals concentrate around the
    * origin, so the same m/kCodes code budget quantizes finer and buys
    * recall (AnnSpec pins residual recall@10 ≥ raw on the test corpus).
    * ADC tables then depend on the probed cell (the query's residual
    * differs per cell), so the broadcast side carries queries×nprobe
    * table sets instead of queries — still query-sized, never
    * corpus-sized. `residual = false` keeps the IVF-Flat-style raw
    * encoding whose nprobe=kCells ranking is bit-identical to
    * [[pqAdcTopK]] (asserted in AnnSpec).
    *
    * Scale design: the corpus is read ONCE into an inverted code list —
    * (cell, id, m positional codes) — by a single zero-join projection
    * (coarse centroids AND all m codebooks are driver literals folded
    * into the plan). The query side (probed cells + m ADC distance
    * tables) is queries×nprobe rows, broadcast; candidate scoring is a
    * broadcast HASH join on the cell key — no nested-loop join
    * anywhere (PlanContractSpec-enforced). Training costs are the
    * [[kmeansCentroids]] contract: k×dim driver state, one
    * map-side-combined exchange per Lloyd iteration.
    *
    * Determinism: probe ordering uses 1e-6-snapped-long L2 with ties to
    * the lowest cell; ADC terms are [[snappedD2]] longs; the Lloyd
    * trajectories (coarse and per-subspace) are the q76/q133 replay
    * contracts; residuals subtract 1e-6-snapped centroids (exact IEEE
    * subtraction, replayed identically by the oracle).
    * Returns (q_id, rank, n_id, adc) with adc = score/1e6 rounded 4 dp. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, kCells: Int,
      nprobe: Int, m: Int, kCodes: Int, iters: Int, k: Int, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      residual: Boolean = false): DataFrame =
    ivfPqSearch(ivfPqIndex(corpus, kCells, m, kCodes, iters, dim,
      idCol, vecCol, residual), queries, nprobe, k, idCol, vecCol)

  /** A trained, encoded IVF·PQ index: the train-once half of the
    * serving split. `codes` is the inverted code list (coarse cell +
    * m positional codes per corpus vector — persist it for repeated or
    * streaming search); `coarse`/`books` are the driver-literal
    * codebooks every query folds into its plan; `residual` records
    * whether books/codes live in residual space (IVFADC) or raw
    * sub-vector space. */
  final case class IvfPqIndex(codes: DataFrame,
      coarse: Seq[(Long, Seq[Double])], books: Seq[Seq[Seq[Double]]],
      m: Int, sub: Int, residual: Boolean = false)

  /** The assigned coarse centroid as a literal-map lookup — cell ids
    * and centroids are driver state, so residualization is a zero-join
    * codegen'd projection. */
  private def cellCentroid(coarse: Seq[(Long, Seq[Double])])(cell: Column)
      : Column =
    element_at(
      map(coarse.flatMap { case (id, c) =>
        Seq(lit(id), typedLit(c)) }: _*), cell)

  /** Encode a vector batch against FROZEN codebooks: coarse cell +
    * m positional PQ codes per row, one zero-join projection (centroids
    * and books are plan literals). The shared encoder behind
    * [[ivfPqIndex]] and [[ivfPqAppend]]. */
  private def ivfPqEncode(vecs: DataFrame, coarse: Seq[(Long, Seq[Double])],
      books: Seq[Seq[Seq[Double]]], m: Int, sub: Int, residual: Boolean,
      idCol: String, vecCol: String): DataFrame = {
    def subv(v: Column, j: Int): Column = slice(v, j * sub + 1, sub)
    val assigned = vecs
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__cell", nearestCell(col("__v"), coarse))
    val enc = if (residual)
      assigned.withColumn("__v", zip_with(col("__v"),
        cellCentroid(coarse)(col("__cell")), (x, y) => x - y))
    else assigned
    enc.select(col("__cell") +: col(idCol).as("n_id") +:
      (0 until m).map(j =>
        nearestCellPos(subv(col("__v"), j), books(j)).as(s"__c$j")): _*)
  }

  /** Train + encode (the expensive, corpus-touching half): coarse
    * quantizer and all m PQ codebooks ([[pqBooks]], one pass per Lloyd
    * iteration — over residuals when `residual`, the IVFADC training
    * space), then ONE zero-join projection encodes the corpus.
    * Serve with [[ivfPqSearch]] — once per batch query set, or per
    * micro-batch on a stream (the index is static state, shared by
    * every batch; see graft.stream.StreamingAnn). Grow it with
    * [[ivfPqAppend]] — frozen books, per-row encoding. `coarse0`
    * supplies an already-trained coarse quantizer (e.g. when building
    * raw and residual variants over one corpus — [[ivfPqRecall]] —
    * the coarse trajectory is identical and trains once). */
  def ivfPqIndex(corpus: DataFrame, kCells: Int, m: Int, kCodes: Int,
      iters: Int, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding", residual: Boolean = false,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      coarse0: Option[Seq[(Long, Seq[Double])]] = None)
      : IvfPqIndex = {
    require(m > 0 && dim % m == 0, s"ivfPqIndex: dim=$dim not divisible by m=$m")
    require(kCells > 0 && kCodes > 0 && iters > 0,
      s"ivfPqIndex: kCells=$kCells, kCodes=$kCodes, iters=$iters")
    val sub = dim / m
    val src = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val coarse = coarse0.getOrElse(
      kmeansCentroids(corpus, kCells, iters, idCol, vecCol))
    // PQ training space: raw vectors, or residuals against the trained
    // coarse centroids (assignment + subtraction are literal
    // projections — zero-join). The residual TRAINING set is
    // materialized once (default localCheckpoint): pqBooks scans it
    // 1 + (iters−1) times, and re-deriving the argmin+subtract tree in
    // every pass bloats codegen for no reuse. At 100 TB the training
    // set is a sample anyway (the standard PQ practice — books need
    // ~100k vectors, not the corpus), so the materialization is
    // sample-sized; ENCODING still derives residuals in one fused
    // corpus pass ([[ivfPqEncode]]), never materialized. */
    val trainSrc = if (residual)
      materialize(src.select(col(idCol), zip_with(col("__v"),
        cellCentroid(coarse)(nearestCell(col("__v"), coarse)),
        (x, y) => x - y).as("__v")))
    else src
    val books: Seq[Seq[Seq[Double]]] =
      pqBooks(trainSrc, idCol, m, sub, kCodes, iters).map(_.map(_._2))
    IvfPqIndex(
      ivfPqEncode(corpus, coarse, books, m, sub, residual, idCol, vecCol),
      coarse, books, m, sub, residual)
  }

  /** Append a new-vector batch to an existing index under FROZEN
    * codebooks — the serving-side analog of incremental LSH candidate
    * maintenance: the corpus is never re-encoded, the batch is one
    * zero-join projection, and the result is bit-identical to encoding
    * the unioned corpus against the same books (encoding is per-row;
    * asserted in AnnSpec). Re-train ([[ivfPqIndex]]) only when drift
    * degrades recall — the standard IVF serving policy. */
  def ivfPqAppend(index: IvfPqIndex, newBatch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfPqIndex =
    index.copy(codes = index.codes.unionByName(ivfPqEncode(newBatch,
      index.coarse, index.books, index.m, index.sub, index.residual,
      idCol, vecCol)))

  /** Probe + ADC-score a query set against a prepared [[IvfPqIndex]]
    * (the serve-many half — touches nprobe/kCells of the code table,
    * never the raw corpus). Same plan shape and determinism contract as
    * [[ivfPqTopK]]; for a residual index the ADC tables are built from
    * the per-probed-cell query residual (queries×nprobe broadcast rows,
    * each with its own m tables). */
  def ivfPqSearch(index: IvfPqIndex, queries: DataFrame, nprobe: Int,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    require(k > 0 && nprobe > 0, s"ivfPqSearch: k=$k, nprobe=$nprobe")
    val IvfPqIndex(codes, coarse, books, m, sub, residual) = index
    def subv(v: Column, j: Int): Column = slice(v, j * sub + 1, sub)
    // top-nprobe coarse cells by (snapped L2, cell): a literal
    // struct-array sort on the query side — no centroid join
    val probeCells = slice(array_sort(array(coarse.map { case (cell, c) =>
      struct(snappedD2(col("__qv"), c).as("d"), lit(cell).as("cell"))
    }: _*)), 1, nprobe)
    // per (query, probed cell): the ADC vector is the query itself
    // (raw books) or the query's residual against THAT cell's centroid
    // (IVFADC) — either way the tables are built on the broadcast side
    val probed = queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("__qv"))
      .select(col("q_id"), explode(probeCells).as("__pc"), col("__qv"))
      .select(col("q_id"), col("__pc").getField("cell").as("__cell"),
        col("__qv"))
    val adcVec = if (residual)
      probed.withColumn("__qv", zip_with(col("__qv"),
        cellCentroid(coarse)(col("__cell")), (x, y) => x - y))
    else probed
    val q = broadcast(adcVec
      .select(col("q_id") +: col("__cell") +:
        (0 until m).map(j =>
          array(books(j).map(c => snappedD2(subv(col("__qv"), j), c)): _*)
            .as(s"__dt$j")): _*))
    val scored = codes.join(q, Seq("__cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(j => element_at(col(s"__dt$j"), col(s"__c$j")))
          .reduce(_ + _).as("__s"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("__s").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("__s").cast("double") / lit(1e6), 4).as("adc"))
  }

  /** Balanced-energy coordinate permutation — a cheap OPQ variant
    * (Ge et al., "Optimized Product Quantization for Approximate
    * Nearest Neighbor Search", CVPR 2013: their eigenvalue-allocation
    * initialization, approximated with per-dimension residual ENERGY
    * instead of PCA eigenvalues, and restricted to a PERMUTATION
    * instead of a rotation so encode/search stay zero-join literal
    * projections): rank dimensions by residual second moment (Σx²,
    * 1e9-snapped — exact and order-free), then deal them to the m
    * subspaces in boustrophedon (snake) order, so every subspace
    * receives an equal share of high- and low-energy coordinates. PQ
    * quantization error concentrates in whichever subspace carries
    * outsized energy; balancing it is the recall lever at fixed
    * m/kCodes (q191 measures the win against the unpermuted residual
    * index on identical tiers).
    *
    * Scale shape: learning is ONE corpus pass (residualization is a
    * literal-map projection, the energy aggregation map-side-combines
    * to dim rows of driver state); applying it is a column reorder
    * fused into the encode projection — zero joins, zero shuffles.
    * Deterministic: snapped energies, ties to the lower dimension
    * index — the DuckDB oracle replays the exact permutation.
    * Returns perm with perm(p) = 0-based source index of permuted
    * position p, grouped subspace-major. */
  def opqPermutation(corpus: DataFrame, coarse: Seq[(Long, Seq[Double])],
      m: Int, idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Int] =
    snakeDeal(residualEnergies(corpus, coarse, vecCol), m)

  /** Per-dimension residual second moment (1e9-snapped Σx², exact and
    * order-free) — the energy profile [[opqPermutation]] balances. */
  private[graft] def residualEnergies(corpus: DataFrame,
      coarse: Seq[(Long, Seq[Double])], vecCol: String = "embedding")
      : Seq[(Int, Double)] = {
    import graft.expr.Snap
    val res = corpus.select(col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__cell", nearestCell(col("__v"), coarse))
      .select(zip_with(col("__v"), cellCentroid(coarse)(col("__cell")),
        (x, y) => x - y).as("__r"))
    res.select(posexplode(col("__r")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(Snap.snappedSum(col("x") * col("x"), 1e9).as("en"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
  }

  /** Snake-deal the dims ranked by (energy desc, dim asc) to m
    * subspaces — each consecutive rank-block of m lands in m distinct
    * subspaces, alternating direction so early blocks' within-block
    * spread cancels. Pure driver arithmetic, exposed for spec pins. */
  private[graft] def snakeDeal(en: Seq[(Int, Double)], m: Int): Seq[Int] = {
    require(m > 0, s"snakeDeal: m=$m")
    val ranked = en.sortBy { case (pos, e) => (-e, pos) }.map(_._1)
    val bySub = Array.fill(m)(Vector.empty[Int])
    for ((pos, r) <- ranked.zipWithIndex) {
      val w = r % m
      val j = if ((r / m) % 2 == 0) w else m - 1 - w
      bySub(j) = bySub(j) :+ pos
    }
    bySub.toSeq.flatten
  }

  /** Reorder an array column by `perm` (0-based source indices) — the
    * zero-join application of [[opqPermutation]]. */
  def permuteVec(perm: Seq[Int], v: Column): Column =
    array(perm.map(i => element_at(v, i + 1)): _*)

  /** Residual IVF·PQ (IVFADC) trained in the PERMUTED coordinate
    * space — [[ivfPqIndex]] composed with [[opqPermutation]]: a global
    * coordinate permutation leaves every L2 distance, the coarse
    * geometry, and the residuals semantically unchanged; the ONLY
    * thing it moves is which coordinates land in which PQ subspace —
    * exactly the OPQ degree of freedom. The coarse quantizer is NOT
    * retrained: its centroids are permuted alongside the corpus
    * (`coarse0` supplies the shared raw-space trajectory). Search with
    * [[opqSearch]], which applies the same permutation to each query
    * batch. Returns (perm, index); all of [[ivfPqSearch]]'s serving
    * machinery (probe, per-cell residual ADC tables, append under
    * frozen books) works on the returned index unchanged. */
  def opqIvfPqIndex(corpus: DataFrame, kCells: Int, m: Int, kCodes: Int,
      iters: Int, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      coarse0: Option[Seq[(Long, Seq[Double])]] = None)
      : (Seq[Int], IvfPqIndex) = {
    val coarse = coarse0.getOrElse(
      kmeansCentroids(corpus, kCells, iters, idCol, vecCol))
    val perm = opqPermutation(corpus, coarse, m, idCol, vecCol)
    val pCorpus = corpus.select(col(idCol),
      permuteVec(perm, col(vecCol).cast("array<double>")).as(vecCol))
    val pCoarse = coarse.map { case (id, c) => (id, perm.map(c)) }
    (perm, ivfPqIndex(pCorpus, kCells, m, kCodes, iters, dim, idCol,
      vecCol, residual = true, materialize, Some(pCoarse)))
  }

  /** Serve an [[opqIvfPqIndex]]: permute the query batch into the
    * index's coordinate space, then the standard IVFADC probe+ADC
    * ([[ivfPqSearch]]) — same plan shape, same determinism contract. */
  def opqSearch(index: IvfPqIndex, perm: Seq[Int], queries: DataFrame,
      nprobe: Int, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfPqSearch(index, queries.select(col(idCol),
      permuteVec(perm, col(vecCol).cast("array<double>")).as(vecCol)),
      nprobe, k, idCol, vecCol)

  /** Grow an [[opqIvfPqIndex]] under frozen books AND frozen
    * permutation: permute the batch into the index's coordinate space,
    * then [[ivfPqAppend]]. (Appending an UN-permuted batch to a
    * permuted index would silently encode garbage — this is the only
    * correct append for an OPQ index, spec-pinned ≡ a full re-encode.) */
  def opqAppend(index: IvfPqIndex, perm: Seq[Int], newBatch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfPqIndex =
    ivfPqAppend(index, newBatch.select(col(idCol),
      permuteVec(perm, col(vecCol).cast("array<double>")).as(vecCol)),
      idCol, vecCol)

  /** End-to-end trained IVF: Lloyd codebook → joinless literal-argmin
    * cell assignment over the corpus → probed exact search
    * ([[ivfTopK]]). The full production ANN path in one call — train,
    * index, search — with every stage's scale shape unchanged: the
    * corpus is never joined for assignment (centroids are plan
    * literals) and search touches only the probed cells. */
  def ivfTrainedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      kCells: Int, iters: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      coarse0: Option[Seq[(Long, Seq[Double])]] = None): DataFrame = {
    val cents = coarse0.getOrElse(
      kmeansCentroids(corpus, kCells, iters, idCol, vecCol))
    val assigned = corpus.withColumn("__cell",
      nearestCell(col(vecCol).cast("array<double>"), cents))
    ivfTopK(assigned, queries, "__cell", k, idCol, vecCol, nprobe)
  }

  /** IVF-style ANN: centroids from a coarse partitioner column (here: any
    * assignment, e.g. a precomputed cluster label); each query probes its
    * `nprobe` nearest centroids' partitions. Returns top-k within the
    * probed cells. The recall/cost knob: cost scales with
    * nprobe/numCells of a full scan; nprobe = numCells degenerates to
    * exact search (asserted in AnnSpec). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cellCol: String, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nprobe: Int = 1): DataFrame = {
    // centroids: elementwise mean per cell, via posexplode + re-assemble
    val centroids = corpus
      .select(col(cellCol).as("cell"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), x => x.getField("m")).as("centroid"))
    // each query probes its nearest centroid
    val qc = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
      .crossJoin(broadcast(centroids))
      .withColumn("d", Similarity.l2Distance(col("q_vec"), col("centroid")))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("d").asc, col("cell").asc)
    val probe = qc
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    // score only within the probed cell
    val scored = corpus.select(col(cellCol).as("cell"), col(idCol), col(vecCol))
      .join(broadcast(probe), Seq("cell"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("n_id"),
        round(Similarity.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Centroid-based (simplified) silhouette per cluster — the clustering
    * quality eval of an embedding pipeline (is this labeling/k worth
    * keeping? is cluster drift degrading the IVF index?): per vector,
    * a = squared distance to its OWN label centroid, b = min over OTHER
    * centroids; s = (√b − √a) / max(√a, √b) ∈ [−1, 1], averaged per
    * label. The centroid-based form (Ward-style) replaces the classic
    * all-pairs a/b with centroid distances — O(n·k) instead of O(n²),
    * the only silhouette that exists at 100 TB.
    *
    * Scale shape: centroids are one map-side-combined (label, dim)
    * aggregation (k×dim rows, broadcast); distances are one exploded
    * join on `dim` grouped per (vector, centroid) — n·k rows, never
    * n². Determinism (the kmeans/entropy contract): centroids snap to
    * the 1e-6 grid, per-dim squared terms to 1e-12 summed as decimals,
    * per-vector s to 1e-9 summed as decimals — bit-identical in any
    * engine regardless of partitioning or summation order. Vectors
    * whose corpus has a single label have no `b` and are absent.
    *
    * Domain ([[graft.expr.Snap]] bound on the 1e12 grid): per-dim
    * deviation |x − centroid| must stay under ~3e3 — any normalized or
    * unit-scale embedding qualifies; renormalize unbounded features
    * first. */
  def silhouette(corpus: DataFrame, labelCol: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val x = corpus.select(col(idCol).as("__id"), col(labelCol).as("label"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
    val cent = x.groupBy(col("label").as("clabel"), col("pos"))
      .agg(r6(avg(col("x"))).as("m"))
    val d2 = x.join(broadcast(cent), Seq("pos"))
      .groupBy(col("__id"), col("label"), col("clabel"))
      .agg(graft.expr.Snap.snappedSum(
        (col("x") - col("m")) * (col("x") - col("m")), 1e12).as("d2"))
    val ab = d2.groupBy(col("__id"), col("label"))
      .agg(min(when(col("clabel") === col("label"), col("d2"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("d2"))).as("b"))
      .filter(col("b").isNotNull)
    val s = ab.select(col("label"),
      ((sqrt(col("b")) - sqrt(col("a"))) /
        greatest(sqrt(col("a")), sqrt(col("b")))).as("s"))
    s.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        round(graft.expr.Snap.snappedSum(col("s"), 1e9) /
          count(lit(1)).cast("double"), 4).as("silhouette"))
  }

  /** Scalar-quantization ANN (the FAISS ScalarQuantizer/SQ8 family —
    * the THIRD compression point next to PQ (q133/q135) and raw
    * brute force (q25)): each dimension is quantized independently to
    * an 8-bit code against per-dim CORPUS-trained bounds
    * (code = clamp(floor((x − min_d) / scale_d), 0, 255),
    * scale_d = (max_d − min_d)/255), and search decodes-at-score —
    * asymmetric L2 between the raw query and the reconstructed
    * midpoint min_d + (code + 0.5)·scale_d. SQ8 trades PQ's m-lookup
    * scoring for O(dim) decode arithmetic but keeps near-exact recall
    * (64 codes/vector = 8× smaller scan than float64 at 64-dim, with
    * per-dim error ≤ scale/2).
    *
    * Scale shape: bounds are ONE map-side-combined (pos → min/max)
    * aggregation collapsing to dim-sized driver state (the kmeans
    * pattern); encode and decode are zero-join literal-bounds
    * projections; scoring is the q25/q133 broadcast shape (queries
    * broadcast, corpus scores in place, WindowGroupLimit top-k).
    * Constant dims (scale 0) encode as 0 and reconstruct exactly.
    *
    * Determinism: bounds are exact data elements; encode/decode/score
    * are fixed-parenthesization IEEE arithmetic with the distance fold
    * left-to-right and 1e-6-snapped to a long (the [[snappedD2]]
    * contract) — bit-replayable in the oracle.
    * Returns (q_id, rank, n_id, d2) with d2 = snapped L2² / 1e6, 4 dp. */
  /** Per-dim corpus (min, scale) for SQ8: ONE map-side-combined
    * aggregation collapsing to dim-sized driver state. */
  private def sq8Bounds(src: DataFrame): (Seq[Double], Seq[Double]) = {
    val bounds = src.select(posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    (bounds.map(_._2).toSeq,
      bounds.map { case (_, mn, mx) =>
        if (mx > mn) (mx - mn) / 255d else 0d }.toSeq)
  }

  /** SQ8 encode: clamp(floor((x − min_d)/scale_d), 0, 255) per dim —
    * the stored 1-byte/dim form (int-typed here; tinyint at rest). */
  private def sq8Encode(mins: Seq[Double], scales: Seq[Double])(v: Column)
      : Column =
    transform(v, (x, i) =>
      when(element_at(typedLit(scales), i + 1) === 0d, lit(0))
        .otherwise(least(greatest(
          floor((x - element_at(typedLit(mins), i + 1)) /
            element_at(typedLit(scales), i + 1)), lit(0d)),
          lit(255d)).cast("int")))

  /** SQ8 decode-at-score reconstruction: min_d + (code + 0.5)·scale_d
    * (the midpoint; constant dims reconstruct exactly). */
  private def sq8Recon(mins: Seq[Double], scales: Seq[Double])(c: Column)
      : Column =
    transform(c, (x, i) =>
      when(element_at(typedLit(scales), i + 1) === 0d,
        element_at(typedLit(mins), i + 1))
        .otherwise(element_at(typedLit(mins), i + 1) +
          (x + lit(0.5d)) * element_at(typedLit(scales), i + 1)))

  /** Snapped-long asymmetric L2 between a reconstructed array and the
    * raw query — left-to-right fold, the [[snappedD2]] contract. */
  private def sq8Dist(recon: Column, qv: Column): Column =
    floor(aggregate(zip_with(recon, qv, (r, qx) => { val d = r - qx; d * d }),
      lit(0.0), (acc, x) => acc + x) * lit(1e6) + lit(0.5)).cast("long")

  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"sq8TopK: k=$k")
    val src = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val (mins, scales) = sq8Bounds(src)
    val codes = src.select(col(idCol).as("n_id"),
      sq8Encode(mins, scales)(col("__v")).as("__c"))
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("__qv")))
    val scored = codes.crossJoin(q).filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        sq8Dist(sq8Recon(mins, scales)(col("__c")), col("__qv")).as("__s"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("__s").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("__s").cast("double") / lit(1e6), 4).as("d2"))
  }

  /** IVF·SQ8 composed ANN (the FAISS "IVF…,SQ8" index family): the
    * trained coarse quantizer ([[kmeansCentroids]], the q76/q85
    * trajectory) prunes each query to its `nprobe` nearest cells by
    * snapped L2, and SQ8 decode-at-score ranks ONLY the probed cells'
    * codes — [[sq8TopK]]'s exhaustive scan becomes a cell equi-join,
    * exactly as [[ivfPqTopK]] does for PQ. Completes the ANN matrix:
    * {flat, SQ8, PQ} × {exhaustive, IVF-pruned}, every cell of which
    * is oracle-checked (q25/q145/q133 × q27·q85/q146/q135).
    *
    * Scale shape: the corpus is read ONCE into (cell, id, dim byte
    * codes) by a zero-join projection (coarse centroids and SQ bounds
    * are driver literals); the broadcast side is queries×nprobe rows;
    * scoring is a broadcast hash join on the cell key, O(dim) decode
    * arithmetic per candidate. SQ8 vs PQ inside the cells: 8× (not
    * 64×) compression but near-exact in-cell ranking — the
    * middle ground when recall matters more than scan size.
    *
    * Determinism: the coarse trajectory, probe ordering, bounds,
    * codes, and snapped distances are all the established contracts;
    * at nprobe = kCells the ranking is IDENTICAL to [[sq8TopK]]
    * (asserted in AnnSpec — same bounds, same codes, same ties). */
  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, kCells: Int,
      nprobe: Int, iters: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      coarse0: Option[Seq[(Long, Seq[Double])]] = None): DataFrame = {
    require(k > 0 && nprobe > 0 && kCells > 0 && iters > 0,
      s"ivfSq8TopK: k=$k, nprobe=$nprobe, kCells=$kCells, iters=$iters")
    val src = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val coarse = coarse0.getOrElse(
      kmeansCentroids(corpus, kCells, iters, idCol, vecCol))
    val (mins, scales) = sq8Bounds(src)
    val codes = src.select(nearestCell(col("__v"), coarse).as("__cell"),
      col(idCol).as("n_id"), sq8Encode(mins, scales)(col("__v")).as("__c"))
    val probeCells = slice(array_sort(array(coarse.map { case (cell, c) =>
      struct(snappedD2(col("__qv"), c).as("d"), lit(cell).as("cell"))
    }: _*)), 1, nprobe)
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("__qv"))
      .select(col("q_id"), explode(probeCells).as("__pc"), col("__qv"))
      .select(col("q_id"), col("__pc").getField("cell").as("__cell"),
        col("__qv")))
    val scored = codes.join(q, Seq("__cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        sq8Dist(sq8Recon(mins, scales)(col("__c")), col("__qv")).as("__s"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("__s").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("__s").cast("double") / lit(1e6), 4).as("d2"))
  }

  /** IVFADC with re-ranking (Jégou et al., TPAMI 2011 §V — the "IVFADC+R"
    * refinement): the PQ shortlist (top-`shortlist` by ADC within the
    * probed cells) is re-scored with EXACT cosine against the raw
    * vectors, and the top-`k` of the re-scored shortlist is served.
    * This is the standard two-stage serving shape: the cheap quantized
    * stage bounds how much of the corpus is touched, and the exact
    * stage bounds the quantization error's effect on the final ranking
    * — recall@k approaches the probed-cell exact search as `shortlist`
    * grows (AnnSpec: shortlist = |corpus| reproduces q25's ranking
    * restricted to the probed cells).
    *
    * Scale shape: stage 1 is the [[ivfPqSearch]] contract (cell-keyed
    * broadcast hash join over the code table). Stage 2 joins the
    * shortlist — |Q|×shortlist rows, NOT corpus-sized — back to the
    * raw vectors by vector id (at 100 TB: a point-lookup join against
    * the vector store, shortlist-sized I/O per query) and re-ranks with
    * the q25 6-dp cosine contract. The corpus is never scanned raw;
    * only shortlist rows fetch their vectors. */
  def ivfPqRerank(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
      nprobe: Int, shortlist: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k && k > 0,
      s"ivfPqRerank: shortlist=$shortlist must be ≥ k=$k > 0")
    val short = ivfPqSearch(index, queries, nprobe, shortlist, idCol, vecCol)
      .select(col("q_id"), col("n_id"))
    val vecs = corpus.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("__nv"))
    val qv = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("__qv")))
    val scored = short.join(vecs, Seq("n_id")).join(qv, Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(Similarity.cosine(col("__nv"), col("__qv")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** IVF·PQ recall eval, hash-checked: overlap@k of [[ivfPqTopK]]
    * (BOTH encodings — raw IVF-Flat-style PQ and residual IVFADC)
    * against the exact brute-force cosine ranking, per nprobe tier —
    * the (recall, cost) operating curve that picks production nprobe,
    * and the oracle-checked form of the residual-beats-raw claim.
    * Emits (q_id, variant ∈ {raw, residual}, nprobe, n_overlap, recall).
    *
    * Scale shape: ONE exact baseline pass (materialized — default
    * localCheckpoint — so the |variants|×|nprobes| overlap branches
    * read it, not recompute it), one training + encode per variant
    * (codes materialized once, searched |nprobes| times), and each
    * search is the [[ivfPqSearch]] contract: probed-cell equi-join,
    * broadcast query tables. Overlap joins run on k×|Q| rows per
    * branch. Determinism: both rankings are the q25/q135 contracts, so
    * overlap counting is exact set intersection. */
  def ivfPqRecall(corpus: DataFrame, queries: DataFrame, kCells: Int,
      nprobes: Seq[Int], m: Int, kCodes: Int, iters: Int, k: Int,
      dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      coarse0: Option[Seq[(Long, Seq[Double])]] = None,
      exact0: Option[DataFrame] = None,
      residualIdx0: Option[IvfPqIndex] = None)
      : DataFrame = {
    require(nprobes.nonEmpty && k > 0, s"ivfPqRecall: nprobes=$nprobes, k=$k")
    require(residualIdx0.forall(i => i.residual && i.m == m),
      "ivfPqRecall: residualIdx0 must be a residual index with matching m")
    // exact0/coarse0/residualIdx0: already-materialized session
    // artifacts (the q25 ranking, the q76-trajectory coarse quantizer,
    // the served q135 index) — evals reuse them instead of re-deriving;
    // the trajectory is a pure function of (corpus, params) either way.
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    // both variants share one coarse quantizer — the trajectory is a
    // pure function of (corpus, kCells, iters), so train it once
    val coarse = coarse0.getOrElse(
      kmeansCentroids(corpus, kCells, iters, idCol, vecCol))
    Seq(false, true).map { res =>
      val served = (if (res) residualIdx0 else None).getOrElse {
        val idx = ivfPqIndex(corpus, kCells, m, kCodes, iters, dim,
          idCol, vecCol, res, materialize, Some(coarse))
        idx.copy(codes = materialize(idx.codes))
      }
      nprobes.map { np =>
        val t = ivfPqSearch(served, queries, np, k, idCol, vecCol)
          .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
        exact.join(t, Seq("q_id", "n_id"), "left")
          .groupBy(col("q_id"))
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
          .select(col("q_id"),
            lit(if (res) "residual" else "raw").as("variant"),
            lit(np).cast("long").as("nprobe"), col("n_overlap"),
            round(col("n_overlap").cast("double") / lit(k.toDouble), 4)
              .as("recall"))
      }.reduce(_.unionByName(_))
    }.reduce(_.unionByName(_))
  }

  /** Index-staleness drift eval — the "when to re-train" diagnostic
    * behind [[ivfPqAppend]]'s frozen-book policy: recall@k of (a) an
    * index TRAINED on the base corpus only, grown to the full corpus by
    * frozen-book append, vs (b) an index re-trained on the full corpus
    * — both against the exact ranking over the full corpus. The recall
    * gap per query is the price of staleness at this batch fraction;
    * re-train when it crosses the serving budget. Emits
    * (q_id, variant ∈ {appended, retrained}, n_overlap, recall).
    *
    * Scale shape: one exact baseline pass (materialized); one training
    * per variant (the append variant trains on the BASE only — that is
    * the point); each search is the [[ivfPqSearch]] contract. The
    * appended index's codes are one extra zero-join batch projection
    * ([[ivfPqAppend]]); nothing re-encodes. */
  def ivfPqDriftEval(base: DataFrame, batch: DataFrame, queries: DataFrame,
      kCells: Int, nprobe: Int, m: Int, kCodes: Int, iters: Int, k: Int,
      dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      exact0: Option[DataFrame] = None,
      retrained0: Option[IvfPqIndex] = None)
      : DataFrame = {
    require(k > 0 && nprobe > 0, s"ivfPqDriftEval: k=$k, nprobe=$nprobe")
    require(retrained0.forall(i => i.residual && i.m == m),
      "ivfPqDriftEval: retrained0 must be a residual index with matching m")
    val full = base.unionByName(batch)
    // exact0/retrained0: already-materialized session artifacts — valid
    // whenever base ∪ batch is exactly the corpus those artifacts were
    // built on (training is a pure, snap-stable function of the row
    // multiset, so the union plan retrains to the identical index).
    val exact = exact0.getOrElse(
      materialize(bruteForceTopK(full, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    def serve(idx: IvfPqIndex) = idx.copy(codes = materialize(idx.codes))
    val variants = Seq(
      "appended" -> serve(ivfPqAppend(ivfPqIndex(base, kCells, m, kCodes,
        iters, dim, idCol, vecCol, residual = true, materialize), batch,
        idCol, vecCol)),
      "retrained" -> retrained0.getOrElse(
        serve(ivfPqIndex(full, kCells, m, kCodes, iters,
          dim, idCol, vecCol, residual = true, materialize))))
    variants.map { case (name, served) =>
      val t = ivfPqSearch(served, queries, nprobe, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(t, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .select(col("q_id"), lit(name).as("variant"), col("n_overlap"),
          round(col("n_overlap").cast("double") / lit(k.toDouble), 4)
            .as("recall"))
    }.reduce(_.unionByName(_))
  }

  /** Matryoshka/truncation retrieval eval: overlap@k of the brute-force
    * cosine top-k under PREFIX-truncated embeddings against the full-dim
    * ranking — the "how many dims can serving drop" measurement behind
    * MRL-style embeddings (each dim count is a candidate storage/compute
    * tier; recall@k vs the full ranking is the price). Emits one row per
    * (query, dim): (q_id, dim, n_overlap, recall).
    *
    * Scale shape: each tier is one [[bruteForceTopK]] pass (corpus
    * scores in place, queries broadcast, WindowGroupLimit top-k), and
    * the overlap join runs on k×|Q| rows per tier — the full-dim
    * baseline is materialized ONCE (default localCheckpoint, the
    * perplexityGate pattern), so corpus cost is |dims|+1 scans, pair
    * work is top-k-sized. Determinism: both rankings use the
    * 6-dp-rounded cosine with id tie-break (the q25 contract), so
    * overlap counting is exact set intersection. */
  def truncationEval(corpus: DataFrame, queries: DataFrame, dims: Seq[Int],
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      full0: Option[DataFrame] = None)
      : DataFrame = {
    require(dims.nonEmpty && k > 0, s"truncationEval: dims=$dims, k=$k")
    // full0: the already-materialized exact (q_id, n_id) ranking — the
    // session artifact every retrieval eval shares (see SparkEntry).
    val full = full0.getOrElse(
      materialize(bruteForceTopK(corpus, queries, k, idCol, vecCol)
        .select(col("q_id"), col("n_id"))))
    def tr(df: DataFrame, d: Int) = df.select(col(idCol),
      slice(col(vecCol), 1, d).as(vecCol))
    dims.map { d =>
      val t = bruteForceTopK(tr(corpus, d), tr(queries, d), k, idCol, vecCol)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      full.join(t, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .select(col("q_id"), lit(d).as("dim"), col("n_overlap"),
          round(col("n_overlap").cast("double") / lit(k.toDouble), 4)
            .as("recall"))
    }.reduce(_.unionByName(_))
  }

  /** Tail constants for [[rankBiasedOverlap]]: tails(m−1) =
    * Σ_{i=m..d} pᵢ/i with pᵢ the EXACT-decimal power p^i (0.9^i is
    * exact in base 10, so both engines start from identical doubles;
    * the division and sum are fixed-order IEEE ops). Exposed so the
    * oracle SQL embeds the very same doubles as literals. */
  private[graft] def rboTails(d: Int, p: Double): Seq[Double] = {
    val pows = (1 to d).scanLeft(BigDecimal(p.toString)) {
      (acc, _) => acc * BigDecimal(p.toString)
    }.take(d).map(_.toDouble) // pows(i-1) = p^i exactly in decimal
    (1 to d).map(m =>
      (m to d).foldLeft(0.0)((acc, i) => acc + pows(i - 1) / i))
  }

  /** Rank-biased overlap at depth `d` (Webber, Moffat & Zobel 2010):
    * how much do two top-k rankings AGREE, weighted toward the top —
    * the rank-sensitive companion to plain recall@k (q142's overlap
    * treats rank 1 and rank 10 alike; RBO discounts depth i by pⁱ).
    * Truncated prefix form: RBO@d = (1−p)/p · Σ_{i=1..d} pⁱ·|A_i∩B_i|/i
    * with A_i/B_i the depth-i prefixes. Each shared item contributes
    * the closed tail Σ_{i≥max(rankA,rankB)} pⁱ/i — a constant lookup,
    * so the whole measure is ONE equi-join on (q_id, n_id) plus a
    * snapped per-query sum: no per-depth pass, no window. Queries with
    * disjoint prefixes score 0 (never NULL — disagreement is an
    * answer). Returns one row per q_id in `a`: (q_id, n_shared, rbo),
    * 6 dp. */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, d: Int = 10,
      p: Double = 0.9): DataFrame = {
    import graft.expr.Snap
    require(d >= 1 && p > 0.0 && p < 1.0,
      s"rankBiasedOverlap: d=$d p=$p")
    val tails = rboTails(d, p)
    val ra = a.select(col("q_id"), col("n_id"),
      col("rank").cast("long").as("ra")).filter(col("ra") <= d)
    val rb = b.select(col("q_id"), col("n_id"),
      col("rank").cast("long").as("rb")).filter(col("rb") <= d)
    val m = ra.join(rb, Seq("q_id", "n_id"))
      .select(col("q_id"), greatest(col("ra"), col("rb")).as("m"))
    val per = m.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_shared"),
        Snap.snappedSum(element_at(array(tails.map(lit): _*),
          col("m").cast("int")), 1e9).as("s"))
    a.select(col("q_id")).distinct()
      .join(per, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(lit((1.0 - p) / p) * coalesce(col("s"), lit(0.0)), 6)
          .as("rbo"))
  }
}
