package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components — the transitive-closure stage the
  * reference's dedup story stops short of: MinHash/LSH candidate pairs
  * ([[TextDedup.lshCandidates]]) say "a looks like b", but removal needs
  * whole duplicate *clusters* (a~b, b~c ⇒ {a,b,c} is one group, keep one
  * member). No single join can compute that; it is a graph fixpoint.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC'14) — the
  * standard shuffle-based formulation that converges in O(log n) rounds
  * on any graph (vs O(diameter) for naive label propagation, which on a
  * 100 TB near-dup chain can be thousands of rounds). Each round is two
  * hash aggregations + two joins, all keyed on the node id, so every
  * stage reuses one partitioning; no driver-side data beyond the
  * convergence counter.
  *
  * Scale notes:
  * - each round's edge set is MATERIALIZED with truncated lineage
  *   (`localCheckpoint` by default). A plain `persist` is NOT enough:
  *   each star round references its input several times, so the nested
  *   logical plan doubles per round — exponential analyzer/optimizer
  *   blow-up long before any data moves. On a real cluster pass
  *   `materialize = df => df.checkpoint()` (with a reliable checkpoint
  *   dir) so round state also survives executor loss;
  * - convergence = edge multiset unchanged, checked via an order-free
  *   (sum-of-hash, count) checksum — one tiny aggregate per round, no
  *   `except` anti-join;
  * - output rows carry (node, component-min) only; group sizes and
  *   canonical-member flags are cheap follow-up aggregations.
  */
object Graph {

  /** Components of the undirected graph given by `edges(src, dst)`.
    * Returns (`node`, `comp`) for every node that appears in an edge,
    * where `comp` is the smallest node id in the component. Nodes
    * absent from `edges` (singletons) are absent from the result —
    * callers union them back with a left join + coalesce.
    *
    * Endgame cutoff: star rounds shrink the edge set geometrically, so
    * the last rounds of ANY run — 100 TB included — operate on a tiny
    * remainder. Each round already counts edges (the convergence
    * checksum); once the measured count is ≤ `localFinishEdges` the
    * fixpoint finishes with one in-memory union-find instead of paying
    * several more full scheduler rounds (2 shuffles + a materialization
    * each). The distributed rounds still do all volume work; the
    * default cutoff (1M edges ≈ 16 MB) is far below any executor heap.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 25,
      localFinishEdges: Long = 1L << 20,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical long-typed edge list, self-loops dropped
    var cur: DataFrame = materialize(edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter($"u" =!= $"v" && $"u".isNotNull && $"v".isNotNull)
      .distinct())
    var checksum = edgeChecksum(cur)

    var converged = checksum._2 == 0L // no edges: nothing to contract
    var iter = 0
    while (!converged && checksum._2 > localFinishEdges && iter < maxIter) {
      val next = materialize(smallStar(largeStar(cur)))
      val nextSum = edgeChecksum(next)
      converged = nextSum == checksum
      cur = next
      checksum = nextSum
      iter += 1
    }

    if (!converged && checksum._2 <= localFinishEdges)
      return localFinish(cur)

    require(converged, s"connectedComponents: no fixpoint after $maxIter " +
      "alternating star rounds — graph larger than 2^maxIter nodes?")

    // Fixpoint edge set is a union of stars rooted at each component's
    // minimum: comp(node) = min over {node} ∪ N(node).
    val sym = cur.union(cur.select($"v".as("u"), $"u".as("v")))
    val out = sym.groupBy($"u".as("node"))
      .agg(least(min($"v"), first($"u")).as("comp"))
    out
  }

  /** Union-find (path-halving + union-by-min) over a measured-small edge
    * remainder. Output contract identical to the distributed fixpoint:
    * (node, min-id-in-component) for every node present in `e`. */
  private def localFinish(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path-halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
      }
      x
    }
    // collect(), not toLocalIterator(): the remainder is measured ≤ the
    // cutoff (≤ ~16 MB), and toLocalIterator fetches partitions as one
    // sequential job EACH — dozens of scheduler round-trips for a
    // driver-sized edge set. One job, one fetch.
    e.select($"u", $"v").collect().foreach { r =>
      val (ru, rv) = (find(r.getLong(0)), find(r.getLong(1)))
      if (ru != rv) { // root at the smaller id: comp = component min
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    parent.keySet().forEach { n => out += ((n, find(n))) }
    // roots map to themselves and are nodes too
    val roots = out.iterator.map(_._2).toSet
    roots.foreach { r => out += ((r, r)) }
    spark.createDataset(out.distinct.toSeq).toDF("node", "comp")
  }

  /** (sum of per-edge hashes, edge count): order-free multiset identity. */
  private def edgeChecksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)),
      count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Large-star: every node connects its larger neighbors to the minimum
    * of its neighborhood (including itself). Keeps components intact,
    * strictly reduces large-id chains. */
  private def largeStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // one exchange: hash by u feeds BOTH the neighborhood-min aggregate
    // and the sym⋈mins join exchange-free (without it sym shuffles twice)
    val sym = e.union(e.select($"v".as("u"), $"u".as("v"))).repartition($"u")
    val mins = sym.groupBy("u").agg(least(min($"v"), first($"u")).as("m"))
    sym.join(mins, "u")
      .filter($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** Small-star: orient each edge (larger, smaller); every node connects
    * its smaller neighbors (and itself) to their minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // one exchange by a, reused by the aggregate and the join (as in
    // largeStar)
    val oriented = e.select(
      greatest($"u", $"v").as("a"), least($"u", $"v").as("b"))
      .repartition($"a")
    val mins = oriented.groupBy("a").agg(min($"b").as("m"))
    val relinked = oriented.join(mins, "a")
      .select($"b".as("u"), $"m".as("v"))
    val rootEdges = mins.select($"a".as("u"), $"m".as("v"))
    relinked.union(rootEdges)
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** PageRank over the directed graph `edges(src, dst)` — the importance
    * ranking for the co-occurrence / link graphs this library already
    * builds (duplicate clusters, part–supplier incidence, citation-style
    * doc links). Complements [[connectedComponents]]: CC says *which*
    * nodes belong together, PageRank says *which matter most*.
    *
    * Same iterative-ML-in-the-relational-engine shape as
    * [[Ann.kmeansLloyd]]: a driver loop of a fixed number of passes,
    * where each pass is join + one map-side-combinable aggregation, all
    * keyed on the node id (one partitioning reused; the rank table is
    * node-sized, never the edge multiset). No driver-side data at all —
    * ranks stay distributed, so node count can be billions.
    *
    * Determinism (oracle-replayable across engines, partitionings and
    * retries, the kmeans contract):
    * - per-edge contributions are snapped to the 1e-12 grid and summed
    *   as exact decimals — in-mass is order-independent;
    * - ranks snap to the 1e-6 grid each iteration, so no float drift
    *   compounds across iterations;
    * - teleport and damping constants enter as the same decimal
    *   literals the oracle SQL writes (0.15 / 0.85 — `1 - d` would be a
    *   DIFFERENT double than a parsed "0.15").
    *
    * Dangling nodes (no out-edges) keep the teleport term only; their
    * lost mass is not redistributed (the common simplification — ranks
    * then sum to < 1 in graphs with sinks). Nodes absent from `edges`
    * entirely are absent from the result. */
  def pagerank(edges: DataFrame, src: String, dst: String, iters: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    // out-degree is loop-invariant: bake it into the edge table ONCE
    // (window, not self-join — one pass, no duplicated distinct), so
    // each iteration pays one edge-sized join (ranks), nothing else.
    // ONE exchange for both the dedup and the degree: hash by src
    // satisfies the (src,dst)-dedup's clustered distribution (src ⊆
    // {src,dst}) and the window's, so aggregate and window both run
    // exchange-free on top of the explicit repartition — the naive
    // distinct-then-window form shuffles the edge multiset twice
    val e2 = materialize(edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src")))))
    val nodes = materialize(
      e2.select(col("src").as("id")).union(e2.select(col("dst"))).distinct())
    val n = nodes.count()
    def snap6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    var ranks = nodes.select(col("id"), snap6(lit(1.0) / lit(n.toDouble)).as("rank"))
    for (i <- 1 to iters) {
      val inMass = e2
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          (floor(col("rank") / col("outdeg") * lit(1e12) + lit(0.5)) / lit(1e12))
            .cast("decimal(28,14)").as("contrib"))
        .groupBy(col("id")).agg(sum(col("contrib")).as("mass"))
      val next = nodes.join(inMass, Seq("id"), "left")
        .select(col("id"), snap6(lit(0.15) / lit(n.toDouble) +
          lit(0.85) * coalesce(col("mass").cast("double"), lit(0.0))).as("rank"))
      // LAZY per-pass state (r14, the stationaryDistribution rule):
      // ranks is a LINEAR recurrence — referenced exactly once per
      // pass (the inMass join) — so the lineage grows by one
      // join+aggregate level per pass with no doubling, and the
      // per-pass checkpoint barrier (sequential jobs ≈ passes ×
      // scheduler latency) buys nothing at small iters. Every 8th
      // pass still runs through `materialize` (ADVICE r14): a LONG
      // trajectory would otherwise grow an unbounded lazy lineage and
      // pay optimizer time quadratic in passes — snapped values are
      // materialization-independent, so the barrier cadence cannot
      // change a bit, only bound plan depth. Call sites run iters = 2
      // and so never hit the barrier.
      ranks = if (i % 8 == 0 && i < iters) materialize(next) else next
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999, "Authoritative sources
    * in a hyperlinked environment") — the DIRECTED prestige pair
    * PageRank's single score conflates: a hub points at good
    * authorities, an authority is pointed at by good hubs. Fixed
    * `iters` unrolled mutual-recursion rounds from h = 1 (the q201/
    * pagerank trajectory contract), each score L1-normalized on the
    * 1e9-snapped sum and 6-dp-snapped between passes, so the
    * trajectory replays exactly in any engine. Nodes with no in-edges
    * (resp. out-edges) carry authority (resp. hub) exactly 0.
    *
    * Scale shape: per round one edge-sized join per direction into a
    * map-side-combined node aggregation. Unlike [[pagerank]] (lazy
    * linear recurrence), snapped state IS materialized between passes
    * here — each score is referenced twice (next round + the final
    * h⋈a), so the lazy chain doubles per round and measured WORSE
    * (r14); the last pass stays lazy. Returns (id, hub, authority). */
  def hits(edges: DataFrame, src: String, dst: String, iters: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    require(iters >= 1, s"hits: iters=$iters")
    // e and nodes are ALWAYS materialized (independent of the caller's
    // per-iteration policy): the deduped edge set feeds 2·iters joins
    // and must be scanned + distinct'd exactly once — the q21/q25
    // session-artifact pattern (VERDICT r11 #3)
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct()
      .localCheckpoint(eager = true)
    val nodes =
      e.select(col("src").as("id")).union(e.select(col("dst"))).distinct()
        .localCheckpoint(eager = true)
    def snap6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    // raw scores L1-normalize on the snapped total; an all-zero side
    // (structurally impossible on a nonempty edge set, but the guard
    // keeps the library honest) yields zeros, never NULL/Inf
    def norm(raw: DataFrame, out: String): DataFrame = {
      val z = raw.agg(Snap.snappedSum(col("s"), 1e9).as("z"))
      nodes.join(raw, Seq("id"), "left").crossJoin(broadcast(z))
        .select(col("id"), snap6(when(col("z") > 0.0,
          coalesce(col("s"), lit(0.0)) / col("z")).otherwise(lit(0.0)))
          .as(out))
    }
    var h = nodes.select(col("id"), lit(1.0).as("hub"))
    var a = nodes.select(col("id"), lit(0.0).as("authority"))
    for (i <- 1 to iters) {
      // Measured r14: the LAZY variant (the stationaryDistribution
      // rule) does NOT help here — each score is referenced twice
      // (next round + the final h⋈a), so the doubled post-exchange
      // aggregations re-run (ReuseExchange dedupes only the exchange
      // builds), job count stays 18 (AQE submits per-stage jobs
      // either way) and warm wall read 2.9–3.1 s vs 2.7–2.8 s
      // checkpointed. Keep the per-round barriers.
      a = materialize(norm(
        e.join(h.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(Snap.snappedSum(col("hub"), 1e9).as("s")), "authority"))
      val hNext = norm(
        e.join(a.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id"))
          .agg(Snap.snappedSum(col("authority"), 1e9).as("s")), "hub")
      h = if (i < iters) materialize(hNext) else hNext
    }
    h.join(a, "id").select(col("id"), col("hub"), col("authority"))
  }

  /** Local clustering coefficient (Watts & Strogatz 1998) — per node,
    * what fraction of its neighbors' possible links exist:
    * C_v = triangles_v / (deg_v·(deg_v − 1)/2). The small-world /
    * community-tightness signal next to the raw triangle counts
    * (q94): a duplicate FAMILY's members sit near C = 1, chain
    * artifacts near 0. deg < 2 → NULL (no possible wedge, undefined —
    * never a fake 0). Reuses [[triangleCount]]'s O(E^1.5)
    * orientation machinery and one degree rollup; everything joins
    * node-keyed. Returns (node, degree, triangles, coef), 6 dp. */
  def clusteringCoefficient(edges: DataFrame, src: String, dst: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val e = materialize(edges.select(
        least(col(src), col(dst)).cast("long").as("lo"),
        greatest(col(src), col(dst)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    val deg = e.select(explode(array(col("lo"), col("hi"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = triangleCount(e, "lo", "hi", materialize)
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(when(col("degree") >= 2L,
          coalesce(col("triangles"), lit(0L)).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double") *
            lit(2.0)), 6).as("coef"))
  }

  /** Per-node triangle counts of the undirected graph `edges(src, dst)`
    * — the clustering-coefficient / community-density signal over the
    * co-occurrence graphs this library builds. Nodes in no triangle are
    * absent from the result.
    *
    * Algorithm: degree-oriented node-iterator (Suri & Vassilvitskii,
    * WWW'11 MapReduce formulation): orient every undirected edge from
    * its lower-degree endpoint to the higher (ties by id), then count
    * each triangle exactly once as fwd(a,b) ⋈ fwd(b,c) ⋈ fwd(a,c).
    * The orientation is the scale lever: forward out-degree is bounded
    * by O(√E) on any graph (arboricity bound), so the wedge join
    * enumerates O(E^1.5) candidates worst-case instead of Σdeg² — on a
    * skewed co-occurrence graph the difference is the hub node's
    * degree² (billions) vs its √E cap. Degrees are a node-sized
    * broadcast; the two joins are edge-keyed hash joins. */
  def triangleCount(edges: DataFrame, src: String, dst: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    // e feeds three consumers (two degree broadcast builds + the fwd
    // join input) and fwd three join roles — materialize both, or the
    // upstream edge derivation (often a heavy self-join) re-executes
    // per consumer and the O(E^1.5) story is off by a constant 3.
    // localCheckpoint (not persist): blocks self-release when the
    // result is collected; a CacheManager entry would leak for the
    // session's lifetime with no caller-side handle to drop it
    val e = materialize(edges.select(
        least(col(src), col(dst)).cast("long").as("lo"),
        greatest(col(src), col(dst)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    val deg = materialize(e.select(explode(array(col("lo"), col("hi"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d")))
    val fwdFirst = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("lo") < col("hi"))
    // fwd stays LAZY: its three join roles each re-run one broadcast
    // probe over the materialized e — edge-scan-cheap — and the
    // orientation joins remain visible in the caller's plan (the q94
    // plan contract asserts they broadcast, which an eager
    // materialization would bury)
    val fwd = e
      .join(broadcast(deg.select(col("n").as("lo"), col("d").as("d1"))), "lo")
      .join(broadcast(deg.select(col("n").as("hi"), col("d").as("d2"))), "hi")
      .select(when(fwdFirst, col("lo")).otherwise(col("hi")).as("u"),
        when(fwdFirst, col("hi")).otherwise(col("lo")).as("v"))
    val tri = fwd.select(col("u").as("a"), col("v").as("b"))
      .join(fwd.select(col("u").as("b"), col("v").as("c")), "b")
      .join(fwd.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"),
        "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Dedup-group assignment over candidate pairs: every document joined
    * with its duplicate-cluster id (`group_id` = smallest doc id in the
    * cluster), cluster size, and a `keep` flag marking the canonical
    * member. Documents with no near-duplicate form singleton groups. */
  /** Incremental connected-components maintenance — the dedup-index
    * analog of [[graft.ops.Ann]]'s frozen-book append: a NEW batch of
    * candidate edges updates an EXISTING labeling without re-running
    * the star fixpoint over the full edge history. Labels follow the
    * [[connectedComponents]] contract (comp = min node id in the
    * component); `labels` rows are (node, comp), `newEdges` the batch.
    *
    * Algorithm (contract-and-relabel): each batch endpoint maps through
    * the existing labeling (unlabeled endpoints stand for themselves),
    * giving a CONTRACTED graph whose nodes are old component ids and
    * new nodes; [[connectedComponents]] runs on that graph — bounded by
    * the BATCH size, never the corpus — and the resulting mapping
    * relabels only the components the batch touched. Exact: the
    * contracted minimum over {old component minima, new node ids} IS
    * the merged component's true minimum (old component ids are minima
    * by contract), so the result is identical to a full recompute over
    * history ∪ batch (GraphSpec pins this).
    *
    * Scale shape: two broadcast-or-hash joins keyed on the batch
    * endpoints, a batch-bounded CC fixpoint (which hits the union-find
    * endgame immediately for any sane batch), and ONE label-keyed join
    * to remap the big labeling — the only corpus-sized exchange. */
  def incrementalComponents(labels: DataFrame, newEdges: DataFrame,
      src: String, dst: String): DataFrame = {
    val l = labels.select(col("node").cast("long").as("node"),
      col("comp").cast("long").as("comp"))
    val e = newEdges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    val contracted = e
      .join(l.select(col("node").as("u"), col("comp").as("cu")), Seq("u"), "left")
      .join(l.select(col("node").as("v"), col("comp").as("cv")), Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("u"),
        coalesce(col("cv"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // (old label | new node) -> merged label, batch-touched entries only
    val m = connectedComponents(contracted, "u", "v")
      .select(col("node").as("old_comp"), col("comp").as("new_comp"))
    val remapped = l
      .join(m.withColumnRenamed("old_comp", "comp"), Seq("comp"), "left")
      .select(col("node"), coalesce(col("new_comp"), col("comp")).as("comp"))
    // batch endpoints the existing labeling has never seen
    val newNodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
      .join(l.select(col("node")), Seq("node"), "left_anti")
    remapped.union(newNodes
      .join(m.withColumnRenamed("old_comp", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("new_comp"), col("node")).as("comp")))
  }

  def dedupGroups(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val labeled = docs.select(col(idCol))
      .join(comps.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).cast("long").as("group_id"))
    // sizes via window, not groupBy+self-join: one shuffle on group_id
    // and a single pass over `labeled` (the join form re-evaluates the
    // whole docs⋈comps sub-DAG for its second consumer)
    val byGroup = org.apache.spark.sql.expressions.Window.partitionBy("group_id")
    labeled
      .withColumn("group_size", count(lit(1)).over(byGroup))
      .select(col(idCol), col("group_id"), col("group_size"),
        (col(idCol) === col("group_id")).as("keep"))
  }

  /** Dedup-chain audit: connected-component dedup groups merge
    * TRANSITIVELY — A~B and B~C put A and C in one group even when
    * jaccard(A, C) is low (the chaining failure of LSH dedup, which
    * silently deletes non-duplicates once a `keep`-only policy applies).
    * Per group with at least one candidate edge: edge count, the
    * weakest and mean exact Jaccard over its edges, and a `chained`
    * flag when the weakest edge sits below `minJaccard` — the groups a
    * pipeline should split or re-verify before dropping members.
    *
    * Deterministic: min is exact on the 4-dp jaccard; the mean uses the
    * snapped-decimal sum. Scale shape: `pairs` is LSH-candidate-sized,
    * `groups` doc-sized; one join keyed by doc id, one group-keyed
    * rollup — the corpus text is never touched. */
  def dedupChainAudit(groups: DataFrame, pairs: DataFrame,
      minJaccard: Double): DataFrame = {
    val g = groups.select(col("doc_id"), col("group_id"), col("group_size"))
    pairs.join(g, pairs("doc_a") === g("doc_id"))
      .groupBy(col("group_id"), col("group_size"))
      .agg(count(lit(1)).as("n_edges"),
        min(col("jaccard")).as("min_jaccard"),
        round(graft.expr.Snap.snappedSum(col("jaccard"), 1e9) /
          count(lit(1)).cast("double"), 4).as("avg_jaccard"))
      .select(col("group_id"), col("group_size"), col("n_edges"),
        col("min_jaccard"), col("avg_jaccard"),
        (col("min_jaccard") < lit(minJaccard)).as("chained"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    * hard-label variant) over an UNDIRECTED view of `edges`: seeds keep
    * their label forever (round 0); each round, every still-unlabeled
    * node adjacent to ≥1 labeled node takes the MAJORITY label of its
    * labeled neighbors (ties: smaller label — the engine's standard
    * lexicographic-struct argmax). Nodes never reached stay absent.
    * The cheap way to stretch a small set of human/classifier labels
    * across a near-duplicate or kNN graph of the whole corpus.
    *
    * Deterministic: majority counts are exact integers; the tie-break
    * totally orders candidates; rounds are a fixed unrolled count — an
    * oracle replays the trajectory as unrolled SQL.
    *
    * Scale shape: per round, ONE edge-sized hash join against the
    * label table (key: dst), a left_anti to restrict to the frontier,
    * and two node-keyed aggregations — no global structure, no
    * iteration-over-collect. The label table is materialized each
    * round so round r+1 never recomputes rounds 1..r ([[pagerank]]'s
    * per-iteration contract). Rounds are bounded (diffusion depth is
    * a curation knob, not a convergence loop). Returns
    * (id, label, round). */
  def labelProp(edges: DataFrame, src: String, dst: String,
      seeds: DataFrame, idCol: String, labelCol: String, rounds: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(rounds >= 0, s"labelProp: rounds=$rounds")
    val und = materialize(edges
      .select(col(src).as("src"), col(dst).as("dst"))
      .unionByName(edges.select(col(dst).as("src"), col(src).as("dst")))
      .distinct())
    var lab = materialize(seeds.select(col(idCol).as("id"),
      col(labelCol).as("label"), lit(0L).as("round")))
    for (r <- 1 to rounds) {
      val newly = und
        .join(lab.select(col("id").as("dst"), col("label")), "dst")
        .join(lab.select(col("id").as("src")), Seq("src"), "left_anti")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("src"))
        .agg(min(struct((-col("n")).as("nn"), col("label"))).as("b"))
        .select(col("src").as("id"), col("b.label").as("label"),
          lit(r.toLong).as("round"))
      lab = materialize(lab.unionByName(newly))
    }
    lab
  }

  /** k-core peeling (Seidman 1983) over an undirected simple graph, run
    * a FIXED number of synchronous rounds — the q201 unrolled-
    * trajectory contract: a round recomputes every vertex's degree and
    * drops all sub-k vertices AT ONCE with their incident edges, so
    * the trajectory (hence the oracle's unrolled replay) is
    * deterministic, unlike the sequential peel whose order is
    * implementation-defined. The k-core reads dedup-candidate graphs
    * the way connected components can't: a CC merges a CHAIN of
    * borderline pairs into one group, while the 2-core keeps only
    * vertices with ≥ 2 surviving neighbors — the dense clique-ish
    * duplicate clusters worth human review vs. transitive accidents.
    *
    * Scale shape: edges canonicalize+dedup in one distinct pass; each
    * round is one map-side-combined degree aggregation + two left-semi
    * joins, all keyed by vertex id — rounds·3 bounded shuffles over a
    * monotonically SHRINKING edge set, re-materialized per round
    * (truncated lineage, the labelProp contract). Fixpoint typically
    * lands in a few rounds; `converged` reports min(final degree) ≥ k
    * so a non-converged run is visible, not silent. Returns survivors:
    * (node, degree, converged). */
  def kCore(edges: DataFrame, src: String, dst: String, k: Int,
      rounds: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(k >= 1, s"kCore: k=$k")
    require(rounds >= 1, s"kCore: rounds=$rounds")
    var e = materialize(edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    def degrees(d: DataFrame): DataFrame = d
      .select(col("a").as("node"))
      .unionByName(d.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    for (_ <- 1 to rounds) {
      val surv = degrees(e).filter(col("degree") >= k).select(col("node"))
      e = materialize(e
        .join(surv.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(surv.select(col("node").as("b")), Seq("b"), "left_semi"))
    }
    val degF = degrees(e)
    val conv = degF.agg(
      coalesce(min(col("degree")) >= k, lit(true)).as("converged"))
    degF.crossJoin(broadcast(conv))
  }

  /** Duplicate-family size spectrum + Hill tail-index fit (Hill 1975;
    * methodology caveats per Clauset, Shalizi & Newman 2009 §3): the
    * histogram of [[dedupGroups]] component sizes for sizes ≥ 2, and
    * α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the k largest families —
    * the heaviness of the duplication tail. α near 1–2 means a few
    * mega-families dominate the removable mass (dedup pays off
    * immediately); α large means duplication is diffuse. The
    * spectrum's planning twin is q265's token-count Good–Turing.
    *
    * Determinism: family sizes are exact longs; the k+1 order
    * statistics come off a TakeOrderedAndProject ((size desc, id
    * asc) — ties at the boundary don't move α because only VALUES
    * enter the ratio); ln-ratio terms snap at 1e9. Fewer than k+2
    * families, or a boundary at size ≤ 0, or all-tied top (Σ = 0) →
    * NULL α. Returns the ≥2 spectrum rows (size, n_families) with
    * (k_used, x_boundary, alpha) riding every row.
    *
    * Scale shape: sizes are [[dedupGroups]]'s group table; the
    * spectrum is a value-grid rollup; the fit reads k+1 rows. */
  def familySizeTail(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, k: Int = 20): DataFrame = {
    import graft.expr.Snap
    require(k >= 2, s"familySizeTail: k=$k")
    val sizes = dedupGroups(docs, idCol, pairs, aCol, bCol)
      .select(col("group_id"), col("group_size")).distinct()
    val spectrum = sizes.filter(col("group_size") >= 2L)
      .groupBy(col("group_size").as("size"))
      .agg(count(lit(1)).as("n_families"))
    val top = sizes.orderBy(col("group_size").desc, col("group_id"))
      .limit(k + 1)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("group_size").desc, col("group_id"))))
    val thr = top.filter(col("rn") === k + 1)
      .select(col("group_size").as("x_boundary"))
    val fit = top.filter(col("rn") <= k).crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("k_used"), max(col("x_boundary")).as("xb"),
        Snap.snappedSum(log(col("group_size").cast("double") /
          col("x_boundary").cast("double")), 1e9).as("slog"))
    val ok = col("k_used") === k.toLong && col("xb") > 0L &&
      col("slog") > 0.0
    val fitRow = fit.select(col("k_used"), col("xb").as("x_boundary"),
      round(when(ok, col("k_used").cast("double") / col("slog")), 6)
        .as("alpha"))
    spectrum.crossJoin(broadcast(fitRow))
  }

  /** Degree assortativity coefficient (Newman 2002, "Assortative
    * mixing in networks"): the Pearson correlation of endpoint
    * degrees over all DIRECTED edge endpoints — do hubs link to hubs
    * (r > 0, social-graph shape) or to leaves (r < 0, web/biology
    * shape)? The one-number structural fingerprint next to the
    * per-node family (q93/q277/q278/q253): a near-dup FAMILY mesh is
    * assortative, a template-spine-with-variants is disassortative.
    *
    * Exactness: degrees are exact longs; each undirected edge
    * contributes both orientations; Σx, Σxy, Σx² accumulate as EXACT
    * DECIMAL sums of integer products (DECIMAL(18)×DECIMAL(18) — the
    * q283 width rule); r is one fixed IEEE composition of those
    * integers. Zero degree variance → NULL (undefined, never NaN).
    *
    * Scale shape: one degree rollup (node-keyed), one edge-sized
    * broadcast-degree join, one map-side-combined moment pass; no
    * window. Returns one row: (n_nodes, n_pairs, r_assortativity). */
  def assortativity(edges: DataFrame, src: String, dst: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val e0 = edges.select(least(col(src), col(dst)).cast("long").as("u"),
        greatest(col(src), col(dst)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val e = materialize(e0.unionByName(
      e0.select(col("v").as("u"), col("u").as("v"))))
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
    val pairs = e
      .join(deg.select(col("node").as("u"), col("d").as("x")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("y")), "v")
    def dsum(c: Column) = sum(c).cast("double")
    val m = pairs.agg(count(lit(1)).as("np"),
      dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
      dsum(col("x").cast("decimal(18,0)") * col("y").cast("decimal(18,0)"))
        .as("sxy"),
      dsum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
        .as("sxx"),
      dsum(col("y").cast("decimal(18,0)") * col("y").cast("decimal(18,0)"))
        .as("syy"))
    val nD = col("np").cast("double")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val vy = nD * col("syy") - col("sy") * col("sy")
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    m.crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), col("np").as("n_pairs"),
        round(when(vx > 0.0 && vy > 0.0, cov / sqrt(vx * vy)), 6)
          .as("r_assortativity"))
  }

  /** Approximate neighborhood function N(v, r) — how many nodes sit
    * within r hops of each node — via per-node HLL register vectors
    * merged along edges (ANF: Palmer, Gibbons & Faloutsos, KDD 2002;
    * the HyperLogLog form is Boldi & Vigna's HyperBall, 2011). THE
    * scale answer to reach/diameter questions: exact r-hop
    * neighborhoods are |V|·|N_r| blowups, while register states are
    * a CONSTANT ≤2^b rows per node and a round is one edge join —
    * the same sketch the q62/q68 family already certifies, pointed
    * at graph distance.
    *
    * Determinism: registers are exact integers (the [[Sketch
    * .hllRegisters]] md5 bucket + bin-length rank, byte-for-byte);
    * merges are elementwise integer max (order-free); estimates are
    * [[Sketch.hllEstimate]]'s all-dyadic arithmetic — reproducible to
    * the last bit, and n1_exact (deg+1) rides along as the built-in
    * accuracy readout at r = 1.
    *
    * Scale shape — PACKED state (round-12): registers live as ONE
    * m-byte array per node, not m rows. The row form fanned every
    * edge out ×m BEFORE the merge shuffle (edges·m rows per round);
    * packed, the edge join moves edges·1 rows and the native
    * [[graft.expr.catalyst.RegisterMaxAgg]] folds them map-side into
    * one m-byte buffer per (node, task) — a 64× shuffle-volume cut at
    * b = 6 with bit-identical register values and estimates. Returns
    * (node, n1_exact, est_1hop, est_2hop). */
  def neighborhoodFunction(edges: DataFrame, src: String, dst: String,
      b: Int = 6,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.catalyst.RegisterMaxAgg
    val m = 1 << b
    val bits = 32 - b
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val e0 = edges.select(least(col(src), col(dst)).cast("long").as("u"),
        greatest(col(src), col(dst)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val e = materialize(e0.unionByName(
      e0.select(col("v").as("u"), col("u").as("v"))))
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
    // packed seed: the node's own hllRegisters row written into its
    // bucket position — SAME md5 bucket/rho values as the row form
    val h = graft.expr.Similarity.md5PrefixLong(col("node").cast("string"), 8)
    val bucket = h.bitwiseAND(lit((1L << b) - 1))
    val w = shiftright(h, b)
    val rho = when(w > 0, lit(bits + 1) - length(bin(w)))
      .otherwise(lit(bits + 1))
    // LAZY per-round state (the stationaryDistribution discipline,
    // r14): state(r) is referenced twice per round (the edge join and
    // the union) so the logical plan doubles per round, but each state
    // ends in an aggregation over an exchange and ReuseExchange serves
    // both refs from one physical build; with r ≤ 2 rounds the depth
    // is a small constant. The former seed + per-round localCheckpoint
    // barriers (~15 of q304's 23 sequential jobs) disappear — register
    // values are exact integers, so materialization policy cannot
    // change a bit.
    var state = deg.select(col("node"),
      transform(sequence(lit(0), lit(m - 1)), j =>
        when(j.cast("long") === bucket, rho).otherwise(lit(0))
          .cast("byte")).as("regs"))
    // hllEstimate's exact arithmetic read off the packed array:
    // present register ⇔ value > 0 (rho ≥ 1 whenever a row existed)
    def estimate(st: DataFrame, out: String): DataFrame = {
      val present = filter(col("regs"), r => r > lit(0))
      val nBuckets = size(present)
      val sp = aggregate(present, lit(0.0),
        (acc, r) => acc + pow(lit(2.0), -r.cast("double")))
      val zeros = lit(m) - nBuckets
      val raw = lit(alpha * m * m) / (sp + zeros.cast("double"))
      st.select(col("node"),
        round(when(raw <= 2.5 * m && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
          .otherwise(raw), 3).as(out))
    }
    val ests = (1 to 2).map { r =>
      val merged = e.join(state, e("v") === state("node"))
        .select(e("u").as("node"), col("regs"))
        .unionByName(state.select(col("node"), col("regs")))
        .groupBy(col("node"))
        .agg(RegisterMaxAgg.registerMax(col("regs"), m).as("regs"))
      state = merged
      estimate(state, s"est_${r}hop")
    }
    deg.select(col("node"), (col("d") + lit(1L)).as("n1_exact"))
      .join(ests(0), "node").join(ests(1), "node")
  }

  /** Stationary distribution of the Markov chain defined by a weighted
    * transition-count table (power iteration — von Mises &
    * Pollaczek-Geiringer 1929; Kemeny & Snell 1960 ch. IV for the
    * chain reading): π such that π = πP, the LONG-RUN occupancy the
    * one-step transition matrix (q95) only hints at. Fixed `iters`
    * unrolled passes from uniform (the q93/q277 fixed-trajectory
    * contract), each pass 6-dp-snapped and L1-renormalized on the
    * snapped total — dangling states (no out-edges) shed mass to the
    * renormalizer rather than silently absorbing it. `tv_delta` (the
    * total-variation half-L1 between the last two iterates) rides
    * every row: a convergence READOUT, not a loop condition, so the
    * trajectory replays exactly in any engine.
    *
    * Scale shape: state-keyed joins only — per pass one |edges|-sized
    * join into a map-side-combined state aggregation; the state and
    * matrix frames materialize once. Returns (state, p_stationary,
    * tv_delta). */
  def stationaryDistribution(trans: DataFrame, src: Column, dst: Column,
      weight: Column, iters: Int = 3,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    require(iters >= 1, s"stationaryDistribution: iters=$iters")
    def snap6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val e = materialize(trans.select(src.cast("string").as("src"),
      dst.cast("string").as("dst"), weight.cast("long").as("n")))
    val rowTot = e.groupBy(col("src")).agg(sum(col("n")).as("rt"))
    val pMat = materialize(e.join(rowTot, "src")
      .select(col("src"), col("dst"),
        (col("n").cast("double") / col("rt").cast("double")).as("p")))
    val states = materialize(e.select(col("src").as("state"))
      .union(e.select(col("dst"))).distinct())
    val kCnt = states.agg(count(lit(1)).as("k"))
    var pi = materialize(states.crossJoin(broadcast(kCnt))
      .select(col("state"),
        snap6(lit(1.0) / col("k").cast("double")).as("pi")))
    var prev = pi
    for (_ <- 1 to iters) {
      prev = pi
      val raw = pi.join(pMat, pi("state") === pMat("src"))
        .groupBy(col("dst").as("state"))
        .agg(Snap.snappedSum(col("pi") * col("p"), 1e9).as("raw"))
      val z = raw.agg(Snap.snappedSum(col("raw"), 1e9).as("z"))
      // LAZY per-pass state (the HITS discipline): raw is referenced
      // twice (the z normalizer and the join-back) so the logical
      // plan doubles per pass, but ReuseExchange serves both refs
      // from one physical build and iters is a small constant — the
      // former per-pass localCheckpoint barrier (~12 sequential
      // jobs/pass, r14 probe) disappears.
      pi = states.join(raw, Seq("state"), "left")
        .crossJoin(broadcast(z))
        .select(col("state"), snap6(when(col("z") > 0.0,
          coalesce(col("raw"), lit(0.0)) / col("z")).otherwise(lit(0.0)))
          .as("pi"))
    }
    val tv = pi.join(prev.withColumnRenamed("pi", "pi0"), "state")
      .agg((Snap.snappedSum(abs(col("pi") - col("pi0")), 1e9) / lit(2.0))
        .as("tv"))
    pi.crossJoin(broadcast(tv))
      .select(col("state"), col("pi").as("p_stationary"),
        round(col("tv"), 6).as("tv_delta"))
  }
  /** Adamic–Adar link prediction over a bipartite incidence (Adamic &
    * Adar 2003; Liben-Nowell & Kleinberg 2007): candidate node pairs
    * share at least one `via` vertex, scored
    * AA(a, b) = Σ_{v ∈ N(a)∩N(b)} 1/ln(deg v) — common neighbors
    * discounted by how promiscuous they are (a hub shared by everyone
    * carries no signal; the idf of graphs). Top-`k` by (6-dp snapped
    * score desc, id) — fully deterministic.
    *
    * Scale shape: the candidate join is a `via` EQUI-join (a pair is
    * enumerated only through a shared vertex — never all-pairs, the
    * [[graft.ops.Ann.cosineNearDupPairs]] discipline); deg-1 vertices
    * are dropped BEFORE the self-join (they cannot be shared); the
    * per-pair aggregation is PINNED at full width
    * ([[Fanout.pin]] on the pair keys): its exchange carries few
    * compressed bytes per unit of aggregation work, so AQE's
    * coalescer would otherwise collapse it to one task and the whole
    * candidate-pair set would aggregate serially (the measured 12s
    * mode vs 3s pinned); the top-k is TakeOrderedAndProject (a k-row
    * heap per task, no global sort materialization). Skewed hub
    * vertices are the caller's df-cap decision — same knob as the
    * inverted-index band. */
  def adamicAdar(edges: DataFrame, src: String, via: String,
      k: Int = 100, maxDeg: Long = Long.MaxValue): DataFrame = {
    require(k > 0, s"adamicAdar: k=$k")
    import graft.expr.Snap
    val e = edges.select(col(src).as("node"), col(via).as("via"))
      .distinct()
    // PIN the via partitioning on the SHARED incidence frame — the one
    // whose partitioning every downstream stage (deg, the ew join's
    // streamed side, the pair expansion itself) inherits. Placement
    // rules learned the hard way (r13 probes):
    //  - a pin directly above a child that already hash-partitions on
    //    the same keys through an ENSURE_REQUIREMENTS exchange is
    //    OPTIMIZED OUT by EnsureRequirements, and AQE then coalesces
    //    the surviving ENSURE exchange;
    //  - a pin on the tiny deg side is useless once AQE broadcasts it:
    //    the expansion streams over e's coalescible distinct exchange.
    // Both measured modes ran the ENTIRE ~11M-pair expansion in ONE
    // task. Pinning e itself (REPARTITION_BY_NUM on via: AQE-coalesce-
    // exempt, satisfies the deg groupBy, co-partitions the ew join)
    // keeps expansion and aggregation 32-wide in every AQE outcome;
    // per-via skew is bounded by the maxDeg cap.
    val ep = Fanout.pin(e, col("via"))
    // The snapped per-pair term 1/ln(deg) depends ONLY on the via, so
    // snap it ONCE on the |vias|-sized deg table instead of per pair
    // row: the ~|pairs| aggregation then sums a precomputed long
    // instead of evaluating ln + the snap guard + floor per row (the
    // r14 probe put ~half the query's executor time in that stage).
    // Identity with Snap.snappedSum's fast path is structural: deg ≥ 2
    // makes the scaled term positive, finite and ≤ ~1.45e9 — always
    // under the 2^63 guard — so floor(term·1e9 + 0.5) as a long is the
    // exact value snapTerm would produce per row. The per-PAIR sum
    // stays a plain long (codegen-fast buffer; sum over decimal(38,0)
    // is BigDecimal-backed and was ~half this stage's per-row cost):
    // with every term ≤ ceil(1e9/ln 2) = 1 442 695 041, a long cannot
    // wrap below n_common ≥ 2^63/1.45e9 ≈ 6.4e9 — a single pair group
    // of 6.4 BILLION candidate rows, beyond any graph this operator's
    // maxDeg-capped expansion can emit into one reduce key before the
    // job itself is infeasible. (Corpus-sized snappedSum callers keep
    // the decimal buffer; this bound is pair-local.)
    val deg = ep.groupBy(col("via")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2L && col("deg") <= maxDeg)
      .select(col("via"),
        floor(lit(1.0) / log(col("deg").cast("double")) * lit(1e9)
          + lit(0.5)).as("c"))
    val ew = ep.join(deg, "via")
    val pairs = ew.select(col("via"), col("node").as("node_a"),
        col("c"))
      .join(ew.select(col("via"), col("node").as("node_b")), Seq("via"))
      .filter(col("node_a") < col("node_b"))
    Fanout.pin(pairs, col("node_a"), col("node_b"))
      .groupBy(col("node_a"), col("node_b"))
      .agg(count(lit(1)).as("n_common"),
        round(sum(col("c")).cast("double") / lit(1e9), 6).as("aa_score"))
      .orderBy(col("aa_score").desc, col("node_a"), col("node_b"))
      .limit(k)
  }

  /** Newman–Girvan modularity (Newman & Girvan 2004; Newman 2006) of a
    * labeled partition of the undirected graph — the QUALITY number
    * for every community structure this shelf produces (label prop
    * q172, connected components q63) or that the data carries
    * natively (brands, sources): per community c,
    *   Q_c = e_c/m − (d_c/(2m))²
    * (e_c = within-community edges, d_c = degree sum, m = |edges|);
    * Q = ΣQ_c ∈ [−1/2, 1) with ~0 = "no better than random wiring"
    * — the gate between "we found communities" and "we found noise".
    *
    * Mechanics: edges normalize to deduped (lo < hi) pairs and
    * checkpoint once (three consumers: m, degrees, the labeled join);
    * unlabeled nodes drop from the partition (stated); a node listed
    * more than once in `labels` keeps its MIN label (one label per
    * node, deterministically — a duplicate row must not double-count
    * the node's degree or its within-community edges). Exactness:
    * e_c/d_c/m are exact integers; each Q_c is one fixed IEEE
    * composition; the total snaps at 1e9 (order-free) — fully
    * oracle-replayable.
    *
    * Scale shape: degree rollup and the two label joins are node-/
    * edge-keyed (label table broadcasts when node-bounded, shuffles
    * on the node key at scale); everything after is |communities|-
    * sized. Returns per community (community, n_nodes, e_in,
    * deg_sum, contrib, q_total). */
  def modularity(edges: DataFrame, src: String, dst: String,
      labels: DataFrame, node: String, label: String): DataFrame = {
    import graft.expr.Snap
    val e = edges.select(least(col(src), col(dst)).cast("long").as("lo"),
        greatest(col(src), col(dst)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint(eager = true)
    // ONE label per node, deterministically (min): a node listed twice
    // in `labels` would otherwise fan out BOTH degree-sum and
    // within-community edge joins — double-counting deg_sum and e_in
    // and skewing Q with no error raised (ADVICE r12)
    val lab = labels.select(col(node).cast("long").as("n"),
        col(label).as("c"))
      .groupBy(col("n")).agg(min(col("c")).as("c"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(explode(array(col("lo"), col("hi"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val degC = deg.join(lab, "n").groupBy(col("c"))
      .agg(sum(col("d")).as("deg_sum"), count(lit(1)).as("n_nodes"))
    val eIn = e.join(lab.select(col("n").as("lo"), col("c").as("cl")), "lo")
      .join(lab.select(col("n").as("hi"), col("c").as("ch")), "hi")
      .filter(col("cl") === col("ch"))
      .groupBy(col("cl").as("c")).agg(count(lit(1)).as("e_in"))
    val mD = col("m").cast("double")
    val half = col("deg_sum").cast("double") / (lit(2.0).cast("double") * mD)
    val contribRaw = col("e_in").cast("double") / mD - half * half
    val per = degC.join(eIn, Seq("c"), "left")
      .crossJoin(broadcast(m))
      .select(col("c").as("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"),
        col("m"))
    val withContrib = per.select(col("community"), col("n_nodes"),
      col("e_in"), col("deg_sum"), contribRaw.as("contrib_raw"))
    val tot = withContrib.agg(
      round(Snap.snappedSum(col("contrib_raw"), 1e9), 6).as("q_total"))
    withContrib.crossJoin(broadcast(tot))
      .select(col("community"), col("n_nodes"), col("e_in"),
        col("deg_sum"), round(col("contrib_raw"), 6).as("contrib"),
        col("q_total"))
      .orderBy(col("community"))
  }

}
