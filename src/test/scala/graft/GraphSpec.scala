package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Connected components: hand cases + randomized equivalence with a
  * driver-side union-find oracle. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum root
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  // localFinishEdges = 0 forces the distributed star rounds; the default
  // takes the union-find endgame. Both paths share one output contract.
  private val bothPaths = Seq("local" -> (1L << 20), "distributed" -> 0L)

  test("chain and island resolve to component minima (both paths)") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("src", "dst")
    for ((label, cutoff) <- bothPaths) {
      val got = Graph.connectedComponents(edges, "src", "dst",
        localFinishEdges = cutoff).as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L),
        label)
    }
  }

  test("long path converges (log-round bound, not diameter)") {
    // a 64-node path: naive propagation needs 63 rounds; stars need ~log
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst",
      localFinishEdges = 0L).as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("random graphs match union-find (both paths)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3; (label, cutoff) <- bothPaths) {
      val n = 50
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = unionFind(n, edges)
      val got = Graph.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst", localFinishEdges = cutoff)
        .as[(Long, Long)].collect().toMap
      // spark result omits singletons; compare on nodes that have edges
      got.foreach { case (node, comp) =>
        assert(comp == expect(node), s"trial $trial $label node $node")
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, s"trial $trial $label node coverage")
    }
  }

  test("mid-run handoff: distributed rounds then local endgame agree") {
    // two big-ish blobs + a bridge: first star rounds shrink the edge
    // set below the cutoff, then union-find finishes the remainder
    val rnd = new scala.util.Random(7)
    val blobA = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val blobB = Seq.fill(120)((60L + rnd.nextInt(60), 60L + rnd.nextInt(60)))
    val edges = (blobA ++ blobB :+ ((5L, 65L))).filter { case (a, b) => a != b }
    val expect = unionFind(120, edges)
    for ((label, cutoff) <- Seq("handoff" -> 40L, "allstar" -> 0L)) {
      val got = Graph.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst", localFinishEdges = cutoff)
        .as[(Long, Long)].collect().toMap
      got.foreach { case (node, comp) =>
        assert(comp == expect(node), s"$label node $node")
      }
    }
  }

  test("dedupGroups: singletons kept, clusters keep only the minimum") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (3L, 7L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Graph.dedupGroups(docs, "doc_id", pairs, "doc_a", "doc_b")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(2L) == ((2L, 3L, true)) && got(3L) == ((2L, 3L, false)) &&
      got(7L) == ((2L, 3L, false)))
    assert(got(5L) == ((5L, 2L, true)) && got(6L) == ((5L, 2L, false)))
    Seq(1L, 4L, 8L).foreach(id => assert(got(id) == ((id, 1L, true))))
    assert(got.values.count(_._3) == 5) // exactly one keeper per group
  }

  test("pagerank: hand-computed star graph, two iterations") {
    // undirected star, center 0, leaves 1..4; N=5, init 0.2.
    // iter1: leaves each send 0.2/1 to the center → mass 0.8 →
    //        center 0.03 + 0.85·0.8 = 0.71; leaves get 0.2/4 → 0.0725.
    // iter2: center mass = 4·0.0725 = 0.29 → 0.2765;
    //        leaf mass = 0.71/4 = 0.1775 → 0.180875.
    val fwd = (1L to 4L).map(l => (0L, l))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val got = Graph.pagerank(edges, "src", "dst", iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(got(0L) == 0.2765)
    (1L to 4L).foreach(l => assert(got(l) == 0.180875, s"leaf $l"))
    // no dangling nodes → total rank mass is conserved at 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pagerank is exactly deterministic across partitionings") {
    val edges = (0 until 300).map { i =>
      (i.toLong % 23, (i.toLong * 7 + 3) % 23)
    }.filter(e => e._1 != e._2)
    val a = Graph.pagerank(edges.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pagerank(edges.toDF("src", "dst").repartition(7),
      "src", "dst", 3).as[(Long, Double)].collect().toMap
    assert(a == b) // bit-identical, not approximately equal
  }

  test("pagerank: the every-8th-pass materialize barrier cannot move a bit " +
    "(iters = 9 crosses the barrier; identity materialize never does)") {
    // r15: the materialize hook fires INSIDE the loop every 8th pass
    // (lineage bound for long trajectories). Snapped state must make
    // the trajectory materialization-independent — pin it by running
    // past the barrier with the default (checkpointing) hook vs an
    // identity hook that keeps the whole 9-pass plan lazy.
    val edges = (0 until 200).map { i =>
      (i.toLong % 17, (i.toLong * 5 + 2) % 17)
    }.filter(e => e._1 != e._2)
    val withBarrier = Graph.pagerank(edges.toDF("src", "dst"),
      "src", "dst", 9).as[(Long, Double)].collect().toMap
    val fullyLazy = Graph.pagerank(edges.toDF("src", "dst"),
      "src", "dst", 9, materialize = d => d)
      .as[(Long, Double)].collect().toMap
    assert(withBarrier == fullyLazy) // bit-identical across cadences
  }

  test("triangleCount: K4 has 4 triangles, 3 per node; paths have none") {
    // K4 on 1..4, fed with duplicate and reversed edges (must dedup)
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b))
      .toDF("src", "dst")
    val got = Graph.triangleCount(k4, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // triangle identity: Σ per-node counts = 3 × triangle count (4 here)
    assert(got.values.sum == 12L)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCount(path, "src", "dst").isEmpty)
  }

  test("triangleCount: hub graph counts only closed wedges") {
    // star 0-{1,2,3} plus one closing edge 1-2: exactly one triangle
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L))
      .toDF("src", "dst")
    val got = Graph.triangleCount(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("triangleCount matches brute-force enumeration on random graphs") {
    for (seed <- 1 to 3) {
      // deterministic pseudo-random graph on 20 nodes
      val edges = (0 until 60).map { i =>
        val h = (i * 2654435761L + seed * 40503L) & 0x7fffffffL
        ((h % 20), ((h / 20) % 20))
      }.filter(e => e._1 != e._2).distinct
      val undirected = edges.map { case (a, b) => (a min b, a max b) }.toSet
      // brute force: all node triples with all three edges present
      val nodes = undirected.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val expected = scala.collection.mutable.Map[Long, Long]()
      for {
        Seq(a, b, c) <- nodes.combinations(3)
        if undirected((a, b)) && undirected((b, c)) && undirected((a, c))
      } Seq(a, b, c).foreach(n => expected(n) = expected.getOrElse(n, 0L) + 1)
      val got = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got == expected.toMap, s"seed $seed")
    }
  }

  test("pagerank matches an exact driver replay of the snapped arithmetic") {
    // driver-side replication of the EXACT snapping grid — not an
    // approximate reference: results must be bit-identical
    val edges = (0 until 80).map { i =>
      val h = (i * 1103515245L + 12345L) & 0x7fffffffL
      ((h % 12), ((h / 12) % 12))
    }.filter(e => e._1 != e._2).distinct
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def snap12(x: Double) = math.floor(x * 1e12 + 0.5) / 1e12
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    var rank = nodes.map(_ -> snap6(1.0 / n)).toMap
    for (_ <- 1 to 3) {
      // BigDecimal mass sum mirrors the engine's decimal(28,14) exactly
      val mass = scala.collection.mutable.Map[Long, BigDecimal]()
      for ((s, d) <- edges) {
        val c = BigDecimal(snap12(rank(s) / outdeg(s))).setScale(14)
        mass(d) = mass.getOrElse(d, BigDecimal(0)) + c
      }
      rank = nodes.map(nd => nd -> snap6(
        0.15 / n + 0.85 * mass.getOrElse(nd, BigDecimal(0)).toDouble)).toMap
    }
    val got = Graph.pagerank(edges.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    assert(got == rank)
  }

  test("pagerank: dangling nodes keep the teleport floor") {
    // 1→2, 2 has no out-edges: 2 is a sink; 1 receives nothing
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, "src", "dst", iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.075) // 0.15/2, teleport only
    assert(got(2L) == 0.075 + 0.85 * 0.5)
  }

  // ---- incremental maintenance ----------------------------------------

  private def fullLabels(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val n = (nodes ++ edges.flatMap(e => Seq(e._1, e._2))).max.toInt + 1
    val uf = unionFind(n, edges)
    nodes.map(nd => nd -> uf(nd)).toMap
  }

  test("incrementalComponents ≡ full recompute over history ∪ batch " +
    "(randomized, incl. merges across old components and brand-new nodes)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val nNodes = 30
      val all = Seq.fill(40)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(e => e._1 != e._2)
      val (history, batch0) = all.splitAt(all.size * 2 / 3)
      // force some batch edges to touch nodes history never saw
      val batch = batch0 ++ Seq((nNodes.toLong + 1, 0L), (nNodes + 2L, nNodes + 3L))
      val histNodes = (0L until nNodes.toLong)
      val base = fullLabels(histNodes, history)
      val labels = base.toSeq.toDF("node", "comp")
      val got = Graph.incrementalComponents(labels,
        batch.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      val want = fullLabels(histNodes ++ Seq(nNodes + 1L, nNodes + 2L, nNodes + 3L),
        history ++ batch)
      assert(got == want, s"trial $trial")
    }
  }

  test("incrementalComponents: empty batch is the identity") {
    val labels = Seq((1L, 1L), (2L, 1L), (7L, 7L)).toDF("node", "comp")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Graph.incrementalComponents(labels, empty, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("incrementalComponents: batch-only components among unseen nodes") {
    val labels = Seq((1L, 1L)).toDF("node", "comp")
    val batch = Seq((10L, 11L), (11L, 12L)).toDF("src", "dst")
    val got = Graph.incrementalComponents(labels, batch, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("incrementalComponents: re-folding already-merged edges is a " +
    "no-op (at-least-once replay safety)") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "comp")
    val replay = Seq((1L, 2L)).toDF("src", "dst") // already merged
    val got = Graph.incrementalComponents(labels, replay, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("startDedupGroupSink: labeling after streamed edge batches ≡ " +
    "full CC over initial ∪ all batches; one sink call per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val initial = (0L until 12L).map(n => (n, n)).toDF("node", "comp")
    val b1 = Seq((0L, 1L), (1L, 2L), (5L, 6L))
    val b2 = Seq((2L, 5L), (9L, 10L)) // merges {0,1,2} with {5,6}
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val snaps = scala.collection.mutable.Map[Long, Map[Long, Long]]()
    val q = graft.stream.StreamDedup.startDedupGroupSink(initial,
      ms.toDF().toDF("src", "dst"), "src", "dst",
      java.nio.file.Files.createTempDirectory("cc-ckpt").toString,
      (df, epoch) => snaps.synchronized {
        snaps(epoch) = df.as[(Long, Long)].collect().toMap
      })
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val want = fullLabels(0L until 12L, b1 ++ b2)
    assert(snaps.synchronized(snaps.size) == 2)
    val last = snaps.synchronized(snaps(snaps.keys.max))
    assert(last == want)
    // the final label view merged the two chains through batch 2's edge
    assert(last(6L) == 0L && last(10L) == 9L)
  }
  test("labelProp: chain diffusion per round, majority vote with " +
    "min-label ties, seeds immutable, undirected, unreached absent") {
    // 1 -- 2 -- 3, seed only node 1: node 2 at round 1, node 3 at round 2
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds1 = Seq((1L, "x")).toDF("id", "lab")
    val r = Graph.labelProp(chain, "src", "dst", seeds1, "id", "lab", 2)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2))))
      .toMap
    assert(r == Map(1L -> (("x", 0L)), 2L -> (("x", 1L)), 3L -> (("x", 2L))))
    // majority: node 10 sees x,x,y -> x; tie: node 20 sees x,y -> min label x
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (3L, 20L))
      .toDF("src", "dst")
    val seeds2 = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "lab")
    val r2 = Graph.labelProp(star, "src", "dst", seeds2, "id", "lab", 1)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2))))
      .toMap
    assert(r2(10L) == (("x", 1L)))
    assert(r2(20L) == (("x", 1L))) // 1-1 tie -> lexicographically smaller
    // seeds never flip even when all neighbors disagree
    assert(r2(3L) == (("y", 0L)))
    // edges are undirected: a dst-side seed labels its src neighbor
    val rev = Graph.labelProp(Seq((5L, 1L)).toDF("src", "dst"), "src", "dst",
      seeds1, "id", "lab", 1)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(rev(5L) == "x")
    // unreached nodes are absent, and the result is partition-invariant
    assert(!r.contains(4L))
    val r7 = Graph.labelProp(chain.repartition(7), "src", "dst",
      seeds1.repartition(3), "id", "lab", 2)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2))))
      .toMap
    assert(r7 == r)
  }

  test("kCore: triangle survives the 2-core, pendant chain peels off " +
    "round by round; a pure chain peels to empty (converged)") {
    import graft.ops.Graph
    // triangle {1,2,3} + pendant chain 3-4-5, with duplicate and
    // reversed edges thrown in (canonical dedup must absorb them)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (3L, 1L)).toDF("s", "d")
    val r = Graph.kCore(g, "s", "d", 2, 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getBoolean(2)))).toMap
    // round 1 drops 5 (deg 1), round 2 drops 4 (its degree fell to 1),
    // round 3 confirms the triangle: all degree 2, converged
    assert(r == Map(1L -> ((2L, true)), 2L -> ((2L, true)),
      3L -> ((2L, true))))
    // a pure chain has no 2-core: peels to EMPTY, converged vacuously
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    assert(Graph.kCore(chain, "s", "d", 2, 3).collect().isEmpty)
    // too few rounds: survivors with degree < k remain VISIBLE as
    // converged = false, never silently reported as a core
    val partial = Graph.kCore(chain, "s", "d", 2, 1)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(partial == Map(2L -> ((1L, false)), 3L -> ((2L, false)),
      4L -> ((1L, false))))
    // partition-invariant
    val r7 = Graph.kCore(g.repartition(7), "s", "d", 2, 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r7 == r)
  }
  test("hits: two hubs pointing at one authority split hub mass " +
    "evenly; sinks carry hub 0, sources authority 0") {
    import graft.ops.Graph
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.hits(e, "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2)))).toMap
    // round 1: a = {3: 1}, h = {1: .5, 2: .5}; round 2 re-normalizes
    // to the same fixed point exactly
    assert(r(1L) == ((0.5, 0.0)))
    assert(r(2L) == ((0.5, 0.0)))
    assert(r(3L) == ((0.0, 1.0)))
    // a chain 1 -> 2 -> 3: node 2 is both hub and authority
    val chain = Graph.hits(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(chain(1L)._2 == 0.0 && chain(3L)._1 == 0.0)
    assert(chain(2L)._1 > 0.0 && chain(2L)._2 > 0.0)
  }

  test("clusteringCoefficient: a triangle's members score 1 (or the " +
    "wedge fraction), a pendant node is NULL (deg < 2, undefined)") {
    import graft.ops.Graph
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val r = Graph.clusteringCoefficient(e, "src", "dst")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r(1L) == ((2L, 1L, Some(1.0))))
    assert(r(2L) == ((3L, 1L, Some(r6(1.0 / 6.0 * 2.0)))))
    assert(r(3L) == ((2L, 1L, Some(1.0))))
    assert(r(4L) == ((1L, 0L, None)))
  }

  test("familySizeTail: spectrum counts families by size; Hill alpha " +
    "replays the snapped ln-ratio sum over the top-20 vs the 21st") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1L to 30L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L),
      (8L, 9L), (10L, 11L)).toDF("doc_a", "doc_b")
    val r = graft.ops.Graph.familySizeTail(docs, "doc_id", pairs,
      "doc_a", "doc_b").collect()
    val spec = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(spec == Map(4L -> 1L, 3L -> 1L, 2L -> 2L))
    def s9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // top-20 sizes: 4,3,2,2 then 16 singletons; x_(21) = 1
    val slog = s9(math.log(4.0)) + s9(math.log(3.0)) +
      2 * s9(math.log(2.0))
    val head = r.head
    assert(head.getLong(2) == 20L && head.getLong(3) == 1L)
    assert(head.getDouble(4) == r6(20.0 / slog))
  }

  test("anisotropyReport: identical vectors cos 1, antipodal pair 0, " +
    "orthogonal pair 1/2; zero vectors excluded and counted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.LinAlg
    val same = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r1 = LinAlg.anisotropyReport(same, col("vec_id"),
      col("embedding")).collect().head
    assert(r1.getLong(0) == 2L && r1.getLong(2) == 2L &&
      r1.getDouble(3) == 2.5 && r1.getDouble(4) == 1.0)
    val anti = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(LinAlg.anisotropyReport(anti, col("vec_id"), col("embedding"))
      .collect().head.getDouble(4) == 0.0)
    val orth = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r3 = LinAlg.anisotropyReport(orth, col("vec_id"),
      col("embedding")).collect().head
    assert(r3.getLong(0) == 2L && r3.getLong(1) == 1L &&
      r3.getDouble(4) == 0.5)
  }

  test("energyDistance: separated clusters score the hand V-statistic " +
    "value; identical groups score exactly 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.LinAlg
    def s9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val sep = Seq(
      (1L, Seq(0.0f, 0.0f), true), (2L, Seq(0.0f, 2.0f), true),
      (3L, Seq(10.0f, 0.0f), false), (4L, Seq(10.0f, 2.0f), false))
      .toDF("vec_id", "embedding", "grp")
    val r = LinAlg.energyDistance(sep, col("vec_id"), col("embedding"),
      col("grp")).collect().head
    // cross distances {10, √104, √104, 10}; within means (0+0+2+2)/4=1
    val mxy = (2 * 10.0 + 2 * s9(math.sqrt(104.0))) / 4.0
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == r6(mxy))
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == r6(2.0 * mxy - 2.0))
    assert(r.getDouble(6) == r6(2.0 * 2.0 / 4.0 * (2.0 * mxy - 2.0)))
    val same = Seq(
      (1L, Seq(0.0f, 0.0f), true), (2L, Seq(0.0f, 2.0f), true),
      (3L, Seq(0.0f, 0.0f), false), (4L, Seq(0.0f, 2.0f), false))
      .toDF("vec_id", "embedding", "grp")
    assert(LinAlg.energyDistance(same, col("vec_id"), col("embedding"),
      col("grp")).collect().head.getDouble(5) == 0.0)
  }

  test("assortativity: a star is exactly -1, disjoint cliques of " +
    "distinct degree exactly +1, a regular graph NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val rs = graft.ops.Graph.assortativity(star, "src", "dst")
      .collect().head
    assert(rs.getLong(0) == 4L && rs.getLong(1) == 6L &&
      rs.getDouble(2) == -1.0)
    // K3 ∪ K2: degree-2 nodes pair with degree-2, degree-1 with 1
    val cliques = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val rc = graft.ops.Graph.assortativity(cliques, "src", "dst")
      .collect().head
    assert(rc.getDouble(2) == 1.0)
    // C4: every degree 2 — zero variance, undefined, never NaN
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    assert(graft.ops.Graph.assortativity(cyc, "src", "dst")
      .collect().head.isNullAt(2))
  }

  test("neighborhoodFunction: n1_exact is deg+1; estimates are " +
    "round-monotone, near-exact at tiny cardinalities, deterministic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = graft.ops.Graph.neighborhoodFunction(path, "src", "dst")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 2L && r(2L).getLong(1) == 3L &&
      r(3L).getLong(1) == 3L && r(4L).getLong(1) == 2L)
    for ((_, row) <- r) {
      val (n1, e1, e2) = (row.getLong(1).toDouble, row.getDouble(2),
        row.getDouble(3))
      assert(e2 >= e1, "register domination ⇒ monotone estimates")
      assert(math.abs(e1 - n1) / n1 < 0.25, s"r=1 estimate off: $e1 vs $n1")
    }
    // node 2 reaches all 4 nodes within 2 hops
    assert(math.abs(r(2L).getDouble(3) - 4.0) / 4.0 < 0.25)
    val again = graft.ops.Graph.neighborhoodFunction(
      path.repartition(5), "src", "dst")
      .collect().map(x => x.getLong(0) -> x.toString).toMap
    assert(r.keys.forall(k => again(k) == r(k).toString))
  }
  test("adamicAdar: hand bipartite graph — hub-discounted common " +
    "neighbors, deg-1 vias dropped, deterministic top-k order") {
    import graft.ops.Graph
    // via 10: {1, 2}; via 11: {1, 2, 3}; via 12: {3} (deg 1, dropped);
    // AA(1,2) = 1/ln2 + 1/ln3; AA(1,3) = AA(2,3) = 1/ln3
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 11L), (3L, 12L), (3L, 12L)) // dup edge collapses
      .toDF("node", "via")
    val r = Graph.adamicAdar(edges, "node", "via", k = 10).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val expected12 = r6(math.floor(1.0 / math.log(2.0) * 1e9 + 0.5) / 1e9 +
      0.0) // snapped sum then round — recompute exactly below
    assert(r((1L, 2L))._1 == 2L)
    val aa12 = (math.floor(1.0 / math.log(2.0) * 1e9 + 0.5) +
      math.floor(1.0 / math.log(3.0) * 1e9 + 0.5)) / 1e9
    assert(r((1L, 2L))._2 == math.floor(aa12 * 1e6 + 0.5) / 1e6)
    assert(r((1L, 3L))._1 == 1L && r((2L, 3L))._1 == 1L)
    // the pair with two shared vias outranks the single-via pairs
    val ordered = Graph.adamicAdar(edges, "node", "via", k = 1).collect()
    assert(ordered.head.getLong(0) == 1L && ordered.head.getLong(1) == 2L)
    // maxDeg cap: capping at 2 removes via 11 -> only (1,2) remains
    val capped = Graph.adamicAdar(edges, "node", "via", k = 10,
      maxDeg = 2L).collect()
    assert(capped.map(x => (x.getLong(0), x.getLong(1))).toSet ==
      Set((1L, 2L)))
  }

  test("modularity: hand partition on the square-with-diagonal — " +
    "per-community contributions, dedup/reversal invariance, " +
    "unlabeled nodes drop") {
    import graft.ops.Graph
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // square 1-2-3-4 plus diagonal 1-3 (m = 5); A = {1,2}, B = {3,4}:
    // deg 1:3, 2:2, 3:3, 4:2; e_A = {(1,2)} = 1, d_A = 5;
    // Q_A = 1/5 - (5/10)^2 = -0.05 = Q_B; Q = -0.1 (worse than random
    // wiring: the diagonal crosses the partition)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L),
      (2L, 1L), (3L, 3L)) // reversed dup + self-loop: both must drop
      .toDF("src", "dst")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"),
      (1L, "A"), // duplicate label row: must NOT double-count node 1's
                 // degree or its within-community edges (ADVICE r12)
      (9L, "C")) // label for a node absent from the graph
      .toDF("n", "c")
    val r = Graph.modularity(edges, "src", "dst", labels, "n", "c")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4),
          x.getDouble(5)))).toMap
    assert(r.keySet == Set("A", "B"), s"graph-absent label row: $r")
    assert(r("A") == ((2L, 1L, 5L, -0.05, -0.1)), s"A: ${r("A")}")
    assert(r("B") == ((2L, 1L, 5L, -0.05, -0.1)), s"B: ${r("B")}")
    // a perfect partition: two disjoint triangles
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("src", "dst")
    val lab2 = (1L to 3L).map(i => (i, "L")) ++
      (4L to 6L).map(i => (i, "R"))
    val r2 = Graph.modularity(tri, "src", "dst", lab2.toDF("n", "c"),
      "n", "c").collect().map(x => x.getString(0) -> x.getDouble(5)).toMap
    // Q = 2 * (3/6 - (6/12)^2) = 0.5 — the two-cluster maximum
    assert(r2("L") == 0.5 && r2("R") == 0.5, s"disjoint triangles: $r2")
    // a node with CONFLICTING labels keeps the MIN deterministically:
    // node 1 carries both "L" and "Z" -> stays in "L", "Z" never forms
    val r3 = Graph.modularity(tri, "src", "dst",
      (lab2 :+ ((1L, "Z"))).toDF("n", "c"), "n", "c")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r3 == Map("L" -> 3L, "R" -> 3L), s"min-label conflict: $r3")
  }

  test("registerMax rejects a NULL register element — the fixed-width " +
    "contract is enforced, not silently mis-read (ADVICE r12)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // analysis accepts containsNull=true (the seed transform's lambda
    // is conservatively nullable); a null SLOT must still throw at the
    // first update that sees it, not read as an arbitrary byte
    // Seq[Byte], not Array[Byte]: the latter encodes as BINARY
    val ok = Seq(Tuple1(Seq[Byte](1, 2)), Tuple1(Seq[Byte](3, 1)))
      .toDF("regs")
      .agg(graft.expr.catalyst.RegisterMaxAgg
        .registerMax(col("regs"), 2).as("r"))
      .collect().head.getSeq[Byte](0)
    assert(ok == Seq(3.toByte, 2.toByte), s"elementwise max: $ok")
    val bad = Seq(Tuple1(Seq[java.lang.Byte](1.toByte, null)))
      .toDF("regs")
      .agg(graft.expr.catalyst.RegisterMaxAgg
        .registerMax(col("regs"), 2).as("r"))
    val e = intercept[Exception](bad.collect())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("null register element")),
      s"expected the null-element rejection, got: $e")
  }

}
