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

  test("chain and island resolve to component minima") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("long path converges (log-round bound, not diameter)") {
    // a 64-node path: naive propagation needs 63 rounds; stars need ~log
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 50
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = unionFind(n, edges)
      val got = Graph.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      // spark result omits singletons; compare on nodes that have edges
      got.foreach { case (node, comp) =>
        assert(comp == expect(node), s"trial $trial node $node")
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, s"trial $trial node coverage")
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
}
