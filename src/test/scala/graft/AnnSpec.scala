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
}
