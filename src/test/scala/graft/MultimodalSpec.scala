package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal binary-column plumbing: media table shape, per-partition
  * batched decode (stubbed codec), metadata projection. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "a"), (3L, ""))
    .toDF("doc_id", "text")

  test("asMediaTable: payload bytes round-trip, metadata consistent") {
    val m = Multimodal.asMediaTable(docs).orderBy("doc_id").collect()
    assert(new String(m(0).getAs[Array[Byte]]("media"), "UTF-8") == "hello world")
    assert(m(0).getAs[Long]("n_bytes") == 11L)
    assert(m(0).getAs[String]("format") == "utf8-text")
    assert(m(2).getAs[Long]("n_bytes") == 0L)
  }

  test("decodeFeatures: deterministic fixed-width features per partition batch") {
    val media = Multimodal.asMediaTable(docs).as[Multimodal.MediaRow]
    val f1 = Multimodal.decodeFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(media.repartition(3), dim = 8)
      .collect().sortBy(_.doc_id)
    assert(f1.forall(_.features.length == 8))
    // partitioning must not change the decoded features (pure per-row fn)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1(0).n_bytes == 11L)
  }

  test("mediaMeta: chunk plan matches byte length") {
    val m = Multimodal.mediaMeta(docs, chunkBytes = 4).orderBy("doc_id").collect()
    assert(m(0).getAs[Long]("byte_len") == 11L)
    assert(m(0).getAs[Long]("n_chunks") == 3L) // ceil(11/4)
    assert(m(2).getAs[Long]("n_chunks") == 0L)
  }
}
