package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Ann
import graft.stream.StreamingAnn

case class QVec(vec_id: Long, embedding: Array[Float])

/** Streaming ANN serving: a static IVF·PQ index answers micro-batches
  * of query vectors with results bit-identical to the batch search on
  * the same rows — the train-once/serve-many split of q135, online. */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("startIvfPqSink: per-batch results ≡ batch ivfPqSearch; empty " +
    "batches skipped; index state is static across batches") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Ann.ivfPqIndex(emb, kCells = 4, m = 4, kCodes = 4, iters = 2)
    index.codes.persist().count() // encode ONCE, serve many

    val queryRows = emb.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .filter(col("vec_id") < 6)
      .as[QVec].collect().sortBy(_.vec_id)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[QVec]
    val results = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = StreamingAnn.startIvfPqSink(index, ms.toDF(), nprobe = 2,
      k = 10, Files.createTempDirectory("ann-ckpt").toString,
      (df, epoch) => results.synchronized {
        results(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(queryRows.take(3).toSeq) // batch 1: queries 0,1,2
      q.processAllAvailable()
      ms.addData(queryRows.drop(3).toSeq) // batch 2: queries 3,4,5
      q.processAllAvailable()
    } finally q.stop()

    val got = results.synchronized(results.values.flatten.toSeq.sorted)
    // the SAME rows searched as one batch give bit-identical results
    val expected = Ann.ivfPqSearch(index,
        emb.filter(col("vec_id") < 6), nprobe = 2, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(results.synchronized(results.size) == 2) // one sink call per batch
  }

  test("startIvfPqIndexSink: streamed frozen-book encoding — union of " +
    "emitted code batches ≡ batch ivfPqAppend of the same vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val arriving = emb.filter(col("vec_id") % 3 === 0)
    val index = Ann.ivfPqIndex(base, kCells = 4, m = 4, kCodes = 4,
      iters = 2, residual = true)

    val vecRows = arriving.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .as[QVec].collect().sortBy(_.vec_id)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[QVec]
    val batches = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = StreamingAnn.startIvfPqIndexSink(index, ms.toDF(),
      Files.createTempDirectory("ann-idx-ckpt").toString,
      (df, epoch) => batches.synchronized {
        batches(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(vecRows.take(vecRows.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(vecRows.drop(vecRows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = batches.synchronized(batches.values.flatten.toSeq.sorted)
    // the appended half of a batch ivfPqAppend on the same vectors
    val expected = Ann.ivfPqAppend(
        index.copy(codes = index.codes.limit(0)), arriving)
      .codes.collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(batches.synchronized(batches.size) == 2)
  }

  test("startOpqIndexSink: streamed permuted-space encoding — union of " +
    "emitted code batches ≡ batch opqAppend of the same vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val arriving = emb.filter(col("vec_id") % 3 === 0)
    val (perm, index) = Ann.opqIvfPqIndex(base, kCells = 4, m = 4,
      kCodes = 4, iters = 2)

    val vecRows = arriving.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .as[QVec].collect().sortBy(_.vec_id)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[QVec]
    val batches = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = StreamingAnn.startOpqIndexSink(index, perm, ms.toDF(),
      Files.createTempDirectory("ann-opq-ckpt").toString,
      (df, epoch) => batches.synchronized {
        batches(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(vecRows.take(vecRows.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(vecRows.drop(vecRows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = batches.synchronized(batches.values.flatten.toSeq.sorted)
    val expected = Ann.opqAppend(
        index.copy(codes = index.codes.limit(0)), perm, arriving)
      .codes.collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(batches.synchronized(batches.size) == 2)
  }

  test("startDecontamSink: streamed admission-time decontam — union of " +
    "per-batch flags ≡ batch semanticDecontam of the unioned vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val arriving = emb.filter(col("vec_id") % 10 =!= 0)

    val vecRows = arriving.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .as[QVec].collect().sortBy(_.vec_id)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[QVec]
    val flags = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = StreamingAnn.startDecontamSink(bench, ms.toDF(), 0.28,
      Files.createTempDirectory("decontam-ckpt").toString,
      (df, epoch) => flags.synchronized {
        flags(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(vecRows.take(vecRows.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(vecRows.drop(vecRows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = flags.synchronized(flags.values.flatten.toSeq.sorted)
    val expected = Ann.semanticDecontam(arriving, bench, 0.28)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty) // the bar actually flags rows at this SF
    assert(flags.synchronized(flags.size) == 2)
  }
}
