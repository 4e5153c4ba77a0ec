package graft
import org.apache.spark.sql.SparkSession
object TmpProfile {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    // warmup
    time("warmup_q09")(SparkEntry.queries("q09_star_revenue")(spark, dir).count())
    time("q14_topk")(SparkEntry.queries("q14_topk_routes")(spark, dir).count())
    time("q14_again")(SparkEntry.queries("q14_topk_routes")(spark, dir).count())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("shingles")(ops.TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3).count())
    val sh = ops.TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
    time("minhash")(ops.TextDedup.minhashSignatures(sh, 8).count())
    val sig = ops.TextDedup.minhashSignatures(sh, 8)
    time("lsh")(ops.TextDedup.lshCandidates(sig).count())
    val cand = ops.TextDedup.lshCandidates(sig)
    time("jaccard")(ops.TextDedup.jaccard(cand, sh).count())
    time("q22_full")(SparkEntry.queries("q22_ngram_jaccard")(spark, dir).count())
    time("q28_stream")(SparkEntry.queries("q28_stream_pipeline")(spark, dir).count())
    time("q21_full")(SparkEntry.queries("q21_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}
