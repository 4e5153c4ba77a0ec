package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar layer for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, token counting,
  * document fingerprinting. All pure `Column => Column` built-ins —
  * everything stays inside whole-stage codegen (no UDFs), so these run at
  * parquet-scan speed on a 1000-executor cluster.
  */
object TextStats {

  /** Whitespace tokenizer (single-space corpus convention). */
  def tokens(text: Column): Column = split(text, " ")

  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation count: letter runs / digit runs /
    * single punctuation, the classic pre-tokenizer regex shape. */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Small English stopword list used by the language-ID heuristic. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are English stopwords. Exact rational
    * (int/int division done by caller for float policy control). */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit): _*)))

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9 ]", ""))

  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)
  }

  /** n-gram-heuristic language ID: stopword density above threshold → en.
    * (The corpus is synthetic; the operator shape is what matters.) */
  def langIdHeuristic(text: Column, threshold: Double = 0.05): Column =
    when(nTokens(text) > 0 &&
      stopwordCount(text).cast("double") / nTokens(text) >= threshold, lit("en"))
      .otherwise(lit("unknown"))

  /** Quality score in [0,1]: length sweet-spot, low punctuation, some
    * stopwords — the usual cheap pre-filter for corpus curation. */
  def qualityScore(text: Column): Column = {
    val n = nTokens(text)
    val lenOk = when(n.between(20, 1000), lit(1.0)).otherwise(lit(0.5))
    val punctOk = when(punctCount(text) * lit(10) < length(text), lit(1.0))
      .otherwise(lit(0.5))
    val stopOk = when(stopwordCount(text) > 0, lit(1.0)).otherwise(lit(0.5))
    round((lenOk + punctOk + stopOk) / lit(3.0), 4)
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set. Identical token multisets-modulo-order collide — the
    * standard cheap near-dup blocking key. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Vocabulary builder: the `maxSize` most frequent tokens with dense
    * ids assigned in (count desc, token asc) order — the dictionary-
    * encoding step that bounds id domains for downstream sketches
    * (e.g. [[graft.expr.catalyst.BitsetDistinct]]). One explode + one
    * count agg + one top-N; the rank window runs over ≤maxSize rows. */
  def buildVocab(docs: org.apache.spark.sql.DataFrame, text: Column,
      maxSize: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, row_number}
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token").asc)
    graft.ops.Fanout.fanout(docs)
      .select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(maxSize)
      .withColumn("token_id", row_number().over(w).cast("long") - 1L)
  }

  /** Dictionary-encode a corpus against a vocabulary (the
    * tokenize-to-ids step before packing/training): one posexplode, one
    * broadcast join (vocabularies are bounded — [[buildVocab]]'s top-N),
    * out-of-vocabulary tokens map to -1. Output is long format
    * (doc_id, pos, token_id) — re-assembly order is explicit in `pos`,
    * not dependent on any collect_list ordering guarantee. */
  def encodeTokens(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, vocab: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, posexplode}
    graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }

  /** Repetition signal (Gopher-style quality rule): per document, the
    * share of its most frequent word 2-gram in all of its 2-grams — high
    * values flag boilerplate/looping text. Counted over the NON-distinct
    * gram stream (repetition is exactly what distinct would erase).
    *
    * One explode + two aggregations, both keyed by (doc, gram) / doc with
    * map-side combine; shuffles carry gram strings, not documents. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, max, round, sum}
    graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(shingles(text, 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("total_2grams"), max(col("n")).as("top_2gram_n"))
      .select(col("doc_id"), col("total_2grams"), col("top_2gram_n"),
        round(col("top_2gram_n").cast("double") / col("total_2grams"), 4)
          .as("rep_ratio"))
  }

  /** Polynomial rolling hash over the character stream (Rabin-Karp
    * base-31 mod 1e9+7): the classic cheap content fingerprint; folds
    * left-to-right inside codegen, no UDF. */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * lit(31L) + ascii(c), lit(1000000007L)))

  /** Contiguous word n-gram shingles as strings, e.g. n=3. Docs shorter
    * than n yield an empty array (sequence() would otherwise descend). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }
}
