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

  /** Inverted index build — term → (document frequency, collection
    * frequency, bounded posting list): the retrieval-side structure that
    * completes the scoring family ([[buildVocab]] / q64 TF-IDF / q66
    * BM25 consume it). Long-format index tables are how lakehouse search
    * works at 100 TB: one parquet table keyed by term, Z-order/bucket it
    * and lookups are metadata-pruned scans.
    *
    * Scale shape: df/cf are one map-side-combinable aggregation over the
    * (doc, term) tf table. Posting lists are the scale hazard — a
    * stopword's list is corpus-sized — so lists are capped at
    * `maxPostings` doc ids per term via a rank filter BEFORE the
    * collect: `InferWindowGroupLimit` plants a partial top-k on the map
    * side, so the exchange carries ≤ maxPostings rows per term, never a
    * stopword's full corpus. Callers wanting complete lists partition
    * them into blocks instead (same pattern, rank div blockSize).
    *
    * `materialize` snapshots the shared tf table (two consumers: stats
    * + postings). Default `localCheckpoint(true)` is EAGER (the tf job
    * runs at call time) and self-releasing — blocks free when the
    * result frame is collected, unlike `persist`, whose CacheManager
    * entry would outlive the call with no handle to drop it (long-lived
    * sessions accumulate). */
  def invertedIndex(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, maxPostings: Int,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      tf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit,
      row_number, sort_array, collect_list, sum}
    // tf0: the session (doc_id, term, tf) artifact
    val tf = tf0.getOrElse(materialize(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val postings = tf
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPostings)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    // both sides arrive term-partitioned from their aggregations: the
    // final join reuses that partitioning, no extra exchange
    stats.join(postings, "term")
  }

  /** PMI collocation mining — pointwise mutual information of adjacent
    * token pairs, ln(P(ab) / (P(a)·P(b))): the association score behind
    * multi-word-expression detection and tokenizer-vocabulary audits
    * (high-PMI pairs are merge candidates [[graft.ops.Bpe]] should have
    * learned). One bigram count + one unigram count, both map-side
    * combined; the unigram table is vocabulary-sized and broadcast into
    * the scoring join, so the corpus shuffles only for the two counts.
    *
    * Counts are over the NON-distinct streams (probabilities need
    * multiplicity); `minCount` floors bigram support — PMI of rare pairs
    * is noise (classic Church & Hanks caveat). Totals ride along as
    * one-row aggregates collected to the driver (two scalars).
    *
    * `materialize` (default eager self-releasing `localCheckpoint`, see
    * [[invertedIndex]]) snapshots the two vocabulary-sized count tables
    * (each has 2+ consumers). The corpus stream itself is NOT
    * materialized — its two consumers are narrow explode+partial-agg
    * passes over the source scan, and a corpus-sized checkpoint write
    * costs more than the rescans ([[bigramNll]] measures this). */
  def pmiCollocations(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, minCount: Long,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      uni0: Option[org.apache.spark.sql.DataFrame] = None,
      big0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, explode,
      lit, log, round, split, sum}
    // uni0/big0: session artifacts — (tok, uc) and (bigram, bc)
    lazy val fanned = graft.ops.Fanout.fanout(docs)
    val uni = uni0.getOrElse(
      materialize(fanned.select(explode(tokens(text)).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("uc"))))
    val bigAll = big0.getOrElse(
      materialize(fanned.select(shingleGen(text, 2).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("bc"))))
    val bi = bigAll.filter(col("bc") >= minCount)
    // sum() of an empty table is one NULL row — default the totals (any
    // finite value works: the scored output is empty regardless)
    def total(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val r = df.agg(sum(col(c))).first()
      if (r.isNullAt(0)) 1.0 else r.getLong(0).toDouble
    }
    val tTot = total(uni, "uc")
    // bigram total over ALL bigrams (support filter must not bias P(ab));
    // summed off the grouped table — the corpus explodes exactly once
    val bTot = total(bigAll, "bc")
    val w1 = split(col("bigram"), " ").getItem(0)
    val w2 = split(col("bigram"), " ").getItem(1)
    bi.withColumn("w1", w1).withColumn("w2", w2)
      .join(broadcast(uni.withColumnRenamed("tok", "w1")
        .withColumnRenamed("uc", "uc1")), "w1")
      .join(broadcast(uni.withColumnRenamed("tok", "w2")
        .withColumnRenamed("uc", "uc2")), "w2")
      .select(col("bigram"), col("bc"), col("uc1"), col("uc2"),
        // ln of a ratio of exact integer counts: numerator/denominator
        // products as doubles in a FIXED parenthesization (both engines
        // evaluate the identical IEEE sequence), rounded at the end
        round(log(col("bc").cast("double") * lit(tTot) * lit(tTot) /
          (lit(bTot) * col("uc1").cast("double") * col("uc2").cast("double"))), 6)
          .as("pmi"))
  }

  /** Dirichlet-prior query-likelihood ranking (Zhai & Lafferty 2001) —
    * the LM-retrieval scorer next to the BM25/TF-IDF pair, and the
    * serving-side use of the smoothing family [[jmLambdaEm]] tunes:
    * score(q, d) = Σ_{w∈q} ln((tf_{w,d} + μ·cf_w/T) / (len_d + μ)).
    * Dirichlet smoothing length-normalizes implicitly (long docs lean
    * on their own counts, short docs on the corpus LM) — the standard
    * one-knob alternative to JM's λ.
    *
    * Query terms absent from the corpus drop before scoring (their
    * contribution is an equal −∞ for every doc — no ranking
    * information). Every doc scores (a doc missing a term takes the
    * pure-background ln(μ·cf/T / (len+μ)) — that's the smoothing
    * working, not a dropped row); per-doc sums 1e9-snap (order-free),
    * final order ties break doc_id-ascending.
    *
    * Scale shape: corpus LM stats are |q|-row (cf) + one scalar (T);
    * the scoring frame is docLen × |q| rows LEFT-joined against the
    * |q|-filtered TF slice — all broadcast-keyed, the corpus is scanned
    * only for the TF artifact (never with `tf0` supplied); final top-k
    * is TakeOrdered. Returns (doc_id, n_tok, score). */
  def dirichletQl(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, queryTerms: Seq[String], mu: Double = 2000.0,
      topK: Int = 20,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      tf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count,
      explode, lit, log, round, sum}
    require(queryTerms.nonEmpty && mu > 0 && topK > 0,
      s"dirichletQl: query=${queryTerms.size}, mu=$mu, topK=$topK")
    // tf0: the session (doc_id, term, tf) artifact — 4 consumers here
    val tf = tf0.getOrElse(materialize(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))))
    val docLen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_tok"))
    val cf = tf.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val tTot = {
      val r = tf.agg(sum(col("tf"))).first()
      if (r.isNullAt(0)) 1.0 else r.getLong(0).toDouble
    }
    val termScore = log(
      (coalesce(col("tf"), lit(0L)).cast("double") +
        lit(mu) * (col("cf").cast("double") / lit(tTot))) /
        (col("n_tok").cast("double") + lit(mu)))
    docLen.crossJoin(broadcast(cf))
      .join(tf.filter(col("term").isin(queryTerms: _*)),
        Seq("doc_id", "term"), "left")
      .groupBy(col("doc_id"), col("n_tok"))
      .agg(graft.expr.Snap.snappedSum(termScore, 1e9).as("s"))
      .select(col("doc_id"), col("n_tok"), round(col("s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Dunning log-likelihood-ratio collocations (Dunning 1993) — the
    * statistically HONEST collocation test next to [[pmiCollocations]]
    * (PMI explodes on rare pairs: two hapaxes that co-occur once get
    * maximal PMI; G² weighs the evidence MASS, so "of the" beats a
    * coincidence of singletons): G² = 2·Σ_cells O·ln(O/E) over the 2×2
    * adjacency contingency {w₂ follows w₁} × {w₁ precedes}, margins
    * from the bigram table's own row/column totals. Zero cells
    * contribute 0 (lim x·ln x = 0 — guarded, not NaN). Every O and
    * margin is an exact integer; each pair's G² is ONE fixed-order
    * double expression (no cross-row sums — nothing to snap).
    *
    * Scale shape: margins are two vocabulary-sized rollups of the
    * SHARED bigram artifact (broadcast into the scoring join); N is
    * one driver scalar; output is top-k by (G², bigram). Returns
    * (bigram, n_pair, g2). */
  def dunningCollocations(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column, minCount: Long, topK: Int,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      big0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, explode,
      lit, log, round, split, sum, when}
    require(minCount >= 1 && topK >= 1,
      s"dunningCollocations: minCount=$minCount topK=$topK")
    val big = big0.getOrElse(
      materialize(graft.ops.Fanout.fanout(docs)
        .select(shingleGen(text, 2).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("bc"))))
    val w1 = split(col("bigram"), " ").getItem(0)
    val w2 = split(col("bigram"), " ").getItem(1)
    val c1 = big.groupBy(w1.as("w1")).agg(sum(col("bc")).as("c1"))
    val c2 = big.groupBy(w2.as("w2")).agg(sum(col("bc")).as("c2"))
    val nTot = {
      val r = big.agg(sum(col("bc"))).first()
      if (r.isNullAt(0)) 1.0 else r.getLong(0).toDouble
    }
    def term(o: Column, e: Column): Column =
      when(o > 0.0, o * log(o / e)).otherwise(lit(0.0))
    val k11 = col("bc").cast("double")
    val r1 = col("c1").cast("double")
    val r2 = col("c2").cast("double")
    val n = lit(nTot)
    val g2 = lit(2.0) * (
      term(k11, r1 * r2 / n) +
      term(r1 - k11, r1 * (n - r2) / n) +
      term(r2 - k11, (n - r1) * r2 / n) +
      term(n - r1 - r2 + k11, (n - r1) * (n - r2) / n))
    big.filter(col("bc") >= minCount)
      .withColumn("w1", w1).withColumn("w2", w2)
      .join(broadcast(c1), "w1").join(broadcast(c2), "w2")
      .select(col("bigram"), col("bc").as("n_pair"),
        round(g2, 4).as("g2"))
      .orderBy(col("g2").desc, col("bigram"))
      .limit(topK)
  }

  /** Skip-gram co-occurrence counts within a ±`window` token window —
    * the word2vec/GloVe data-prep aggregation (Mikolov et al. 2013):
    * how often does (center, context) co-occur closer than `window`
    * positions. Ordered pairs, center ≠ context position. NO join, NO
    * rescan: a co-occurring pair lives INSIDE one document's token
    * array, so the corpus is scanned exactly once and shuffles nothing
    * but (center, context) partial counts (the positional self-join
    * alternative shuffles the whole token stream `window` times).
    * Shaped as TWO codegen Generates (the q200/unigramSegment
    * template): tokenize ONCE in a staging projection, stream
    * positions out of `sequence(1, n−1)`, and emit each position's
    * ≤2·window ordered pairs from a fixed-width `array(when…)` —
    * nothing per-doc ever materializes. (The earlier
    * flatten-of-transforms built a 2·Σ(len−d) struct ARRAY per doc
    * inside an interpreted higher-order chain, re-evaluating
    * `split(text)` per lambda element — the suite's most expensive
    * query.) `minCount` floors output (rare pairs are noise and the
    * grid is vocabulary²-bounded only after flooring). Returns
    * (center, context, n_cooc). */
  def skipgramCounts(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, window: Int, minCount: Long)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{array, col, count,
      element_at, explode, lit, sequence, size, struct, when}
    require(window >= 1 && minCount >= 1,
      s"skipgramCounts: window=$window minCount=$minCount")
    val n = size(col("__tk"))
    // position i (1-based) pairs with i+d for d ∈ [1, window] where
    // i+d ≤ n — both ordered directions, null slots filtered post-
    // explode (Generate + array/when/element_at are all codegen'd)
    val pairs = (1 to window).flatMap { d =>
      Seq(
        when(col("__i") + lit(d) <= n,
          struct(element_at(col("__tk"), col("__i")).as("a"),
            element_at(col("__tk"), col("__i") + lit(d)).as("b"))),
        when(col("__i") + lit(d) <= n,
          struct(element_at(col("__tk"), col("__i") + lit(d)).as("a"),
            element_at(col("__tk"), col("__i")).as("b"))))
    }
    graft.ops.Fanout.fanout(docs)
      .select(tokens(text).as("__tk"))
      .filter(size(col("__tk")) > 1)
      .select(col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - 1)).as("__i"))
      .select(explode(array(pairs: _*)).as("pr"))
      .filter(col("pr").isNotNull)
      .groupBy(col("pr.a").as("center"), col("pr.b").as("context"))
      .agg(count(lit(1)).as("n_cooc"))
      .filter(col("n_cooc") >= minCount)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
    * over the word co-occurrence graph: a term matters when it
    * co-occurs with terms that matter, the graph-centrality
    * alternative to frequency/tf-idf keyword ranking (a term can be
    * rare yet central). Edges are the ±`window` co-occurrence pairs
    * ([[skipgramCounts]], both directions, floored at `minCount` to
    * drop noise edges); ranks run [[graft.ops.Graph.pagerank]]'s
    * unrolled snapped trajectory for `iters` rounds. Words map to
    * node ids by a 60-bit md5 prefix (deterministic, engine-portable;
    * a collision needs a 60-bit digest-prefix match — the q21 hashed-
    * shingling regime). Returns the top-`topK` keywords by rank
    * (ties word-ascending): (word, rank).
    *
    * Scale shape: one corpus pass to the co-occurrence grid
    * (vocabulary²-bounded after the floor), pagerank's node-keyed
    * joins over the vocab-sized graph, top-k via orderBy.limit. */
  def textRank(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, window: Int = 2, minCount: Long = 10L,
      iters: Int = 2, topK: Int = 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, conv, md5,
      substring}
    require(topK >= 1, s"textRank: topK=$topK")
    def wid(c: Column): Column =
      Similarity.md5PrefixLong(c, 15)
    val edges0 = skipgramCounts(docs, id, text, window, minCount)
      .localCheckpoint(true) // consumers: edges + the word-id map
    val ranks = graft.ops.Graph.pagerank(
      edges0.select(wid(col("center")).as("src"),
        wid(col("context")).as("dst")), "src", "dst", iters)
    val words = edges0.select(col("center").as("word")).distinct()
      .select(col("word"), wid(col("word")).as("id"))
    ranks.join(broadcast(words), "id")
      .select(col("word"), col("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(topK)
  }

  /** Exact phrase search over a POSITIONAL index — the retrieval
    * operator the bag-of-words stack (TF-IDF/BM25/QL) structurally
    * cannot express: "table hash" as adjacent tokens, not co-occurring
    * ones. The corpus tokenizes ONCE into the phrase-term posting
    * slice (doc, pos, term) — filtered to the query's terms before
    * materializing, so the index slice is |postings-of-query-terms|,
    * not corpus-sized — and the phrase resolves as |phrase|−1
    * adjacency equi-joins on (doc, pos+offset): every join key carries
    * (doc_id, position), the classic positional-intersection plan.
    * Returns (doc_id, n_matches) for matching docs. */
  def phraseSearch(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, phrase: Seq[String],
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, posexplode}
    require(phrase.size >= 2, s"phraseSearch: phrase=$phrase")
    val post = materialize(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("p", "term")))
      .filter(col("term").isin(phrase: _*)))
    val base = post.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("p"))
    phrase.tail.zipWithIndex.foldLeft(base) { case (acc, (w, i)) =>
      acc.join(post.filter(col("term") === w)
          .select(col("doc_id"), (col("p") - lit(i + 1)).as("p")),
        Seq("doc_id", "p"))
    }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** RM1 pseudo-relevance-feedback expansion terms (Lavrenko & Croft
    * 2001; the expansion half of RM3): run [[dirichletQl]], treat its
    * top-`fbDocs` as the relevance sample, estimate the relevance model
    * p(w|R) = Σ_d p(d|q)·p_ML(w|d) with p(d|q) = softmax of the
    * retrieval log-scores (the q169 softmax discipline: exp(score−max),
    * 1e9-snapped normalizer), and emit the top-`fbTerms` NON-query
    * terms — the terms a second-pass query should add.
    *
    * Scale shape: the feedback set is fbDocs rows (never corpus-sized);
    * its TF slice arrives by one doc-keyed equi-join against the TF
    * artifact; the relevance model is bounded by the feedback docs'
    * vocabulary. Per-term mixture sums 1e9-snap (order-free); final
    * order ties break term-ascending. Returns (term, weight). */
  def rmExpansion(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, queryTerms: Seq[String], mu: Double = 2000.0,
      fbDocs: Int = 10, fbTerms: Int = 10,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      tf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, exp,
      explode, lit, max, round, sum}
    require(fbDocs > 0 && fbTerms > 0,
      s"rmExpansion: fbDocs=$fbDocs, fbTerms=$fbTerms")
    val tf = tf0.getOrElse(materialize(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))))
    // the feedback set: fbDocs rows — materialized, 3 consumers
    val fb = materialize(dirichletQl(docs, id, text, queryTerms, mu,
      fbDocs, materialize, Some(tf)))
    val mx = fb.agg(max(col("score")).as("mx"))
    val wgt = fb.crossJoin(broadcast(mx))
      .select(col("doc_id"), col("n_tok"),
        exp(col("score") - col("mx")).as("w"))
    val z = wgt.agg(graft.expr.Snap.snappedSum(col("w"), 1e9).as("z"))
    val pd = wgt.crossJoin(broadcast(z))
      .select(col("doc_id"), col("n_tok"), (col("w") / col("z")).as("pd"))
    pd.join(tf, "doc_id")
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy(col("term"))
      .agg(graft.expr.Snap.snappedSum(
        col("pd") * (col("tf").cast("double") / col("n_tok").cast("double")),
        1e9).as("w"))
      .select(col("term"), round(col("w"), 6).as("weight"))
      .orderBy(col("weight").desc, col("term"))
      .limit(fbTerms)
  }

  /** Tokenizer-economics comparison: the whitespace tokenizer vs the
    * BPE-ish pre-tokenizer regex, side by side on the same corpus —
    * total tokens (the training-cost axis), distinct tokens (the
    * vocabulary-pressure axis), tokens/doc (sequence length) and
    * chars/token (the compression rate every tokenizer paper leads
    * with; Rust et al. 2021 call its inverse fertility). The
    * choose-the-tokenizer table that q126's per-word fertility and
    * q134's OOV rate read pointwise.
    *
    * Exactness: every cell is an exact long or an exact-integer
    * ratio rounded at 6 dp. Scale: one fanout per tokenizer into a
    * map-side-combined (tokenizer, token) count — the distinct side
    * is the only exchange; chars tally rides the first pass. Returns
    * one row per tokenizer: (tokenizer, n_docs, total_tokens,
    * distinct_tokens, tokens_per_doc, chars_per_token). */
  def tokenizerEconomics(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, countDistinct,
      explode, expr, length, lit, round, sum, broadcast}
    val fanned = graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), text.as("__t"))
    val ws = fanned.select(lit("whitespace").as("tokenizer"),
      explode(tokens(col("__t"))).as("tok"))
    val bp = fanned.select(lit("bpeish").as("tokenizer"),
      explode(expr("regexp_extract_all(__t, " +
        "'[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")).as("tok"))
    val per = ws.unionByName(bp).groupBy(col("tokenizer"))
      .agg(count(lit(1)).as("total_tokens"),
        countDistinct(col("tok")).as("distinct_tokens"))
    val base = docs.agg(count(lit(1)).as("n_docs"),
      sum(length(text).cast("long")).as("n_chars"))
    per.crossJoin(broadcast(base))
      .select(col("tokenizer"), col("n_docs"), col("total_tokens"),
        col("distinct_tokens"),
        round(col("total_tokens").cast("double") /
          col("n_docs").cast("double"), 6).as("tokens_per_doc"),
        round(col("n_chars").cast("double") /
          col("total_tokens").cast("double"), 6).as("chars_per_token"))
  }

  /** Query clarity score (Cronen-Townsend, Zhai & Croft, SIGIR 2002,
    * "Predicting query performance"): the KL divergence, in bits,
    * between the relevance model estimated from the query's top-k
    * feedback docs and the collection language model —
    * clarity = Σ_w P(w|Q)·log₂(P(w|Q)/P(w|C)). A sharp, topical
    * query concentrates probability on few terms (high clarity); a
    * query that retrieves "the collection in miniature" scores ~0 —
    * the pre-retrieval difficulty predictor in front of the
    * BM25/QL/RM scoring family (q66/q224/q226).
    *
    * The relevance model is [[rmExpansion]]'s softmax-weighted
    * feedback mixture WITHOUT the query-term exclusion or top-k
    * truncation — kept whole, it is exactly a probability
    * distribution (Σ_d p_d·Σ_w tf/len = Σ_d p_d = 1), so no
    * renormalization and nothing truncated out of the KL. Snapped
    * per-term mixture weights and KL terms (1e9); exact-integer
    * collection probabilities. Returns one row:
    * (n_fb_docs, n_terms, clarity_bits). */
  def clarityScore(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, queryTerms: Seq[String], mu: Double = 2000.0,
      fbDocs: Int = 10,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      tf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, exp,
      explode, lit, log, max, round, sum, when}
    require(fbDocs > 0, s"clarityScore: fbDocs=$fbDocs")
    val tf = tf0.getOrElse(materialize(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))))
    val fb = materialize(dirichletQl(docs, id, text, queryTerms, mu,
      fbDocs, materialize, Some(tf)))
    val mx = fb.agg(max(col("score")).as("mx"))
    val wgt = fb.crossJoin(broadcast(mx))
      .select(col("doc_id"), col("n_tok"),
        exp(col("score") - col("mx")).as("w"))
    val z = wgt.agg(graft.expr.Snap.snappedSum(col("w"), 1e9).as("z"),
      count(lit(1)).as("n_fb"))
    val pd = wgt.crossJoin(broadcast(z))
      .select(col("doc_id"), col("n_tok"), col("n_fb"),
        (col("w") / col("z")).as("pd"))
    val rm = pd.join(tf, "doc_id")
      .groupBy(col("term"))
      .agg(graft.expr.Snap.snappedSum(
        col("pd") * (col("tf").cast("double") / col("n_tok").cast("double")),
        1e9).as("w"), max(col("n_fb")).as("n_fb"))
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val tTot = cf.agg(sum(col("cf")).as("t"))
    val pc = col("cf").cast("double") / col("t").cast("double")
    rm.join(cf, "term").crossJoin(broadcast(tTot))
      .agg(max(col("n_fb")).as("n_fb_docs"), count(lit(1)).as("n_terms"),
        graft.expr.Snap.snappedSum(when(col("w") > 0.0,
          col("w") * (log(col("w") / pc) / log(lit(2.0))))
          .otherwise(lit(0.0)), 1e9).as("cl"))
      .select(col("n_fb_docs"), col("n_terms"),
        round(col("cl"), 6).as("clarity_bits"))
  }

  /** Interpolated bigram language-model score per document — the
    * perplexity-filter quality signal of an LLM data pipeline (docs
    * whose mean NLL under a corpus-trained LM is an outlier are
    * boilerplate or noise; the step beyond the unigram NLL of q73):
    * per-bigram `p = λ·P_ML(w2|w1) + (1−λ)·P_uni(w2)` with
    * `P_ML(w2|w1) = bc(w1,w2)/Σ_w bc(w1,w)`, NLL = −Σ k·ln p / Σ k.
    * Interpolation (Jelinek-Mercer) keeps every observed bigram finite
    * without discounting machinery; both probability terms are ratios
    * of exact integer counts evaluated in a FIXED parenthesization so
    * any engine replays bit-identical doubles.
    *
    * Scale shape: unigram/bigram/context tables are vocabulary-sized
    * aggregations (map-side combined, corpus explodes exactly once per
    * stream); the scoring join keys the doc-bigram table on `bigram` —
    * one exchange — and the per-doc NLL is a second map-side-combined
    * aggregation. `materialize` as in [[invertedIndex]]. Docs with
    * fewer than two tokens have no bigrams and are absent. Pass
    * λ with an exactly-representable complement (0.5, 0.75, 0.9375…)
    * if the oracle writes `1−λ` as its own literal. */
  def bigramNll(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, lam: Double,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      uni0: Option[org.apache.spark.sql.DataFrame] = None,
      big0: Option[org.apache.spark.sql.DataFrame] = None,
      docBig0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, explode,
      lit, log, round, split, sum}
    // the corpus stream is NOT materialized: its three consumers are
    // each one narrow explode+partial-agg pass over the source scan,
    // and a corpus-sized checkpoint write costs more than the rescans
    // (callers with an expensive derived `docs` pre-materialize it).
    // uni0/big0/docBig0: session artifacts — (tok, uc), (bigram, bc),
    // (doc_id, bigram, k) — with all three supplied the corpus is
    // never scanned at all
    lazy val fanned = graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), text.as("__t"))
    val uni = uni0.getOrElse(
      materialize(fanned.select(explode(tokens(col("__t"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("uc"))))
    val big = big0.getOrElse(materialize(fanned
      .select(shingleGen(col("__t"), 2).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("bc"))))
    val tTot = {
      val r = uni.agg(sum(col("uc"))).first()
      if (r.isNullAt(0)) 1.0 else r.getLong(0).toDouble
    }
    val w1 = split(col("bigram"), " ").getItem(0)
    val ctx = big.groupBy(w1.as("w1")).agg(sum(col("bc")).as("ctx"))
    val probs = big
      .withColumn("w1", w1)
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(ctx), "w1")
      .join(broadcast(uni.withColumnRenamed("tok", "w2")
        .withColumnRenamed("uc", "uc2")), "w2")
      .select(col("bigram"),
        (lit(lam) * (col("bc").cast("double") / col("ctx").cast("double")) +
          lit(1.0 - lam) * (col("uc2").cast("double") / lit(tTot))).as("p"))
    // per-doc NLL terms via the shared order-independent [[Snap]] sum:
    // the mean is identical under any partitioning/engine/retry
    docBig0.getOrElse(fanned.select(col("doc_id"),
        shingleGen(col("__t"), 2).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("k")))
      .join(probs, "bigram")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        round(-Snap.snappedSum(col("k").cast("double") * log(col("p")), 1e9) /
          sum(col("k")).cast("double"), 4).as("nll"))
  }

  /** Interpolated Kneser–Ney bigram NLL per document — the smoothing
    * the production perplexity filters actually run (CCNet's KenLM
    * gate is KN-smoothed; [[bigramNll]]'s Jelinek-Mercer backs off to
    * raw unigram FREQUENCY, which over-scores tokens that are frequent
    * but promiscuous — KN backs off to continuation DIVERSITY):
    * `P_KN(w2|w1) = max(c(w1w2)−D, 0)/c(w1·) + D·N1+(w1·)/c(w1·) ·
    * N1+(·w2)/N1+(··)` (Kneser & Ney 1995; Chen & Goodman 1999 eq. 18
    * with the single-discount interpolated form). Every factor is a
    * ratio of exact integer type/token counts plus the literal `D`,
    * evaluated in a FIXED parenthesization so any engine replays
    * bit-identical doubles; observed bigrams always score `p > 0`
    * (`N1+(w1·) ≥ 1` whenever `c(w1·) > 0`).
    *
    * Scale shape: identical to [[bigramNll]] — the three model tables
    * (bigram counts, per-`w1` context totals + follower-type counts,
    * per-`w2` predecessor-type counts) are vocabulary-sized map-side
    * combined aggregations off ONE bigram-count table; `N1+(··)` is a
    * single driver scalar; the scoring join keys the doc-bigram table
    * on `bigram` (one exchange) and the per-doc NLL is a snapped
    * order-independent sum. Pass `big0`/`docBig0` session artifacts to
    * skip the corpus scan entirely. Use an exactly-representable
    * discount (0.75 = 3/2^2) so the oracle's literal matches. */
  def knBigramNll(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, discount: Double,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      big0: Option[org.apache.spark.sql.DataFrame] = None,
      docBig0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, explode,
      greatest, lit, log, round, split, sum}
    lazy val fanned = graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), text.as("__t"))
    val big = big0.getOrElse(materialize(fanned
      .select(shingleGen(col("__t"), 2).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("bc"))))
    val w1 = split(col("bigram"), " ").getItem(0)
    val w2 = split(col("bigram"), " ").getItem(1)
    // ctx(w1) = Σ_w c(w1,w); nfollow(w1) = N1+(w1,·) — one pass over
    // the (already vocabulary-sized) bigram table, not the corpus
    val ctx = big.groupBy(w1.as("w1"))
      .agg(sum(col("bc")).as("ctx"), count(lit(1)).as("nfollow"))
    // nprec(w2) = N1+(·,w2), the continuation numerator
    val prec = big.groupBy(w2.as("w2")).agg(count(lit(1)).as("nprec"))
    // N1+(··): distinct bigram types — one driver scalar (≥ 1 floor
    // only guards the empty corpus, where the output is empty anyway)
    val nTypes = math.max(big.count(), 1L).toDouble
    val probs = big.withColumn("w1", w1).withColumn("w2", w2)
      .join(broadcast(ctx), "w1")
      .join(broadcast(prec), "w2")
      .select(col("bigram"),
        ((greatest(col("bc").cast("double") - lit(discount), lit(0.0)) /
          col("ctx").cast("double")) +
          (lit(discount) * col("nfollow").cast("double") /
            col("ctx").cast("double")) *
            (col("nprec").cast("double") / lit(nTypes))).as("p"))
    docBig0.getOrElse(fanned.select(col("doc_id"),
        shingleGen(col("__t"), 2).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("k")))
      .join(probs, "bigram")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        round(-Snap.snappedSum(col("k").cast("double") * log(col("p")), 1e9) /
          sum(col("k")).cast("double"), 4).as("nll"))
  }

  /** Distinct-n corpus diversity per group (the distinct-1/distinct-2
    * diversity ratios of Li et al. 2016, corpus-level): distinct token
    * n-grams over total n-grams for n = 1..`maxN`, one row per group.
    * Low distinct-n marks template-heavy or mode-collapsed sources —
    * the diversity complement to q136's per-doc novelty and q58's
    * within-doc repetition.
    *
    * Scale shape: the corpus explodes once per n into (group, n, gram)
    * and is immediately map-side combined to gram counts; the second
    * aggregation is gram-type-sized, the output group-sized. No
    * distinct-expand: countDistinct is computed as COUNT over the
    * already-grouped gram table. All ratios are exact-integer
    * divisions rounded at 6 dp. */
  def distinctNgrams(docs: org.apache.spark.sql.DataFrame, group: Column,
      text: Column, maxN: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, max,
      round, sum, when}
    val g = (1 to maxN).map { n =>
      graft.ops.Fanout.fanout(docs).select(group.as("grp"),
        lit(n).as("n"), shingleGen(text, n).as("gram"))
    }.reduce(_ unionByName _)
      .groupBy(col("grp"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val cnt = g.groupBy(col("grp"), col("n"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("dn"))
    def tot(n: Int) = max(when(col("n") === n, col("total")))
    def dn(n: Int) = max(when(col("n") === n, col("dn")))
    def ratio(n: Int) =
      round(dn(n).cast("double") / tot(n).cast("double"), 6)
    cnt.groupBy(col("grp")).agg(
      tot(1).as("n_tokens"),
      (ratio(1).as("d1") +: (2 to maxN).map(n => ratio(n).as(s"d$n"))): _*)
  }

  /** Token blocklist gate per source (the word-boundary "bad word"
    * filter of C4/RefinedWeb-style pipelines, expressed as exact token
    * membership rather than regex so the decision is engine-portable):
    * a doc is flagged when it has ≥ `minHits` blocklisted tokens OR
    * the blocklisted fraction reaches 1/`rateDen` — both comparisons
    * stay in INTEGER arithmetic (`nh·rateDen ≥ nt`), so no float
    * threshold can flip cross-engine. Emits per-source doc counts,
    * flag rate, and hits-per-kilotoken.
    *
    * Scale shape: one narrow map over the corpus (split + filter +
    * size — no explode, no shuffle before the source-sized rollup). */
  def blocklistGate(docs: org.apache.spark.sql.DataFrame, text: Column,
      source: Column, words: Seq[String], minHits: Int = 3,
      rateDen: Int = 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, filter, lit, round,
      size, sum, when}
    val tk = tokens(text)
    val d = graft.ops.Fanout.fanout(docs).select(source.as("source"),
      size(tk).cast("long").as("nt"),
      size(filter(tk, t => t.isin(words: _*))).cast("long").as("nh"))
    d.select(col("source"), col("nt"), col("nh"),
        when(col("nh") >= minHits ||
          col("nh") * rateDen >= col("nt"), 1L).otherwise(0L).as("fl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("fl")).as("n_flagged"),
        round(sum(col("fl")).cast("double") /
          count(lit(1)).cast("double"), 6).as("flag_rate"),
        sum(col("nh")).as("n_hits"),
        when(sum(col("nt")) > 0,
          round(sum(col("nh")).cast("double") * lit(1000) /
            sum(col("nt")).cast("double"), 4)).as("hits_per_ktok"))
  }

  /** Chao1 vocabulary-richness estimate per group (Chao 1984,
    * bias-corrected form): with D observed n-gram types, F1 singletons
    * and F2 doubletons, the UNSEEN-type mass is estimated as
    * F1(F1−1)/(2(F2+1)) — "how much vocabulary has this source not yet
    * shown us", the coverage question behind corpus-growth decisions
    * (a source whose chao1 ≈ D is exhausted; one whose chao1 ≫ D keeps
    * paying). Bigram types by default (unigram vocabularies saturate).
    * All-integer inputs, one fixed-parenthesization double expression.
    *
    * Scale shape: one explode to map-side-combined (group, gram, k)
    * counts, one counts-of-counts rollup to |groups| rows. */
  def chao1Richness(docs: org.apache.spark.sql.DataFrame, group: Column,
      text: Column, n: Int = 2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit,
      round, sum, when}
    graft.ops.Fanout.fanout(docs)
      .select(group.as("grp"), shingleGen(text, n).as("gram"))
      .groupBy(col("grp"), col("gram")).agg(count(lit(1)).as("k"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("d"),
        sum(when(col("k") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("k") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("grp"), col("d"), col("f1"), col("f2"),
        round(col("d").cast("double") +
          (col("f1").cast("double") * (col("f1") - lit(1L)).cast("double")) /
            (lit(2L) * (col("f2") + lit(1L))).cast("double"), 4)
          .as("chao1"))
  }

  /** Deleted-interpolation λ for Jelinek-Mercer smoothing (Jelinek &
    * Mercer 1980), learned by EM on HELD-OUT data — the step [[
    * bigramNll]] hard-codes away (its λ is a parameter; this measures
    * what the corpus says it should be, the classic LM-tuning move):
    * train bigram/unigram tables on the even-doc half (the q83/q175
    * snapshot convention), then on the odd half iterate
    * `λ' = Σ k·w / Σ k` with `w = λ·p_big / (λ·p_big + (1−λ)·p_uni)`
    * — the posterior that a held-out bigram came from the bigram
    * mixture component. Held-out bigrams unseen in training have
    * p_big = 0 (they are the evidence FOR interpolation); held-out
    * events whose w2 is out of training vocabulary drop (both
    * components zero — no posterior exists).
    *
    * Determinism: the E-step aggregates on the 1e9-snapped
    * order-free sum, λ snaps to the 1e6 grid between iterations
    * before re-entering the plan as a literal (the kmeans/BT/PCA
    * driver-iterate contract). Scale shape: the held-out events
    * aggregate to a BIGRAM-TYPE-sized table once (not per iteration
    * — materialized), every model join is a broadcast of
    * vocabulary-sized tables, each EM step is one aggregation to a
    * single row. Returns one row (n_events, lambda1, lambda2). */
  def jmLambdaEm(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, iters: Int = 2, lam0: Double = 0.5,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true),
      docTf0: Option[org.apache.spark.sql.DataFrame] = None,
      docBig0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count,
      explode, lit, split, sum}
    // docTf0 (doc_id, term, tf) / docBig0 (doc_id, bigram, k): session
    // artifacts — both halves' model tables are ROLLUPS of the per-doc
    // counts, so with artifacts supplied the corpus is never scanned
    lazy val fanned = graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), text.as("__t"))
    val docTf = docTf0.getOrElse(fanned
      .select(col("doc_id"), explode(tokens(col("__t"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val docBig = docBig0.getOrElse(fanned
      .select(col("doc_id"), shingleGen(col("__t"), 2).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("k"))
      .localCheckpoint(true)) // 2 consumers: train + held halves
    val uni = docTf.filter(col("doc_id") % 2 === 0)
      .groupBy(col("term").as("tok")).agg(sum(col("tf")).as("uc"))
    val big = docBig.filter(col("doc_id") % 2 === 0)
      .groupBy(col("bigram")).agg(sum(col("k")).as("bc"))
      .localCheckpoint(true) // 2 consumers: p_big + ctx
    val w1 = split(col("bigram"), " ").getItem(0)
    val ctx = big.groupBy(w1.as("w1")).agg(sum(col("bc")).as("ctx"))
    val tTot = {
      val r = uni.agg(sum(col("uc"))).first()
      if (r.isNullAt(0)) 1.0 else r.getLong(0).toDouble
    }
    val ev = materialize(docBig.filter(col("doc_id") % 2 =!= 0)
      .groupBy(col("bigram")).agg(sum(col("k")).as("k"))
      .withColumn("w1", w1)
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(uni.withColumnRenamed("tok", "w2")
        .withColumnRenamed("uc", "uc2")), "w2")
      .join(broadcast(big), Seq("bigram"), "left")
      .join(broadcast(ctx), Seq("w1"), "left")
      .select(col("k"),
        coalesce(col("bc").cast("double") / col("ctx").cast("double"),
          lit(0.0)).as("pb"),
        (col("uc2").cast("double") / lit(tTot)).as("pu")))
    var lam = lam0
    val lams = (1 to iters).map { _ =>
      val w = (lit(lam) * col("pb")) /
        (lit(lam) * col("pb") + lit(1.0 - lam) * col("pu"))
      val r = ev.agg(
        Snap.snappedSum(col("k").cast("double") * w, 1e9).as("num"),
        sum(col("k")).as("den")).first()
      lam =
        if (r.isNullAt(1) || r.getLong(1) == 0L) lam
        else math.floor(r.getDouble(0) / r.getLong(1).toDouble * 1e6 +
          0.5) / 1e6
      lam
    }
    ev.agg(coalesce(sum(col("k")), lit(0L)).as("n_events"))
      .select(col("n_events"), lit(lams.head).as("lambda1"),
        lit(lams.last).as("lambda2"))
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
  /** Gopher-style rule filter (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher" §A1.1): the
    * classic composite document-quality gate as PER-RULE boolean flags
    * plus the conjunction — emit the flags, not just the verdict, so a
    * curation dashboard can attribute removals to rules. Every
    * comparison is integer arithmetic (cross-multiplied rationals) —
    * no float in any keep/drop decision, bit-stable across engines.
    *
    * Rules (thresholds as parameters of the classic shape):
    * token count in [minTokens, maxTokens]; mean token length in
    * [minAvgLen, maxAvgLen] (integers — the bound is avgLen·n vs
    * sumLen); distinct-token ratio ≥ 1/2 (the repetition gate); ≥1
    * stopword (the gibberish gate); longest token ≤ maxTokenLen (the
    * markup/URL gate).
    *
    * Scale shape: a PURE PROJECTION — every statistic is a higher-order
    * array function over the token split, zero exchanges at any corpus
    * size. */
  /** Encoding-corruption accounting (the mojibake gate — CCNet-family
    * encoding-health rule next to [[gopherRules]]'s content rules):
    * per group, how much of the text carries U+FFFD replacement
    * characters (the universal transcoding-failure tombstone) or
    * C0 control characters other than tab/newline/CR (binary bleed,
    * broken escapes). Counts are length deltas under global
    * char-class deletion — exact integers, engine-portable; rates
    * round once at the end (flag rate 6 dp, per-kchar densities 4 dp).
    *
    * Scale shape: one pure projection (two regexp deletions + three
    * lengths per row) into one map-side-combined group rollup — the
    * corpus is never shuffled, output is |groups| rows. */
  def mojibakeStats(docs: org.apache.spark.sql.DataFrame, text: Column,
      grp: Column): org.apache.spark.sql.DataFrame = {
    val nRepl = (length(text) -
      length(regexp_replace(text, "\uFFFD", ""))).cast("long")
    val nCtrl = (length(text) - length(regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")
    docs
      .select(grp.as("grp"), length(text).cast("long").as("nc"),
        nRepl.as("nr"), nCtrl.as("nx"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nr") > 0 || col("nx") > 0, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("nc")).as("ncs"), sum(col("nr")).as("n_repl"),
        sum(col("nx")).as("n_ctrl"))
      .select(col("grp").as("source"), col("n_docs"), col("n_flagged"),
        round(col("n_flagged").cast("double") /
          col("n_docs").cast("double"), 6).as("flag_rate"),
        col("n_repl"), col("n_ctrl"),
        // NULL-for-undefined when the group holds only empty texts
        // (0/0 is NULL in Spark non-ANSI but NaN in DuckDB IEEE ops —
        // guard both engines onto the psi/kappa NULL convention)
        when(col("ncs") > 0L, round(col("n_repl").cast("double") *
          lit(1000.0) / col("ncs").cast("double"), 4))
          .as("repl_per_kchar"),
        when(col("ncs") > 0L, round(col("n_ctrl").cast("double") *
          lit(1000.0) / col("ncs").cast("double"), 4))
          .as("ctrl_per_kchar"))
  }

  def gopherRules(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, minTokens: Int = 25, maxTokens: Int = 80,
      minAvgLen: Int = 4, maxAvgLen: Int = 5, maxTokenLen: Int = 7)
      : org.apache.spark.sql.DataFrame = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nDistinct = size(array_distinct(toks)).cast("long")
    val maxLen = array_max(transform(toks, t => length(t))).cast("long")
    val stop = stopwordCount(text).cast("long")
    docs.select(id.as("doc_id"), n.as("n_tokens"),
      (n >= minTokens && n <= maxTokens).as("r_len"),
      (sumLen >= n * minAvgLen && sumLen <= n * maxAvgLen).as("r_wordlen"),
      (nDistinct * 2L >= n).as("r_distinct"),
      (stop >= 1L).as("r_stop"),
      (maxLen <= maxTokenLen).as("r_longest"))
      .withColumn("keep", col("r_len") && col("r_wordlen") &&
        col("r_distinct") && col("r_stop") && col("r_longest"))
  }

  def repetitionStats(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column,
      docBig0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, max, round, sum}
    // docBig0: the session (doc_id, bigram, k) artifact
    docBig0.map(_.select(col("doc_id"), col("bigram").as("gram"),
        col("k").as("n")))
      .getOrElse(graft.ops.Fanout.fanout(docs)
        .select(id.as("doc_id"), shingleGen(text, 2).as("gram"))
        .groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("n")))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("total_2grams"), max(col("n")).as("top_2gram_n"))
      .select(col("doc_id"), col("total_2grams"), col("top_2gram_n"),
        round(col("top_2gram_n").cast("double") / col("total_2grams"), 4)
          .as("rep_ratio"))
  }

  /** Zipf/power-law fit of the token frequency distribution per group:
    * least-squares slope and intercept of ln(freq) on ln(rank), with r²
    * — the corpus-health diagnostic (natural language sits near slope
    * −1; a flat slope flags templated/synthetic text, a cliff flags
    * boilerplate domination). One row per group:
    * (group, vocab_size, n_tokens, slope, intercept, r2).
    *
    * Scale shape: token counting is one map-side-combined aggregation
    * (shuffle carries (group, token) counters, never documents);
    * everything after operates on the VOCABULARY — rank is a window per
    * group over vocab rows, and the regression is a second vocab-sized
    * aggregation. The ln terms are snapped to the 1e9 grid
    * ([[Snap.snappedSum]]) so every Σ is order-independent — the fitted
    * digits cannot vary with partitioning or engine. */
  def zipfFit(docs: org.apache.spark.sql.DataFrame, group: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, log => ln, round, row_number}
    val freq = graft.ops.Fanout.fanout(docs)
      .select(group.as("grp"), explode(tokens(text)).as("tok"))
      .groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("freq").desc, col("tok"))
    val xy = freq
      .withColumn("rnk", row_number().over(w))
      .select(col("grp"), col("freq"),
        ln(col("rnk").cast("double")).as("x"),
        ln(col("freq").cast("double")).as("y"))
    val g = 1e9
    val fit = xy.groupBy(col("grp")).agg(
      count(lit(1)).as("vocab_size"),
      org.apache.spark.sql.functions.sum(col("freq")).as("n_tokens"),
      Snap.snappedSum(col("x"), g).as("sx"),
      Snap.snappedSum(col("y"), g).as("sy"),
      Snap.snappedSum(col("x") * col("x"), g).as("sxx"),
      Snap.snappedSum(col("x") * col("y"), g).as("sxy"),
      Snap.snappedSum(col("y") * col("y"), g).as("syy"))
    val n = col("vocab_size").cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    val r2num = (n * col("sxy") - col("sx") * col("sy")) *
      (n * col("sxy") - col("sx") * col("sy"))
    val r2den = (n * col("sxx") - col("sx") * col("sx")) *
      (n * col("syy") - col("sy") * col("sy"))
    fit.select(col("grp"), col("vocab_size"), col("n_tokens"),
      round(slope, 4).as("slope"),
      round((col("sy") - slope * col("sx")) / n, 4).as("intercept"),
      round(r2num / r2den, 4).as("r2"))
  }

  /** Good–Turing frequency re-estimation over the collection term
    * spectrum (Good 1953; the LGT smooth of Gale & Sampson 1995,
    * "Good-Turing frequency estimation without tears"): how much
    * probability mass should a count-r term REALLY get — and how much
    * belongs to the unseen vocabulary (p₀ = N₁/N, the LM-smoothing
    * constant Kneser–Ney's discounts approximate). Per present count
    * r ≤ `rCap`:
    *   r*_turing = (r+1)·N_{r+1}/N_r   (NULL when N_{r+1} = 0 — the
    *     gap problem that motivates the smooth),
    *   r*_lgt    = (r+1)·S(r+1)/S(r),  S(r) = exp(a + b·ln r) the
    *     log-log OLS fit of the Gale–Sampson Z_r = N_r/(½(t−q))
    *     (q/t = neighboring present counts; q = 0 at the low end,
    *     t = 2r − q at the high end).
    * The spectrum CAPS at r ≤ rCap (data-independent): Good–Turing is
    * only ever applied to small counts — for large r the MLE r* = r
    * is standard (Katz 1987 uses k = 5) — and the cap bounds the one
    * window frame at rCap+1 rows regardless of corpus size. All OLS
    * Σs 1e9-snapped.
    *
    * Scale shape: one pass over the (doc, term, tf) artifact to
    * collection counts (map-side combined), one vocab-sized spectrum
    * aggregation; everything after is ≤ rCap+1 rows. Returns one row
    * per present r ≤ rCap: (r, n_r, r_star, r_star_lgt, p_unseen),
    * 6 dp (p_unseen constant across rows). */
  def goodTuring(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, rCap: Int = 50,
      tf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col,
      count, exp, explode, lag, lead, lit, log => ln, round, sum, when}
    require(rCap >= 2, s"goodTuring: rCap=$rCap")
    val g = 1e9
    val tf = tf0.getOrElse(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("r"))
    val tot = ctf.agg(sum(col("r")).as("nt"),
      sum(when(col("r") === 1L, 1L).otherwise(0L)).as("n1"))
    val spec = ctf.filter(col("r") <= rCap + 1)
      .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("r"))
    val zr = spec
      .withColumn("q", coalesce(lag(col("r"), 1).over(w), lit(0L)))
      .withColumn("tn", lead(col("r"), 1).over(w))
      .withColumn("nn", lead(col("n_r"), 1).over(w))
      .withColumn("t", coalesce(col("tn"), lit(2L) * col("r") - col("q")))
      .withColumn("z", col("n_r").cast("double") /
        (lit(0.5) * (col("t") - col("q")).cast("double")))
      .filter(col("r") <= rCap)
    val x = ln(col("r").cast("double"))
    val fit = zr.agg(count(lit(1)).as("n"),
      Snap.snappedSum(x, g).as("sx"),
      Snap.snappedSum(ln(col("z")), g).as("sy"),
      Snap.snappedSum(x * x, g).as("sxx"),
      Snap.snappedSum(x * ln(col("z")), g).as("sxy"))
    val nD = col("n").cast("double")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val b = (nD * col("sxy") - col("sx") * col("sy")) / vx
    val a = (col("sy") - b * col("sx")) / nD
    val rD = col("r").cast("double")
    val lgt = when(col("n") >= 2L && vx > 0.0,
      (rD + lit(1.0)) * exp(a + b * ln(rD + lit(1.0))) /
        exp(a + b * ln(rD)))
    zr.crossJoin(broadcast(fit)).crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        round(when(col("tn") === col("r") + 1L,
          (rD + lit(1.0)) * col("nn").cast("double") /
            col("n_r").cast("double")), 6).as("r_star"),
        round(lgt, 6).as("r_star_lgt"),
        round(col("n1").cast("double") / col("nt").cast("double"), 6)
          .as("p_unseen"))
  }

  /** Shannon entropy rate / redundancy of the token stream (Shannon
    * 1951, "Prediction and entropy of printed English"; the F_n
    * series at n = 2): the conditional entropy
    *   H(X_n | X_{n−1}) = H(bigram joint) − H(unigram)
    * measures how much each next token actually carries once the
    * previous one is known, and redundancy 1 − H_cond/ln V says how
    * compressible the stream is — near 1 = templated/boilerplate,
    * near 0 = incompressible. Computed in NATS with the q104 trick
    * H = ln N − (Σ c·ln c)/N (one snapped term per distinct type, no
    * per-type division); redundancy is a ratio so the base cancels.
    * V ≤ 1 or an empty corpus → NULL redundancy (NULL-for-undefined).
    *
    * Scale shape: reads the unigram and bigram count artifacts (each
    * one map-side-combined corpus pass, shared session-wide); the
    * entropies are two vocabulary-sized aggregations crossed as
    * one-row broadcasts. Returns one row: (vocab, n_tokens,
    * n_bigrams, h_unigram, h_bigram, h_cond, redundancy), 6 dp. */
  def entropyRate(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column,
      uni0: Option[org.apache.spark.sql.DataFrame] = None,
      big0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count,
      explode, lit, log => ln, round, sum}
    val g = 1e9
    val uni = uni0.getOrElse(graft.ops.Fanout.fanout(docs)
      .select(explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("uc")))
    val big = big0.getOrElse(graft.ops.Fanout.fanout(docs)
      .select(shingleGen(text, 2).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("bc")))
    def clnc(c: Column): Column =
      Snap.snappedSum(c.cast("double") * ln(c.cast("double")), g)
    val u = uni.agg(count(lit(1)).as("vocab"), sum(col("uc")).as("n"),
      clnc(col("uc")).as("s1"))
    val b = big.agg(sum(col("bc")).as("nb"), clnc(col("bc")).as("s2"))
    val nD = col("n").cast("double")
    val nbD = col("nb").cast("double")
    val h1 = ln(nD) - col("s1") / nD
    val h2 = ln(nbD) - col("s2") / nbD
    val cond = h2 - h1
    u.crossJoin(broadcast(b))
      .select(col("vocab"), col("n").as("n_tokens"),
        col("nb").as("n_bigrams"),
        round(h1, 6).as("h_unigram"), round(h2, 6).as("h_bigram"),
        round(cond, 6).as("h_cond"),
        round(org.apache.spark.sql.functions.when(col("vocab") > 1L,
          lit(1.0) - cond / ln(col("vocab").cast("double"))), 6)
          .as("redundancy"))
  }

  /** Term burstiness via the variance-to-mean ratio of per-document
    * counts (Church & Gale 1995; Fisher's index of dispersion): a
    * Poisson-scattered term has VMR ≈ 1, a CONTENT term clumps into
    * the few documents it is about (VMR ≫ 1) — the classic signal
    * separating topical vocabulary from function words at equal
    * collection frequency, and a templated-corpus diagnostic (every
    * term near 1 = text with no topical structure). Zero-occurrence
    * documents COUNT: mean = ctf/D, E[x²] = Σtf²/D over all D docs,
    * VMR = (E[x²] − mean²)/mean — population moments, all from exact
    * INTEGER sums (no snapping needed anywhere).
    *
    * Scale shape: one pass over the (doc, term, tf) artifact
    * (map-side combined — Σtf, Σtf², df per term), one broadcast of
    * the single-row doc count, top-k by collection frequency plans as
    * TakeOrderedAndProject (ties break term-ascending). Returns topK
    * rows: (term, ctf, df, vmr), 6 dp. */
  def burstiness(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, topK: Int = 20,
      tf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count,
      explode, lit, round, sum}
    require(topK >= 1, s"burstiness: topK=$topK")
    val tf = tf0.getOrElse(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val d = graft.ops.Fanout.fanout(docs).agg(count(lit(1)).as("nd"))
    val per = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"),
      count(lit(1)).as("df"), sum(col("tf") * col("tf")).as("stf2"))
    val nD = col("nd").cast("double")
    val mean = col("ctf").cast("double") / nD
    val vmr = (col("stf2").cast("double") / nD - mean * mean) / mean
    per.crossJoin(broadcast(d))
      .select(col("term"), col("ctf"), col("df"),
        round(vmr, 6).as("vmr"))
      .orderBy(col("ctf").desc, col("term"))
      .limit(topK)
  }

  /** Heaps'-law vocabulary-growth fit (Heaps 1978): V(n) ≈ K·n^β,
    * the companion diagnostic to [[zipfFit]] — Zipf reads the
    * frequency-rank SHAPE of a fixed corpus, Heaps reads how the
    * vocabulary GROWS as the corpus does (natural text sits near
    * β ≈ 0.5; β → 1 flags id-like/unbounded vocabularies that will
    * blow up any tokenizer, β → 0 flags templated text that stops
    * yielding new types). Checkpoints are the powers of two over the
    * doc sequence (pos = doc_id + 1): V(2^j) = #{terms whose FIRST
    * occurrence sits at pos ≤ 2^j}, then the closed-form log-log OLS
    * for (β, ln K) over the checkpoint points.
    *
    * Scale shape: one term-level aggregation (min first-doc per term
    * — map-side-combined, shuffles carry (term, doc_id) pairs), then
    * each term maps to its checkpoint bucket j = ⌈log2(pos)⌉ and the
    * REST of the plan is checkpoint-grid-sized: a ≤ log2(N)-row
    * cumulative window, a single-row OLS aggregate, one broadcast
    * cross join to stamp the fit onto the curve rows. The ln terms
    * snap to the 1e9 grid ([[Snap.snappedSum]]) so every Σ is
    * order-independent. Returns one row per checkpoint:
    * (n, v, beta, lnk). */
  def heapsLawFit(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column,
      docTf0: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, ceil, coalesce, col,
      count, explode, lit, log => ln, log2, min, pow, round, sum}
    val tf = docTf0.getOrElse(graft.ops.Fanout.fanout(docs)
      .select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    // driver scalar: the checkpoint-grid extent (the kmeans/BPE
    // driver-state convention — one number, not data). pos = doc_id+1
    // treats doc_id as a 0-based SEQUENCE POSITION, so the grid must
    // cover max(doc_id)+1 — deriving it from count(docs) would drop
    // first-occurrence buckets with j > ⌈log2(count)⌉ whenever ids
    // are sparse or offset, silently undercounting V at the top
    // checkpoints. With sparse ids the curve's n axis still reads
    // "id-space position", not "docs ingested" — dense 0-based ids
    // are the intended input.
    val maxIdRow = docs.agg(org.apache.spark.sql.functions
        .max(id.cast("long")),
      count(lit(1))).head()
    // distinguish "no rows" from "ids cast to all-NULL" — a non-numeric
    // doc_id column would otherwise fail as a misleading 'empty corpus'
    require(maxIdRow.getLong(1) > 0L, "heapsLawFit: empty corpus")
    require(!maxIdRow.isNullAt(0),
      "heapsLawFit: doc ids cast to all-NULL — ids must be numeric " +
        "0-based sequence positions")
    val nPos = maxIdRow.getLong(0) + 1L
    require(nPos > 0L, s"heapsLawFit: negative doc ids (max=${nPos - 1L})")
    val jmax = math.ceil(math.log(nPos.toDouble) / math.log(2.0)).toInt
    // pos = fd + 1; smallest checkpoint covering pos is 2^⌈log2(pos)⌉
    // (exact: log2 of a power-of-two double is exact, ceil absorbs
    // the rest — fd = 0 lands on j = 0 with no special case)
    val perJ = tf.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      .select(ceil(log2(col("fd").cast("double") + lit(1.0)))
        .cast("int").as("j"))
      .groupBy(col("j")).agg(count(lit(1)).as("c"))
    val grid = docs.sparkSession.range(0L, jmax + 1L)
      .select(col("id").cast("int").as("j"))
    // single-partition window is fine: the frame is the ≤ log2(N)-row
    // checkpoint grid, never corpus-sized
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("j"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val pts = grid.join(perJ, Seq("j"), "left")
      .withColumn("v", sum(coalesce(col("c"), lit(0L))).over(w))
      .filter(col("v") > 0L)
      .select(pow(lit(2.0), col("j").cast("double")).cast("long").as("n"),
        col("v"),
        ln(pow(lit(2.0), col("j").cast("double"))).as("x"),
        ln(col("v").cast("double")).as("y"))
    val g = 1e9
    val fit = pts.agg(count(lit(1)).as("k"),
      Snap.snappedSum(col("x"), g).as("sx"),
      Snap.snappedSum(col("y"), g).as("sy"),
      Snap.snappedSum(col("x") * col("x"), g).as("sxx"),
      Snap.snappedSum(col("x") * col("y"), g).as("sxy"))
    val k = col("k").cast("double")
    val beta = (k * col("sxy") - col("sx") * col("sy")) /
      (k * col("sxx") - col("sx") * col("sx"))
    pts.select(col("n"), col("v"))
      .crossJoin(broadcast(fit.select(round(beta, 6).as("beta"),
        round((col("sy") - beta * col("sx")) / k, 6).as("lnk"))))
  }

  /** Per-group out-of-vocabulary rate against the corpus-global
    * top-`vocabSize` vocabulary (frequency desc, token asc ties —
    * [[buildVocab]]'s order): the tokenizer-coverage eval that decides
    * whether a vocabulary serves every language/source in the mix —
    * a high-OOV slice trains badly no matter how much of it you keep.
    *
    * Scale shape: ONE exploded tokenization pass feeds both sides — the
    * (group, token) count table is the only corpus-sized aggregation;
    * the vocabulary derives from it by a second distinct-token-sized
    * rollup (never re-reading the corpus), and membership is a
    * broadcast left join (vocabularies are bounded by construction).
    * Shuffles carry counts, not text. `materialize` snapshots the
    * shared count table (two consumers), eager self-releasing
    * localCheckpoint by default — the [[invertedIndex]] contract. */
  def oovRate(docs: org.apache.spark.sql.DataFrame, group: Column,
      text: Column, vocabSize: Int,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint(true)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, explode,
      lit, round, sum, when}
    val wc = materialize(graft.ops.Fanout.fanout(docs)
      .select(group.as("grp"), explode(tokens(text)).as("token"))
      .groupBy(col("grp"), col("token")).agg(count(lit(1)).as("n")))
    val vocab = wc.groupBy(col("token")).agg(sum(col("n")).as("tn"))
      .orderBy(col("tn").desc, col("token").asc).limit(vocabSize)
      .select(col("token"), lit(1L).as("__in"))
    wc.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("__in").isNull, col("n")).otherwise(lit(0L))).as("n_oov"))
      .select(col("grp"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** Polynomial rolling hash over the character stream (Rabin-Karp
    * base-31 mod 1e9+7): the classic cheap content fingerprint; folds
    * left-to-right inside codegen, no UDF. */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * lit(31L) + ascii(c), lit(1000000007L)))

  /** Shingle ROWS via the native codegen generator
    * ([[graft.expr.catalyst.ShingleGen]]) — row-for-row ≡
    * `shingleGen(text, n)` (PropertySpec pins the equivalence)
    * but streams each shingle straight into the downstream consumer:
    * no per-document array of ~token-count n-word strings ever
    * materializes, and the Generate stays inside WholeStageCodegen
    * instead of an interpreted transform chain. Use in `select()`
    * exactly like `explode(...)`. */
  def shingleGen(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.catalyst.ShingleGen(
        org.apache.spark.sql.GraftBridge.expression(text), n))

  /** Contiguous word n-gram shingles as strings, e.g. n=3. Docs shorter
    * than n yield an empty array (sequence() would otherwise descend).
    * Prefer [[shingleGen]] when the very next step is an explode. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Dictionary phrase tagging (the FlashText / taxonomy-annotation
    * step of curation — tag every document with the controlled-
    * vocabulary phrases it contains, with hit counts and first
    * positions): token n-grams are generated only for the PHRASE
    * LENGTHS the dictionary actually contains, and matching is a
    * literal IN-list that evaluates inside the scan projection — no
    * dictionary join, no broadcast, nothing but a filter on the gram
    * stream (the relational Aho-Corasick stand-in: the dictionary is
    * compiled into the plan).
    *
    * Scale shape: Σ_l (n − l + 1) gram rows per doc for each distinct
    * phrase length l — bounded by |lens|·n, narrow rows; one
    * map-side-combined (doc, phrase) aggregation. Output only docs
    * with hits. Deterministic: exact string match, integer positions. */
  def phraseTags(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, phrases: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    // a doubled/leading/trailing space in a dictionary entry can never
    // match a single-space-joined gram — reject it loudly instead of
    // silently tagging nothing
    require(phrases.nonEmpty &&
      phrases.forall(p => p.split(" ", -1).forall(_.nonEmpty)),
      s"phraseTags: dictionary entries must be single-space token " +
        s"phrases; offending: ${phrases.filterNot(p => p.split(" ", -1).forall(_.nonEmpty))}")
    val lens = phrases.map(_.split(" ").length).distinct.sorted
    val toks = docs.select(id.as("doc_id"), tokens(text).as("t"))
    // ONE tokenization pass for every phrase length, as TWO codegen
    // Generates (the q200/q238 template): positions stream out of
    // sequence(1, |t|), each position emits its ≤|lens| (pos, gram)
    // candidates from a fixed-width array — nothing per-doc ever
    // materializes (the earlier flatten-of-transforms built a
    // Σ(|t|−l+1) struct array per doc in an interpreted HOF chain)
    val cand = lens.map { l =>
      when(col("__i") + lit(l - 1) <= size(col("t")),
        struct(col("__i").as("pos"),
          array_join(slice(col("t"), col("__i"), lit(l)), " ").as("gram")))
    }
    toks.filter(size(col("t")) >= lens.min)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")))).as("__i"))
      .select(col("doc_id"), explode(array(cand: _*)).as("g"))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
      .filter(col("gram").isin(phrases: _*))
      .groupBy(col("doc_id"), col("gram").as("phrase"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("pos")).cast("long").as("first_pos"))
  }
}
