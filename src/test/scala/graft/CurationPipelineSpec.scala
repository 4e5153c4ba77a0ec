package graft

import org.apache.spark.sql.functions._
import graft.expr.TextStats
import graft.ops.{Dedup, Packing, Sampling, TextDedup}

/** Capstone: the whole training-data curation pipeline chained
  * end-to-end on the real documents table — quality filter → exact
  * dedup → MinHash near-dup candidate removal → benchmark
  * decontamination → weighted sampling → sequence packing → dictionary
  * encoding. Each stage is an operator verified individually by its own
  * oracle query; this spec verifies they COMPOSE: schemas line up,
  * survivors only ever shrink, and the packed/encoded output is
  * internally consistent.
  */
class CurationPipelineSpec extends SparkSpec {

  test("documents → filter → dedup → decontaminate → sample → pack → encode") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()

    // 1. quality gate (keep reasonably sized, low-punct docs)
    val quality = docs.filter(TextStats.qualityScore(col("text")) >= 0.5)
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= total)

    // 2. exact dedup: canonical survivor per content hash
    val keep = Dedup.exactDedup(quality, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val deduped = quality.join(keep, Seq("doc_id"), "left_semi")
    val nDeduped = deduped.count()
    assert(nDeduped <= nQuality)

    // 3. near-dup removal: drop the higher id of every LSH candidate pair
    val nearDupLosers = TextDedup.lshCandidates(
        TextDedup.minhashSignaturesNative(deduped, col("doc_id"), col("text"), 3, 8))
      .select(col("doc_b").as("doc_id")).distinct()
    val afterNearDup = deduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
    val nNearDup = afterNearDup.count()
    assert(nNearDup <= nDeduped)

    // 4. decontamination vs the "benchmark" (doc_id < 20 held out)
    val g5 = TextDedup.shingleSet(afterNearDup, col("doc_id"), col("text"), 5)
    val contaminated = TextDedup.contamination(
      g5.filter(col("doc_id") >= 20), g5.filter(col("doc_id") < 20))
    val clean = afterNearDup.filter(col("doc_id") >= 20)
      .join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean <= nNearDup)

    // 5. quality-weighted deterministic sampling
    val sampled = Sampling.weightedSample(clean, col("doc_id"),
      length(col("text")) / lit(300.0))
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled <= nClean)

    // 6. pack into 512-token sequences: offsets contiguous, windows sane
    val packed = Packing.concatChunk(sampled, col("doc_id"),
      TextStats.nTokens(col("text")), ctxTokens = 512L, bucketWidth = 50L)
    val rows = packed.orderBy("doc_id").collect()
    assert(rows.length == nSampled)
    var expectedOff = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == expectedOff, s"offset gap at doc ${r.getLong(0)}")
      expectedOff += r.getLong(1)
      assert(r.getLong(3) <= r.getLong(4)) // seq_first <= seq_last
      assert(r.getLong(3) == r.getLong(2) / 512)
    }

    // 7. dictionary-encode the survivors against their own vocab
    val vocab = TextStats.buildVocab(sampled, col("text"), 100)
    val encoded = TextStats.encodeTokens(sampled, col("doc_id"), col("text"), vocab)
    // every sampled token produced exactly one (pos, id) row
    val tokenTotal = sampled
      .agg(sum(TextStats.nTokens(col("text")))).collect()(0).getLong(0)
    assert(encoded.count() == tokenTotal)
    // vocab ids dense in [0, 100); OOV exactly -1
    val ids = encoded.select("token_id").distinct()
      .collect().map(_.getLong(0))
    assert(ids.forall(id => id == -1L || (id >= 0L && id < 100L)))
    // round-trip: joining ids back to tokens reproduces in-vocab tokens
    val joined = encoded.join(vocab, Seq("token_id"))
      .select(col("doc_id"), col("pos"), col("token"))
    assert(joined.count() == encoded.filter(col("token_id") >= 0).count())
  }

  test("perplexity filter + leakage-safe split compose with the curation stages") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // LM-score the corpus and keep the most predictable half — the
    // perplexity gate slots in anywhere a doc-level filter does
    val scored = TextStats.bigramNll(docs, col("doc_id"), col("text"), 0.5)
    assert(scored.count() > 0)
    val cut = scored.agg(expr("percentile(nll, 0.5)")).head().getDouble(0)
    val kept = docs.join(
      scored.filter(col("nll") <= cut).select("doc_id"), Seq("doc_id"), "left_semi")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= docs.count())

    // leakage-safe split over the survivors: every surviving near-dup
    // pair must land on ONE side (the property a doc-keyed split lacks)
    val pairs = TextDedup.lshCandidates(
      TextDedup.minhashSignaturesNative(kept, col("doc_id"), col("text"), 3, 8))
    val split = Sampling.leakageSafeSplit(kept, "doc_id", pairs,
      "doc_a", "doc_b", Seq(20 -> "test", 100 -> "train"))
    assert(split.count() == nKept)
    val straddled = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddled.isEmpty, "a near-dup pair straddles train/test")
  }

  test("q166 datasheet cross-checks against its component artifacts") {
    val dir = "/root/testdata/sf0.001"
    val sheet = SparkEntry.queries("q166_datasheet")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // doc counts straight off the raw table
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sheet.view.mapValues(_._1).toMap == counts)
    // near-dup incidence straight off the q22 output at the same bar
    val pairs = SparkEntry.queries("q22_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.5).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wantDup = pairs.groupBy(srcOf).view.mapValues(_.size.toLong).toMap
    sheet.foreach { case (src, (_, _, nd, _)) =>
      assert(nd == wantDup.getOrElse(src, 0L), s"source $src")
    }
    // totals: every doc appears in exactly one source row
    assert(sheet.values.map(_._1).sum == docs.count())
    sheet.values.foreach { case (ndocs, _, ndup, rate) =>
      assert(ndup <= ndocs && rate >= 0.0 && rate <= 1.0)
    }
  }
  test("q182 funnel: ingest matches the corpus, stages are monotone, " +
    "the gopher stage count equals the component query, and keep_rate " +
    "is the stage-over-stage ratio") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q182_curation_funnel")(spark, dir)
      .orderBy("stage_idx").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("ingest", "gopher", "dedup", "perplexity", "decontam"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows(0).getLong(2) == docs.count())
    val nd = rows.map(_.getLong(2))
    val nt = rows.map(_.getLong(3))
    assert(nd.zip(nd.tail).forall { case (a, b) => b <= a })
    assert(nt.zip(nt.tail).forall { case (a, b) => b <= a })
    val gopherKeep = graft.expr.TextStats.gopherRules(docs,
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(rows(1).getLong(2) == gopherKeep)
    rows.sliding(2).foreach { case Array(prev, cur) =>
      val want = BigDecimal(cur.getLong(2).toDouble / prev.getLong(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cur.getDouble(4) == want, s"keep_rate at ${cur.getString(1)}")
    }
    assert(rows(0).getDouble(4) == 1.0)
  }
  test("q183 per-source funnel sums to the q182 corpus funnel at every " +
    "stage") {
    val dir = "/root/testdata/sf0.001"
    val total = SparkEntry.queries("q182_curation_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val bySrc = SparkEntry.queries("q183_funnel_by_source")(spark, dir)
      .collect().groupBy(_.getLong(1))
      .map { case (st, rows) =>
        st -> ((rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)) }
    assert(bySrc == total)
  }
  test("q185 datasheet diff: per-half counts sum to the corpus, deltas " +
    "are the differences of the rounded means, empty-half guard") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q185_datasheet_diff")(spark, dir)
      .collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == docs.count())
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
      if (!r.isNullAt(6) && !r.isNullAt(7)) {
        val want = BigDecimal(r.getDouble(7) - r.getDouble(6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(8) == want, s"${r.getString(0)} delta")
      } else assert(r.isNullAt(8), "delta must null-propagate")
    }
  }
  test("q186 gate overlap: diagonal consistency with the funnel, joint " +
    "counts bounded by marginals, exclusives bounded by diagonals") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q186_gate_overlap")(spark, dir)
      .collect()
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(diag.keySet ==
      Set("gopher", "dedup", "perplexity", "decontam"))
    diag.values.foreach { case (f, x) => assert(x >= 0L && x <= f) }
    rows.filter(r => r.getString(0) != r.getString(1)).foreach { r =>
      val both = r.getLong(2)
      assert(both <= diag(r.getString(0))._1 &&
        both <= diag(r.getString(1))._1, r.toString)
      assert(r.isNullAt(3))
    }
    // the gopher diagonal ties to the q182 funnel: ingest − gopher stage
    val funnel = SparkEntry.queries("q182_curation_funnel")(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(diag("gopher")._1 == funnel("ingest") - funnel("gopher"))
  }
}
