package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: concatenate documents (in
  * deterministic id order) into one virtual token stream and chunk it
  * into fixed-size context windows — each doc gets its global token
  * offset and the range of training sequences it lands in. The
  * concat-then-chunk packing GPT-style pipelines use; a doc may
  * straddle two sequences, exactly like the real thing.
  *
  * Scale design: the global running offset is a DISTRIBUTED prefix sum,
  * not one global window (which would move the whole corpus to a single
  * partition — the WindowExec "No Partition Defined" trap):
  *   1. docs bucket by id range; per-bucket token totals aggregate with
  *      map-side combine (one tiny row per bucket);
  *   2. the only unpartitioned window runs over the BUCKET TOTALS —
  *      |buckets| rows, thousands at 100 TB, not billions;
  *   3. within-bucket offsets are a window partitioned by bucket —
  *      parallel across buckets, state bounded by bucket width.
  */
object Packing {

  /** @param ctxTokens   context window length in tokens
    * @param bucketWidth id-range width per prefix-sum bucket; size it so
    *                    a bucket's rows fit one task (offsets stay exact
    *                    regardless of the choice) */
  def concatChunk(docs: DataFrame, id: Column, nTokens: Column,
      ctxTokens: Long, bucketWidth: Long = 1000L): DataFrame = {
    val base = docs.select(id.as("doc_id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("__b", floor(col("doc_id") / lit(bucketWidth)).cast("long"))
    val bucketTotals = base.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
    val wBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketTotals
      .withColumn("__boff", coalesce(sum(col("__bt")).over(wBuckets), lit(0L)))
      .drop("__bt")
    val wInBucket = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), Seq("__b"))
      .withColumn("start_off",
        col("__boff") + coalesce(sum(col("n_tokens")).over(wInBucket), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        floor(col("start_off") / lit(ctxTokens)).cast("long").as("seq_first"),
        floor((col("start_off") + col("n_tokens") - 1L) / lit(ctxTokens))
          .cast("long").as("seq_last"))
  }

  /** Sliding-window chunking with overlap: each document yields context
    * windows `[k·stride, min(k·stride + ctxTokens, n))` for every start
    * inside the doc — the strided variant of [[concatChunk]] used when
    * adjacent windows should share `ctxTokens − stride` tokens of
    * context (long-document training, retrieval passage splitting).
    *
    * Pure per-row generation: `sequence` + `explode`, output bounded by
    * ⌈n/stride⌉ chunks per doc, ZERO shuffles at any scale — chunking
    * never needs to know about any other document. */
  def slidingChunks(docs: DataFrame, id: Column, nTokens: Column,
      ctxTokens: Long, stride: Long): DataFrame = {
    require(stride > 0 && ctxTokens >= stride,
      s"slidingChunks: need 0 < stride ($stride) <= ctxTokens ($ctxTokens)")
    docs.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1L, lit(stride)))
          .as("chunk_start"))
      .select(col("doc_id"),
        (col("chunk_start") / lit(stride)).cast("long").as("chunk_idx"),
        col("chunk_start"),
        least(col("chunk_start") + lit(ctxTokens), col("n_tokens"))
          .as("chunk_end"))
  }

  /** Content-defined chunking over each document's token stream: a
    * token is a cut-point iff a uniform hash of the token ≡ 0 (mod
    * `divisor`) — the boundary depends only on CONTENT, so an insertion
    * shifts at most one chunk instead of re-aligning every downstream
    * chunk (the reason backup/dedup systems chunk this way rather than
    * at fixed offsets, and the chunk-level analog of shingling).
    * Expected chunk length = `divisor` tokens. Each chunk row carries
    * its corpus-wide occurrence count — identical chunks hash equal
    * wherever they appear, so `n_copies > 1` IS the shared-content
    * signal (content-addressable-storage dedup over documents).
    *
    * Scale shape: cut flags are a narrow projection; chunk assignment is
    * a per-doc running count (window partitioned by doc_id — state
    * bounded by one document); chunk text is re-sliced from the token
    * array by (start, len) rather than re-assembled through an
    * order-sensitive collect; the only corpus-wide exchanges carry
    * chunk-sized rows (hash + counters), never token rows. Min/max chunk
    * bounds compose downstream (split oversized chunks with
    * [[slidingChunks]]). */
  def cdcChunks(docs: DataFrame, id: Column, text: Column,
      divisor: Int): DataFrame = {
    require(divisor > 0, s"cdcChunks: need divisor > 0 ($divisor)")
    val base = Fanout.fanout(docs)
      .select(id.as("doc_id"), split(text, " ").as("t"))
    val tok = base
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    val cut = when(
      graft.expr.Similarity.md5PrefixLong(col("tok"), 8)
        % divisor === 0, 1L).otherwise(0L)
    // chunk_idx = number of cut tokens strictly before pos (the cut
    // token is the LAST token of its chunk, as in byte-level CDC)
    val wCum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grp = tok
      .withColumn("chunk_idx", coalesce(sum(cut).over(wCum), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(min(col("pos")).as("start_pos"), count(lit(1)).as("n_tokens"))
    val hashed = grp.join(base, Seq("doc_id"))
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"),
        col("n_tokens"),
        md5(array_join(
          slice(col("t"), col("start_pos").cast("int"),
            col("n_tokens").cast("int")), " ")).as("chunk_hash"))
    hashed.withColumn("n_copies",
      count(lit(1)).over(Window.partitionBy(col("chunk_hash"))))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective EXAMPLE CONSTRUCTION step: deterministic span
    * starts (md5 of (doc, pos), ~`startPct`% of positions) each mask a
    * `spanLen`-token window (clipped at the doc end; overlapping
    * windows merge), every maximal masked RUN is replaced by one
    * sentinel `<extra_id_k>` in the input and emits `sentinel + its
    * tokens` to the target — input/target reassembled positionally and
    * md5-hashed, with token/mask/span counts.
    *
    * Deterministic: start decisions are md5-derived (reproducible
    * across engines/runs/retries — the masking a pipeline must replay
    * to regenerate an example on demand); run numbering is positional.
    *
    * Scale shape: every stage is doc-keyed — the start/window explode
    * is ≤spanLen× the start rows; run detection is the gaps-and-islands
    * window per doc (pos − row_number, partitioned by doc); input and
    * target rebuilds are per-doc ordered aggregations (the q132/q151
    * reassembly shape). No corpus-global structure at all: this
    * pipeline runs embarrassingly parallel over docs. */
  def spanCorruption(docs: DataFrame, id: Column, text: Column,
      startPct: Int = 5, spanLen: Int = 3): DataFrame = {
    require(startPct >= 0 && startPct <= 100 && spanLen >= 1,
      s"spanCorruption: startPct=$startPct spanLen=$spanLen")
    val base = Fanout.fanout(docs).select(id.as("doc_id"),
      graft.expr.TextStats.tokens(text).as("t"))
      .withColumn("n", size(col("t")))
    val tok = base.select(col("doc_id"), col("n"),
      posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("n"), (col("p0") + 1).as("pos"), col("tok"))
    val starts = tok.filter(
      Sampling.hashBucket(concat_ws("|", col("doc_id"), col("pos")), 100)
        < startPct)
      .select(col("doc_id"), col("pos").as("s"), col("n"))
    val masked = starts
      .select(col("doc_id"),
        explode(sequence(col("s"),
          least(col("s") + lit(spanLen - 1), col("n")))).as("mp"))
      .distinct()
    // gaps-and-islands: contiguous masked runs; k = per-doc run index
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("mp"))
    val runs = masked
      .withColumn("island", col("mp") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("mp")).as("run_start"), count(lit(1)).as("run_len"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("run_start")))
        .cast("long"))
    val sentinel = concat(lit("<extra_id_"), (col("k") - 1L), lit(">"))
    // positional rebuild: unmasked token | run-start sentinel | dropped
    val flags = tok
      .join(masked.select(col("doc_id"), col("mp").as("pos"),
        lit(1).as("m")), Seq("doc_id", "pos"), "left")
      .join(runs.select(col("doc_id"), col("run_start").as("pos"),
        col("k")), Seq("doc_id", "pos"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("m").isNull, col("tok"))
          .when(col("k").isNotNull,
            concat(lit("<extra_id_"), (col("k") - 1L), lit(">")))
          .otherwise(lit(null).cast("string")).as("out"))
    val input = flags.filter(col("out").isNotNull)
      .groupBy(col("doc_id"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("out")))),
        x => x.getField("out")), " ")).as("input_hash"))
    val target = runs.join(base, Seq("doc_id"))
      .select(col("doc_id"), col("k"),
        concat(sentinel, lit(" "),
          array_join(slice(col("t"), col("run_start").cast("int"),
            col("run_len").cast("int")), " ")).as("span_text"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("k"), col("span_text")))),
          x => x.getField("span_text")), " ")).as("target_hash"))
    val counts = masked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_masked"))
    base.select(col("doc_id"), col("n").cast("long").as("n_tokens"))
      .join(counts, Seq("doc_id"), "left")
      .join(input, Seq("doc_id"), "left")
      .join(target, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("input_hash"), md5(lit(""))).as("input_hash"),
        coalesce(col("target_hash"), md5(lit(""))).as("target_hash"))
  }

  /** Fill-in-the-middle example construction (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle") —
    * the infilling sibling of [[spanCorruption]]: split each document's
    * token sequence into (prefix, middle, suffix) at two md5-derived
    * cut points (all three segments non-empty), then rearrange as
    * PSM `<PRE> p <SUF> s <MID> m` or — for an md5-chosen `spmPct`% of
    * docs — SPM `<SUF> s <PRE> p <MID> m` (the paper's joint 50/50
    * mix). Docs under 3 tokens can't split → mode `plain`, untouched.
    *
    * Deterministic: cut points and the PSM/SPM coin are md5-derived
    * from doc_id (reproducible across engines/runs/retries — an
    * example can be regenerated on demand); the assembled example is
    * returned as an md5 hash plus the cut coordinates, which fully
    * determine it given the corpus.
    *
    * Scale shape: ONE narrow projection — per-doc arithmetic on the
    * token array, no explode, no join, no shuffle of any kind; the
    * construction is embarrassingly parallel over docs (Exchange-free
    * plan, asserted by the q170 plan contract). */
  def fimSplit(docs: DataFrame, id: Column, text: Column,
      spmPct: Int = 50): DataFrame = {
    require(spmPct >= 0 && spmPct <= 100, s"fimSplit: spmPct=$spmPct")
    def h(tag: String, m: Column) = pmod(
      graft.expr.Similarity.md5PrefixLong(concat(col("doc_id").cast("string"),
        lit("|" + tag)), 8), m)
    val base = docs.select(id.as("doc_id"),
        graft.expr.TextStats.tokens(text).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
    val cut = base
      .withColumn("a", when(col("n") >= 3L, lit(1L) + h("a", col("n") - 2L)))
      .withColumn("b", when(col("n") >= 3L,
        col("a") + 1L + h("b", col("n") - col("a") - 1L)))
      .withColumn("mode", when(col("n") < 3L, lit("plain"))
        .when(Sampling.hashBucket(
          concat(col("doc_id").cast("string"), lit("|m")), 100) < spmPct,
          lit("spm"))
        .otherwise(lit("psm")))
    val p = array_join(slice(col("t"), lit(1), col("a").cast("int")), " ")
    val m = array_join(slice(col("t"), (col("a") + 1L).cast("int"),
      (col("b") - col("a")).cast("int")), " ")
    val sfx = array_join(slice(col("t"), (col("b") + 1L).cast("int"),
      (col("n") - col("b")).cast("int")), " ")
    val fim = when(col("mode") === "plain", array_join(col("t"), " "))
      .when(col("mode") === "spm", concat_ws(" ",
        lit("<SUF>"), sfx, lit("<PRE>"), p, lit("<MID>"), m))
      .otherwise(concat_ws(" ",
        lit("<PRE>"), p, lit("<SUF>"), sfx, lit("<MID>"), m))
    cut.select(col("doc_id"), col("n").as("n_tokens"),
      coalesce(col("a"), lit(0L)).as("a"),
      coalesce(col("b"), lit(0L)).as("b"),
      col("mode"), md5(fim).as("fim_hash"),
      coalesce(col("b") - col("a"), lit(0L)).as("n_middle"))
  }
}
