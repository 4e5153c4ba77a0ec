package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.expr.Timestamps
import graft.ops.{Dedup, Merge}

/** Property-based invariants (SURVEY §5.2-3): clean_ts total-function
  * behavior over ScalaCheck-generated malformed ISO-8601 inputs, merge
  * idempotence, and latest-per-key determinism under permutation.
  * (Generators drive corpus construction; assertions run on whole-corpus
  * Spark jobs rather than per-sample forAll — one JVM job per property.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val isoishGen: Gen[String] = for {
    y <- Gen.chooseNum(1990, 2030)
    mo <- Gen.chooseNum(0, 13)
    d <- Gen.chooseNum(0, 32)
    h <- Gen.chooseNum(0, 25)
    mi <- Gen.chooseNum(0, 60)
    sec <- Gen.oneOf("", ":5", ":05", ":055", ":05.1", ":05.123", ":05.123456")
    tz <- Gen.oneOf("", "Z", "+00:00", "+0000", "-0500", "+02:00", "junk")
  } yield f"$y%04d-$mo%02d-${d}%02dT$h%02d:$mi%02d$sec$tz"

  test("compactionBins conserves bytes and files per partition, any sizes") {
    val sizes = Gen.listOfN(400,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 9000L)))
      .sample.get.zipWithIndex
      .map { case ((p, sz), i) => (p, i.toLong, sz) }
    val files = sizes.toDF("part", "fid", "bytes")
    val bins = graft.ops.Layout.compactionBins(
      files, Seq("part"), col("bytes"), col("fid"), 4096L)
    // conservation: Σ bin bytes ≡ Σ file bytes and Σ n_files ≡ |files|,
    // per partition — no file lost, none double-assigned
    val got = bins.groupBy("part")
      .agg(sum("bytes").as("b"), sum("n_files").as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = sizes.groupBy(_._1).map { case (p, fs) =>
      p -> (fs.map(_._3).sum, fs.size.toLong) }
    assert(got == want)
    // no bin (except possibly a partition's last) is pathologically
    // under-filled: every non-max bin holds > targetBytes - maxFileSize
    val maxFile = sizes.map(_._3).max
    val lastBin = bins.groupBy("part").agg(max("bin").as("lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bins.collect().foreach { r =>
      val (p, bin, bytes) = (r.getString(0), r.getLong(1), r.getLong(3))
      if (bin != lastBin(p))
        assert(bytes > 4096L - maxFile, s"$p bin $bin holds only $bytes")
    }
  }

  test("slidingChunks covers [0, n) exactly for any (n, ctx, stride)") {
    val cases = Gen.listOfN(200, Gen.chooseNum(0L, 500L)).sample.get.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }
    val docs = cases.toDF("doc_id", "n")
    val chunks = graft.ops.Packing
      .slidingChunks(docs, col("doc_id"), col("n"), 96L, 32L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    cases.foreach { case (id, n) =>
      val cs = chunks.getOrElse(id, Array.empty).sortBy(_._2)
      if (n == 0) assert(cs.isEmpty)
      else {
        assert(cs.head._2 == 0L && cs.last._3 == n)
        // starts advance by exactly stride → no position can be skipped
        cs.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._2 - a._2 == 32L && b._2 < a._3 + 32L)
          case _ =>
        }
      }
    }
  }

  test("normalizeTs never throws; output is timestamp-or-NULL for any input") {
    val samples = Gen.listOfN(300, Gen.oneOf(isoishGen,
      Gen.alphaNumStr, Gen.const(""), Gen.const("2024-05-01"))).sample.get
    // one Spark job for the whole corpus: must not raise
    val out = samples.toDF("raw")
      .select(col("raw"), Timestamps.normalizeTs(col("raw")).as("ts"))
      .collect()
    assert(out.length == samples.length)
    // every non-NULL result must round-trip as a valid UTC instant
    out.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getTimestamp(1).getTime > -9999999999999L)
    }
  }

  test("normalizeTs parses every branch-valid shape to the same instant") {
    val variants = Seq(
      "2024-05-01T10:20:30Z", "2024-05-01T10:20:30+0000",
      "2024-05-01T10:20:30", "2024-05-01T10:20:300Z", // 3-digit clamp → :30

      "2024-05-01T10:20:30+00:00")
    val parsed = variants.toDF("raw")
      .select(Timestamps.normalizeTs(col("raw")).as("ts")).collect()
    val secs = parsed.map(_.getTimestamp(0).toInstant.getEpochSecond).toSet
    assert(secs.size == 1)
  }

  test("native NormalizeTs ≡ regex-chain normalizeTs on adversarial corpus") {
    val edge = Seq(
      "2024-05-01T10:20:30Z", "2024-05-01T10:20:30+0000",
      "2024-05-01T10:20:3", "2024-05-01T10:20:300", "2024-05-01T10:20",
      "2024-05-01T10:20:30.123456+00:00", "2024-05-01T10:20:30.1",
      "2024-05-01T10:20Z", "2024-05-01T10:20.123", "2024-05-01T10:20:",
      "2024-05-01T10:20:3.12345", "2024-05-01T10:20:30+01",
      "2024-05-01T10:20:30+0130", "2024-05-01T10:20:30-23:59",
      "2024-13-40T99:99:99Z", "0000-01-01T00:00:00Z", "garbage", "",
      "2024-05-01", "2024-05-01T10:20:3000Z", "T10:20:30Z",
      "2024-05-01T10:20:30+1:30", "2024-05-01T10:20:30junk")
    val gen = Gen.listOfN(500, Gen.oneOf(isoishGen, Gen.alphaNumStr))
    val samples = (edge ++ gen.sample.get).distinct
    val out = samples.toDF("raw").select(col("raw"),
        Timestamps.normalizeTs(col("raw")).as("native"),
        Timestamps.normalizeTsChain(col("raw")).as("chain"))
      .collect()
    val diffs = out.filter(r => r.get(1) != r.get(2))
    assert(diffs.isEmpty,
      s"native≠chain for: ${diffs.map(r => r.getString(0)).mkString("; ")}")
  }

  test("graft_normalize_ts is SQL-callable via GraftExtensions") {
    // force a NEW session so the extension actually registers (getOrCreate
    // would silently return the suite session); same SparkContext under it
    spark.sparkContext // materialize the shared context first
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      // withExtensions (not the spark.sql.extensions conf): the static
      // conf is read from the already-running SparkContext and would be
      // ignored here; on a fresh cluster session either route works.
      val s2 = org.apache.spark.sql.classic.SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      val r = s2.sql(
        "SELECT graft_normalize_ts('2024-05-01T10:20:30Z') AS ts").collect()
      assert(r.head.getTimestamp(0).toInstant ==
        java.time.Instant.parse("2024-05-01T10:20:30Z"))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
      }
    }
  }

  test("composed SQL functions (rolling hash, quality, PII) via GraftExtensions") {
    spark.sparkContext
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.classic.SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      val r = s2.sql(
        "SELECT graft_rolling_hash('abc') AS h, " +
          "graft_pii_scrub('mail a@b.io now') AS s, " +
          "graft_pii_count('mail a@b.io now') AS n, " +
          "graft_lang_id('the cat is on the mat') AS lang").collect().head
      // zorder: interleave(x=0b11, y=0b01) = x bits at even, y at odd
      val z = s2.sql("SELECT graft_zorder(3, 1) AS z").collect().head.getLong(0)
      assert(z == 7L, s"zorder(3,1) = $z") // 0b0111
      // same value as the Column-API definition on the suite session
      import org.apache.spark.sql.functions.lit
      val expectH = spark.range(1)
        .select(graft.expr.TextStats.rollingHash(lit("abc"))).collect()(0).getLong(0)
      assert(r.getLong(0) == expectH)
      assert(r.getString(1) == "mail [EMAIL] now" && r.getLong(2) == 1L)
      assert(r.getString(3) == "en")
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
      }
    }
  }

  test("native ShingleGen ≡ explode(shingles(text, n)) row-for-row") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b"), (3L, "x y z x y"),
      (4L, "a b c "), (5L, " "), (6L, ""), (7L, "solo one two"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "shingle").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    val gen = rows(docs.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.expr.catalyst.ShingleGen(
          org.apache.spark.sql.GraftBridge.expression(col("text")), 3))
        .as("shingle")))
    val comp = rows(docs.select(col("doc_id"),
      explode(graft.expr.TextStats.shingles(col("text"), 3)).as("shingle")))
    assert(gen == comp)
    assert(gen.exists(_._2 == "a b c")) // sanity: shingles actually emitted
    // the same rows must come off the INTERPRETED path (GenerateExec's
    // eval-iterator, used whenever the stage is not codegen'd): with
    // the CollectionGenerator codegen now the default, this is the only
    // coverage keeping eval() and ShingleArrayData from diverging
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = rows(docs.select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(
          graft.expr.catalyst.ShingleGen(
            org.apache.spark.sql.GraftBridge.expression(col("text")), 3))
          .as("shingle")))
      assert(interp == comp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("native MinhashSig ≡ composed shingleSet+minhashSignatures (incl. edges)") {
    import graft.ops.TextDedup
    // edge cases: short doc (no shingles), repeated shingles, trailing
    // space (empty trailing token), single-space doc, real-ish docs
    val docs = (Seq((1L, "a b c d e"), (2L, "a b"), (3L, "x y z x y z x y z"),
      (4L, "a b c "), (5L, " "), (6L, "q w e r t y u i o p")) ++
      (7L to 16L).map(i => i -> s"tok${i % 3} tok${i % 5} tok${i % 7} mid$i tok${i % 3} tok${i % 5}"))
      .toDF("doc_id", "text")
    val composed = TextDedup.minhashSignatures(
        TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3), 8)
      .orderBy("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val native = TextDedup.minhashSignaturesNative(
        docs, col("doc_id"), col("text"), 3, 8)
      .orderBy("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(native.toSeq == composed.toSeq)
    assert(native.nonEmpty && !native.exists(_._1 == 2L)) // short doc: no rows
  }

  test("native Md5Prefix ≡ conv(substring(md5(x),1,L),16,10) for every " +
    "L in [1,15], codegen and interpreted, hostile strings included") {
    import graft.expr.Similarity
    val rnd = new scala.util.Random(20260819)
    val strs = Seq("", " ", "a", "ß∂ƒ©", "tok1 tok2", "\u0000nul",
      "0123456789abcdef0123456789abcdef", "😀 emoji") ++
      (1 to 60).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq.tabulate(8)(i => s"collision-probe-$i-${"x" * i}")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    for (l <- Seq(1, 2, 7, 8, 14, 15)) {
      def vals(c: org.apache.spark.sql.Column) =
        df.select(col("id"), c.as("v")).orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val chain = vals(
        conv(substring(md5(col("s")), 1, l), 16, 10).cast("long"))
      val native = vals(Similarity.md5PrefixLong(col("s"), l))
      assert(native == chain, s"hexLen=$l diverged")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try assert(vals(Similarity.md5PrefixLong(col("s"), l)) == chain,
        s"hexLen=$l diverged on the interpreted path")
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    // NULL child → NULL, like the chain
    val n = Seq((1L, null: String)).toDF("id", "s")
      .select(Similarity.md5PrefixLong(col("s"), 15).as("v")).collect()
    assert(n.head.isNullAt(0))
    // minhashTerm's one-digest two-limb rewrite ≡ the former two-conv
    // form (hi = chars 1–7, lo = chars 8–15)
    def mvals(c: org.apache.spark.sql.Column) =
      df.select(col("id"), c.as("v")).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (i <- Seq(0, 3, 7)) {
      val d = md5(col("s"))
      val old = pmod(
        lit(Similarity.minhashA(i)) *
          conv(substring(d, 1, 7), 16, 10).cast("long") +
        lit(Similarity.minhashB(i)) *
          conv(substring(d, 8, 8), 16, 10).cast("long") +
        lit(Similarity.minhashC(i)), lit(Similarity.MinhashP))
      assert(mvals(Similarity.minhashTerm(i, col("s"))) == mvals(old),
        s"minhashTerm($i) diverged")
    }
  }

  test("native VectorCosine ≡ HOF cosine bit-for-bit on random vectors") {
    import graft.expr.Similarity
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f))
    val pairs = Gen.listOfN(200, Gen.zip(vecGen, vecGen)).sample.get
      .map { case (a, b) => (a.toArray, b.toArray) } ++
      Seq( // edge shapes
        (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),       // zero norm → NULL
        (Array[Float](), Array[Float]()),             // empty → NULL
        (Array(1.0f), Array(1.0f, 2.0f)))             // length mismatch → NULL
    val out = pairs.toDF("a", "b").select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("BitsetDistinct ≡ countDistinct across partitions; null-safe; range-checked") {
    import graft.expr.catalyst.BitsetDistinct.bitsetDistinct
    val rows = Gen.listOfN(500, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.option(Gen.chooseNum(0L, 999L)))).sample.get
    val df = rows.toDF("g", "id").repartition(8) // force multi-partition merge
    val got = df.groupBy("g")
      .agg(bitsetDistinct(col("id"), 1023).as("n"),
        countDistinct(col("id")).as("expect"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r))
    // out-of-domain id → clear error, not silent wrong answer
    val err = intercept[Exception] {
      Seq(5000L).toDF("id")
        .agg(bitsetDistinct(col("id"), 1023)).collect()
    }
    assert(err.getMessage.contains("outside") ||
      err.getCause != null && err.getCause.getMessage.contains("outside"))
  }

  test("upsertCoalesce idempotence over random batches") {
    val kv = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0, 9)
      v <- Gen.option(Gen.alphaStr.map(_.take(4)))
    } yield (s"k$k", v.orNull)).sample.get
    val existing = kv.take(20).toDF("k", "v")
      .groupBy("k").agg(first("v").as("v"))
    val batch = kv.drop(20).toDF("k", "v")
      .groupBy("k").agg(first("v").as("v"))
    val once = Merge.upsertCoalesce(existing, batch, Seq("k"))
    val twice = Merge.upsertCoalesce(once, batch, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("latestPerKey is permutation-invariant") {
    val rows = Gen.listOfN(60, for {
      k <- Gen.chooseNum(0, 5)
      ts <- Gen.chooseNum(0L, 20L)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (s"u$k", ts, id)).sample.get.distinct
    val a = Dedup.latestPerKey(rows.toDF("k", "ts", "id"),
      Seq("k"), Seq(col("ts"), col("id"))).orderBy("k").collect()
    val b = Dedup.latestPerKey(scala.util.Random.shuffle(rows).toDF("k", "ts", "id"),
      Seq("k"), Seq(col("ts"), col("id"))).orderBy("k").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("latestPerKeyTotal ≡ latestPerKey with full-payload tie-break (ties + NULLs)") {
    // heavy tie pressure: ts from a tiny domain, payload cols with NULLs
    val rows = Gen.listOfN(120, for {
      k <- Gen.chooseNum(0, 4)
      ts <- Gen.chooseNum(0L, 3L)
      a <- Gen.option(Gen.chooseNum(0, 9))
      b <- Gen.oneOf("x", "y", "z")
    } yield (s"u$k", ts, a.map(_.toString).orNull, b)).sample.get.distinct
    val df = rows.toDF("k", "ts", "a", "b")
    val packed = Dedup.latestPerKeyTotal(df, Seq("k"), Seq("ts"))
      .orderBy("k").collect()
    // the unpacked equivalent: ord = (ts, struct(remaining cols sorted))
    val unpacked = Dedup.latestPerKey(df, Seq("k"),
        Seq(col("ts"), struct(col("a"), col("b"))))
      .orderBy("k").collect()
    assert(packed.toSeq == unpacked.toSeq)
    // column order and names preserved
    assert(Dedup.latestPerKeyTotal(df, Seq("k"), Seq("ts")).columns.toSeq ==
      Seq("k", "ts", "a", "b"))
  }
  test("rankAuc one-vs-rest AUCs obey the weighted-mean identity " +
    "Σ P_g·AUC_g = T/2-ish on random scored groups") {
    // identity: Σ_g R_g = T(T+1)/2 exactly (every avg rank counted
    // once), so Σ_g [AUC_g·P_g·(T−P_g)] = Σ_g [R_g − P_g(P_g+1)/2];
    // check the raw-sum identity on random data (pre-rounding error
    // bounded by the 6-dp output grid × groups)
    val rows = Gen.listOfN(500, Gen.zip(Gen.oneOf("a", "b", "c", "d"),
      Gen.chooseNum(0, 40).map(_ / 10.0))).sample.get
    val df = rows.toDF("g", "x")
    val got = graft.ops.Quality.rankAuc(df, col("g"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val t = rows.size.toDouble
    val lhs = got.map { case (_, p, auc) => auc * p * (t - p) }.sum
    val rhs = got.map { case (_, p, _) => -p * (p + 1) / 2.0 }.sum +
      t * (t + 1) / 2.0
    assert(math.abs(lhs - rhs) < 1e-4 * t * t,
      s"rank-sum identity violated: $lhs vs $rhs")
    // and every AUC is a probability
    got.foreach { case (g, _, auc) =>
      assert(auc >= 0.0 && auc <= 1.0, s"$g: $auc") }
  }

  test("psiDrift is zero on identical snapshots and positive on any " +
    "genuinely shifted one, for random distributions") {
    val base = Gen.listOfN(300, Gen.zip(Gen.oneOf("p", "q"),
      Gen.chooseNum(0, 100).map(_ / 10.0))).sample.get
    val df = base.toDF("g", "x")
    val same = graft.ops.Analytics.psiDrift(df, df.repartition(5),
        col("g"), col("x"))
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0))
    val shifted = base.map { case (g, x) => (g, x + 50.0) }.toDF("g", "x")
    val moved = graft.ops.Analytics.psiDrift(df, shifted, col("g"), col("x"))
      .collect().map(_.getDouble(3))
    assert(moved.forall(_ > 0.25), s"disjoint supports under alarm: ${moved.toSeq}")
  }

  test("rouge1Prf swap symmetry: swapping refs and cands swaps P and R " +
    "and preserves F1, on random token bags") {
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val pairs = (1L to 40L).map(i => (i, docGen.sample.get, docGen.sample.get))
    val refs = pairs.map(p => (p._1, p._2)).toDF("id", "text")
    val cands = pairs.map(p => (p._1, p._3)).toDF("id", "text")
    def runPrf(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      graft.ops.TextDedup.rouge1Prf(a, col("id"), col("text"),
          b, col("id"), col("text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val fwd = runPrf(refs, cands)
    val rev = runPrf(cands, refs)
    fwd.foreach { case (id, (p, r, f)) =>
      val (p2, r2, f2) = rev(id)
      assert(p2 == r && r2 == p && f2 == f, s"pair $id")
    }
  }

  test("bradleyTerry: global duel-weight scaling leaves strengths " +
    "invariant (the BT scale-freeness), generated duel tables") {
    // w_i <- W_i / SUM n_ij/(w_i+w_j): scaling every weight by c scales
    // numerator and denominator alike, and the per-round normalization
    // cancels the rest. Exact up to the 1e9 snap grid interacting with
    // the scale (floor(2x+0.5) != 2*floor(x+0.5) at grid edges), so the
    // pin is a 1e-5 tolerance on the 6-dp strengths.
    // fixed-seed generation: a failing duel table must be replayable
    // (unseeded Gen.sample.get gave fresh data per run and could
    // throw NoSuchElementException on retryUntil exhaustion)
    val players = Seq("A", "B", "C", "D")
    val rnd = new scala.util.Random(0x5eed8L)
    val pairs = List.fill(60)(
      (players(rnd.nextInt(players.size)),
        players(rnd.nextInt(players.size))))
      .filter { case (w, l) => w != l }
    assert(pairs.nonEmpty)
    val duels = pairs.toDF("w", "l")
    def strengths(weight: org.apache.spark.sql.Column) =
      graft.ops.Pref.bradleyTerry(duels, col("w"), col("l"), weight)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val base = strengths(lit(1.0))
    for (c <- Seq(2.0, 0.5, 10.0)) {
      val scaled = strengths(lit(c))
      base.foreach { case (item, w) =>
        assert(math.abs(scaled(item) - w) <= 1e-5,
          s"c=$c, $item: $w vs ${scaled(item)}") }
      // counts DO scale: n_duels multiplies by exactly c
      val nd = graft.ops.Pref.bradleyTerry(duels, col("w"), col("l"),
          lit(c)).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val nd1 = graft.ops.Pref.bradleyTerry(duels, col("w"), col("l"),
          lit(1.0)).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      nd1.foreach { case (item, n) =>
        assert(math.abs(nd(item) - c * n) <= 1e-6, s"c=$c, $item") }
    }
  }

  test("snappedSum: the long fast-path guard — terms whose scaled " +
    "value passes 2^63 fall back to the exact decimal cast instead of " +
    "saturating; NaN terms drop; in-domain terms are unchanged") {
    import spark.implicits._
    import graft.expr.Snap
    // in-domain: plain snapped sum
    val small = Seq(1.25, -2.5, 0.000000001).toDF("x")
    val s1 = small.agg(Snap.snappedSum(col("x"), 1e9).as("s"))
      .collect()(0).getDouble(0)
    assert(math.abs(s1 - (-1.249999999)) < 1e-9, s"in-domain: $s1")
    // out-of-domain: 1e10 at grid 1e9 scales to 1e19 > 2^63 ≈ 9.22e18.
    // A saturating long cast would read Long.MaxValue/1e9 ≈ 9.223e9;
    // the guarded fallback must read exactly 1e10 (+ the small term)
    val big = Seq(1e10, 0.5).toDF("x")
    val s2 = big.agg(Snap.snappedSum(col("x"), 1e9).as("s"))
      .collect()(0).getDouble(0)
    assert(math.abs(s2 - 1.00000000005e10) < 1e-6,
      s"guarded fallback must not saturate: $s2")
    // NaN: ignored by SUM via the NULL fallback (the pre-fast-path
    // behavior), never the long cast's NaN -> 0 counted as a term
    val withNan = Seq(Double.NaN, 2.0).toDF("x")
    val s3 = withNan.agg(Snap.snappedSum(col("x"), 1e9).as("s"))
      .collect()(0).getDouble(0)
    assert(s3 == 2.0, s"NaN must drop, not zero-contribute: $s3")
  }

  test("snappedSumDriver ≡ the snappedSum column aggregate on a " +
    "hostile term set (fast-path doubles, ≥2^63 fallback values, " +
    "decimal-overflow drops, NaN/Inf drops, random mixes)") {
    import spark.implicits._
    import graft.expr.Snap
    val rng = new java.util.Random(99)
    val hostile = Seq(1.25, -2.5, 1e-9, 0.0, -0.0, 1e10, -1e10,
      9.3e9, 1.2345678901234567e10, 1e30, -1e30, 1e40, -1e40,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val random = (1 to 500).map { _ =>
      rng.nextInt(3) match {
        case 0 => (rng.nextDouble() - 0.5) * 4
        case 1 => (rng.nextDouble() - 0.5) * 2e10
        case _ => (rng.nextDouble() - 0.5) * 2e25
      }
    }
    for (grid <- Seq(1e9, 1e6)) {
      for (xs <- Seq(hostile, random, hostile ++ random)) {
        val viaCol = xs.toDF("x")
          .agg(Snap.snappedSum(col("x"), grid).as("s"))
          .collect()(0).getDouble(0)
        val viaDrv = Snap.snappedSumDriver(xs.iterator, grid)
        assert(java.lang.Double.compare(viaCol, viaDrv) == 0,
          s"grid=$grid: col=$viaCol driver=$viaDrv over ${xs.take(8)}…")
      }
    }
  }

  test("snappedSumOver: an ORDER BY'd window spec still yields the " +
    "WHOLE-partition sum — the forced full frame (ADVICE r13), not " +
    "the default running frame") {
    import spark.implicits._
    import graft.expr.Snap
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 1, 1.5), ("a", 2, 2.25), ("a", 3, 4.0),
      ("b", 1, 10.0)).toDF("g", "ord", "x")
    val ordered = Window.partitionBy(col("g")).orderBy(col("ord"))
    val r = df.withColumn("z", Snap.snappedSumOver(col("x"), 1e9, ordered))
      .select(col("g"), col("ord"), col("z")).collect()
      .map(row => (row.getString(0), row.getInt(1)) -> row.getDouble(2))
      .toMap
    // under the DEFAULT frame row ("a", 1) would read 1.5 (running);
    // the forced frame reads the full-partition 7.75 everywhere
    assert(r(("a", 1)) == 7.75 && r(("a", 2)) == 7.75 &&
      r(("a", 3)) == 7.75, r.toString)
    assert(r(("b", 1)) == 10.0, r.toString)
  }
}
