package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality

/** Declarative quality checks: exact violation counts, one-pass report
  * shape, null semantics, referential integrity. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), 10.0),
    (Some(2L), None, -5.0),        // null name, value below range
    (Some(2L), Some("zz"), 2000.0), // dup id, name not allowed, above range
    (None, Some("b"), 50.0))        // null id
    .toDF("id", "name", "v")

  test("report: each check counts exactly its violations, pass derives") {
    val rep = Quality.report(df, Seq(
      Quality.notNull("id not_null", col("id")),
      Quality.unique("id unique", col("id")),
      Quality.notNull("name not_null", col("name")),
      Quality.inRange("v in [0,1000]", col("v"), 0d, 1000d),
      Quality.inSet("name allowed", col("name"), Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(rep("id not_null") == ((1L, false)))
    assert(rep("id unique") == ((1L, false))) // ids 1,2,2 → one extra 2
    assert(rep("name not_null") == ((1L, false)))
    assert(rep("v in [0,1000]") == ((2L, false)))
    // NULL name is not an inSet violation (notNull's job)
    assert(rep("name allowed") == ((1L, false)))
  }

  test("report on a clean table passes everything; empty table too") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val checks = Seq(Quality.notNull("nn", col("id")),
      Quality.unique("uq", col("id")))
    assert(Quality.report(clean, checks).collect()
      .forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
    // empty input: aggregates coalesce to zero violations, never NULL
    assert(Quality.report(clean.limit(0), checks).collect()
      .forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("referential: orphans counted, NULL child keys exempt") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Quality.referential("fk refs pk", child, col("fk"),
      parent, col("pk")).collect()(0)
    assert(r.getString(0) == "fk refs pk")
    assert(r.getLong(1) == 1L) // only the 9 — NULL is exempt
    assert(!r.getBoolean(2))
  }

  test("q141 corrupt-ingest accounting: NULL-on-fail parse counts " +
    "exactly the truncated lines, per language") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q141_corrupt_ingest")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // cross-check against the source table: bad == docs with id % 7 == 0
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("bad"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == expected)
    assert(out.values.map(_._2).sum > 0L) // the corruption really fired
  }

  test("nbConfusion: separable classes classify to the diagonal; an " +
    "ambiguous doc follows the stronger class evidence; rows sum to " +
    "the doc count") {
    import graft.ops.Quality
    // class 'aa' speaks {foo bar}, class 'bb' speaks {baz qux}; doc 5
    // is labeled bb but speaks pure aa → off-diagonal (bb, aa)
    val docs = Seq(
      (1L, "foo bar foo", "aa"), (2L, "bar foo bar", "aa"),
      (3L, "baz qux baz", "bb"), (4L, "qux baz qux", "bb"),
      (5L, "foo bar foo bar", "bb"))
      .toDF("doc_id", "text", "lang")
    val r = Quality.nbConfusion(docs, col("doc_id"), col("text"), col("lang"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(("aa", "aa") -> 2L, ("bb", "bb") -> 2L,
      ("bb", "aa") -> 1L))
    assert(r.values.sum == 5L)
    // partition-invariance: the snapped sums make the argmax stable
    val r7 = Quality.nbConfusion(docs.repartition(7), col("doc_id"),
      col("text"), col("lang"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r7 == r)
  }

  test("nbClassify ∘ nbTrain reproduces nbConfusion's matrix (the " +
    "split-model serving path scores identically to the fused query)") {
    import graft.ops.Quality
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Quality.nbTrain(docs, col("doc_id"), col("text"), col("lang"))
    val viaSplit = Quality.nbClassify(model, docs, col("doc_id"), col("text"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lab").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    val fused = Quality.nbConfusion(docs, col("doc_id"), col("text"),
      col("lang"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(viaSplit == fused)
  }

  test("startLangRouteSink: union of per-batch routings ≡ batch " +
    "classification of the unioned docs; empty batches skipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Quality
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Quality.nbTrain(docs, col("doc_id"), col("text"), col("lang"))
    val arriving = docs.filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val routed = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = graft.stream.StreamClassify.startLangRouteSink(model,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      java.nio.file.Files.createTempDirectory("nb-ckpt").toString,
      (df, epoch) => routed.synchronized {
        routed(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(arriving.take(arriving.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(arriving.drop(arriving.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = routed.synchronized(routed.values.flatten.toSeq.sorted)
    val expected = Quality.nbClassify(model,
        docs.filter(col("doc_id") < 40), col("doc_id"), col("text"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(routed.synchronized(routed.size) == 2)
  }

  test("nbConfusion: symmetric evidence ties break label-ascending") {
    // both classes have identical token statistics and priors: every
    // score ties, so every doc predicts the lexicographically first lab
    val docs = Seq(
      (1L, "tok tok", "xx"), (2L, "tok tok", "yy"))
      .toDF("doc_id", "text", "lang")
    val r = graft.ops.Quality.nbConfusion(docs, col("doc_id"),
      col("text"), col("lang"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(("xx", "xx") -> 1L, ("yy", "xx") -> 1L))
  }

  test("rankAuc: tie-aware Mann–Whitney by hand; one-vs-rest AUCs of " +
    "two groups sum to 1; partition-invariant") {
    // A: 1,2,3  B: 1,2,2 → avg ranks 1.5 / 4 / 6; R_A = 11.5, R_B = 9.5
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 1.0), ("B", 2.0), ("B", 2.0)).toDF("g", "s")
    val got = Quality.rankAuc(df, col("g"), col("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("A") == ((3L, 0.611111)))
    assert(got("B") == ((3L, 0.388889)))
    assert(math.abs(got("A")._2 + got("B")._2 - 1.0) < 1e-9)
    // perfect separation → exactly 1 and 0
    val sep = Quality.rankAuc(Seq(("hi", 10.0), ("hi", 20.0),
        ("lo", 1.0), ("lo", 2.0)).toDF("g", "s"), col("g"), col("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(sep == Map("hi" -> 1.0, "lo" -> 0.0))
    val got7 = Quality.rankAuc(df.repartition(7), col("g"), col("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got7 == got)
  }

  test("nbPosteriors: per-doc probs sum to ~1 and the max-prob label " +
    "is the nbClassify prediction") {
    val docs = Seq(
      (1L, "cat cat dog", "aa"), (2L, "dog dog dog", "bb"),
      (3L, "cat dog cat", "aa"), (4L, "dog cat dog", "bb"),
      (5L, "cat cat cat", "aa"))
      .toDF("doc_id", "text", "lang")
    val model = Quality.nbTrain(docs, col("doc_id"), col("text"), col("lang"))
    val post = Quality.nbPosteriors(model, docs, col("doc_id"), col("text"))
      .collect()
    post.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val z = rows.map(_.getDouble(2)).sum
      assert(math.abs(z - 1.0) < 1e-4, s"prob sum $z")
    }
    val argmaxByProb = post.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.maxBy(r => (r.getDouble(2), r.getString(1)))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String.reverse))
        .getString(1)
    }
    val pred = Quality.nbClassify(model, docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(argmaxByProb == pred)
  }

  test("madOutlierReport: modified z by hand — one gross outlier " +
    "flagged, the median/MAD untouched by it; MAD=0 groups flag " +
    "nothing; partition-invariant") {
    val df = Seq("g1" -> 1.0, "g1" -> 2.0, "g1" -> 3.0, "g1" -> 4.0,
      "g1" -> 100.0, "g2" -> 5.0, "g2" -> 5.0, "g2" -> 5.0, "g2" -> 9.0)
      .toDF("g", "x")
    val r = Quality.madOutlierReport(df, col("g"), col("x"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getLong(4), x.getDouble(5)))).toMap
    // g1: med=3, ads=[2,1,0,1,97], mad=1 → only the 100 flags
    assert(r("g1") == ((5L, 3.0, 1.0, 1L, 0.2)))
    // g2: med=5, mad=0 → degenerate, the 9 does NOT flag
    assert(r("g2") == ((4L, 5.0, 0.0, 0L, 0.0)))
    val r7 = Quality.madOutlierReport(df.repartition(7), col("g"), col("x"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r7 == r)
  }

  test("cohenKappa: hand 2x2 case; perfect agreement is 1; the " +
    "one-class degenerate case yields NULL (pe = 1)") {
    val conf = Seq(("a", "a", 20L), ("a", "b", 5L), ("b", "a", 10L),
      ("b", "b", 15L)).toDF("act", "prd", "n")
    val r = Quality.cohenKappa(conf, col("act"), col("prd"), col("n"))
      .collect()(0)
    // N=50, po=35/50=0.7; rows 25/25, cols 30/20 → pe=0.5 → κ=0.4
    assert(r.getLong(0) == 50L && r.getDouble(1) == 0.7 &&
      r.getDouble(2) == 0.5 && r.getDouble(3) == 0.4)
    val perfect = Quality.cohenKappa(
      Seq(("a", "a", 7L), ("b", "b", 3L)).toDF("act", "prd", "n"),
      col("act"), col("prd"), col("n")).collect()(0)
    assert(perfect.getDouble(3) == 1.0)
    val oneClass = Quality.cohenKappa(
      Seq(("a", "a", 9L)).toDF("act", "prd", "n"),
      col("act"), col("prd"), col("n")).collect()(0)
    assert(oneClass.isNullAt(3), "pe=1 must yield NULL kappa, not a crash")
  }

  test("psiDrift: identical halves give psi = 0 exactly; a shifted " +
    "group crosses the 0.25 alarm; a one-sided group is NULL (the " +
    "ksDrift undefined convention); partition-invariant") {
    import graft.ops.Analytics
    val base = (1 to 50).map(i => ("s1", i.toDouble)) ++
      (1 to 50).map(i => ("s2", i.toDouble))
    val shifted = (1 to 50).map(i => ("s1", i.toDouble)) ++
      (1 to 50).map(i => ("s2", i.toDouble + 40.0)) ++
      Seq.fill(20)(("s3", 10.0))
    val e = base.toDF("g", "x")
    val a = shifted.toDF("g", "x")
    val same = Analytics.psiDrift(e, e.repartition(5), col("g"), col("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(same.values.forall(_ == 0.0), s"identical halves drifted: $same")
    val r = Analytics.psiDrift(e, a, col("g"), col("x"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    assert(r("s1")._3.get < r("s2")._3.get,
      "shifted group must out-drift stable")
    assert(r("s2")._3.get > 0.25, s"40-point shift under the alarm: ${r("s2")}")
    // s3 exists ONLY in the actual half: no expected distribution, so
    // PSI is undefined -> NULL (pre-guard, smoothing scored it against
    // an implicit uniform and reported a finite, misleading number)
    assert(r("s3")._1 == 0L && r("s3")._2 == 20L && r("s3")._3.isEmpty)
    val r7 = Analytics.psiDrift(e.repartition(7), a.repartition(3),
        col("g"), col("x"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    assert(r7 == r)
  }

  test("ksDrift: hand ECDF case (D=0.5 on half-shifted supports); " +
    "identical halves give D=0; partition-invariant") {
    import graft.ops.Analytics
    val e = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("g", "x")
    val a = Seq(("g", 3.0), ("g", 4.0), ("g", 5.0), ("g", 6.0)).toDF("g", "x")
    val r = Analytics.ksDrift(e, a, col("g"), col("x")).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5)
    // sqrt(4*4/8) * 0.5 = sqrt(2)/2
    assert(r.getDouble(4) == BigDecimal(math.sqrt(2.0) * 0.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val same = Analytics.ksDrift(e, e.repartition(3), col("g"), col("x"))
      .collect()(0)
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0)
    val r7 = Analytics.ksDrift(e.repartition(7), a.repartition(2),
      col("g"), col("x")).collect()(0)
    assert(r7.toString == r.toString)
    // a group with rows in only one half: D is undefined -> NULL, not NaN
    val oneSided = Analytics.ksDrift(e,
        e.unionByName(Seq(("h", 1.0)).toDF("g", "x")), col("g"), col("x"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(oneSided("h").isNullAt(3) && oneSided("h").isNullAt(4))
    assert(oneSided("g").getDouble(3) == 0.0) // identical halves stay 0
  }

  test("cvmDrift: hand pooled-ECDF case T=0.34375 on half-shifted " +
    "supports; identical halves 0; one-sided NULL; partition-invariant") {
    import graft.ops.Analytics
    val e = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("g", "x")
    val a = Seq(("g", 3.0), ("g", 4.0), ("g", 5.0), ("g", 6.0)).toDF("g", "x")
    val r = Analytics.cvmDrift(e, a, col("g"), col("x")).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    // diffs .25,.5,.5,.5,.25,0 with multiplicities 1,1,2,2,1,1:
    // Σ w·d² = 1.375; T = (4·4/64)·1.375 = 0.34375 — under the 0.461
    // α=.05 critical, so reject=false
    assert(r.getDouble(3) == 0.34375 && !r.getBoolean(4))
    val same = Analytics.cvmDrift(e, e.repartition(3), col("g"), col("x"))
      .collect()(0)
    assert(same.getDouble(3) == 0.0 && !same.getBoolean(4))
    val r7 = Analytics.cvmDrift(e.repartition(7), a.repartition(2),
      col("g"), col("x")).collect()(0)
    assert(r7.toString == r.toString)
    val oneSided = Analytics.cvmDrift(e,
        e.unionByName(Seq(("h", 1.0)).toDF("g", "x")), col("g"), col("x"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(oneSided("h").isNullAt(3) && oneSided("h").isNullAt(4))
  }

  test("wassersteinDrift: a constant shift of c has W1 exactly c; " +
    "identical halves 0; one-sided NULL; partition-invariant") {
    import graft.ops.Analytics
    val e = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("g", "x")
    val a = Seq(("g", 3.0), ("g", 4.0), ("g", 5.0), ("g", 6.0)).toDF("g", "x")
    val r = Analytics.wassersteinDrift(e, a, col("g"), col("x")).collect()(0)
    // |CDF diffs| .25,.5,.5,.5,.25 on unit gaps → 2.0 = the shift
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L && r.getDouble(3) == 2.0)
    val same = Analytics.wassersteinDrift(e, e.repartition(3), col("g"),
      col("x")).collect()(0)
    assert(same.getDouble(3) == 0.0)
    val r7 = Analytics.wassersteinDrift(e.repartition(7), a.repartition(2),
      col("g"), col("x")).collect()(0)
    assert(r7.toString == r.toString)
    val oneSided = Analytics.wassersteinDrift(e,
        e.unionByName(Seq(("h", 1.0)).toDF("g", "x")), col("g"), col("x"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(oneSided("h").isNullAt(3))
  }

  test("startPsiDriftSink: each epoch's report ≡ batch psiDrift of " +
    "(reference, that batch); empty batches skipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Analytics
    val reference = (1 to 40).map(i => ("s1", (i % 10).toDouble)).toDF("g", "x")
    val b1 = (1 to 10).map(i => ("s1", (i % 10).toDouble + 3.0))
    val b2 = (1 to 10).map(i => ("s1", (i % 5).toDouble))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    val out = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = graft.stream.StreamCuration.startPsiDriftSink(reference,
      ms.toDF().toDF("g", "x"), "g", "x", 10,
      java.nio.file.Files.createTempDirectory("psi-ckpt").toString,
      (df, epoch) => out.synchronized {
        out(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val epochs = out.synchronized(out.toMap)
    assert(epochs.size == 2)
    val want1 = Analytics.psiDrift(reference, b1.toDF("g", "x"),
      col("g"), col("x")).collect().map(_.toString).sorted.toSeq
    val want2 = Analytics.psiDrift(reference, b2.toDF("g", "x"),
      col("g"), col("x")).collect().map(_.toString).sorted.toSeq
    assert(epochs(epochs.keys.min) == want1)
    assert(epochs(epochs.keys.max) == want2)
  }

  test("startCupedSink: final emission ≡ batch cupedAdjust over all " +
    "events, under shuffled batch splits (snapped-decimal state merge)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    val cut = "2024-01-16 00:00:00"
    // (unit, ts, value): pre- and post-cut events per user, values
    // with fractional parts so the snapping discipline is exercised
    val all = Seq(
      ("1", "2024-01-10 00:00:00", 1.25), ("1", "2024-01-20 00:00:00", 2.5),
      ("2", "2024-01-11 00:00:00", 3.75), ("2", "2024-01-21 00:00:00", 1.1),
      ("3", "2024-01-12 00:00:00", 2.2), ("3", "2024-01-22 00:00:00", 4.4),
      ("4", "2024-01-13 00:00:00", 0.9), ("4", "2024-01-23 00:00:00", 3.3))
    def run(batches: Seq[Seq[(String, String, Double)]]): Seq[String] = {
      val ms = MemoryStream[(String, String, Double)]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamCuration.startCupedSink(
        ms.toDF().toDF("u", "ts", "v"), "u", "ts", "v", cut,
        java.nio.file.Files.createTempDirectory("cuped-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.collect().map(_.toString).sorted.toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val units = all.toDF("u", "ts", "v")
      .groupBy(col("u")).agg(
        graft.expr.Snap.snappedSum(when(col("ts").cast("timestamp") <
          lit(cut).cast("timestamp"), col("v")).otherwise(lit(0.0)), 1e9)
          .as("x"),
        graft.expr.Snap.snappedSum(when(col("ts").cast("timestamp") >=
          lit(cut).cast("timestamp"), col("v")).otherwise(lit(0.0)), 1e9)
          .as("y"))
    val isA = pmod(conv(substring(md5(col("u").cast("string")), 1, 8),
      16, 10).cast("long"), lit(100L)) < 50
    val want = Analytics.cupedAdjust(units, isA, col("x"), col("y"))
      .collect().map(_.toString).sorted.toSeq
    // a user's pre and post events arriving in DIFFERENT batches, in
    // different orders — the decimal state merge makes both equal the
    // one-shot batch computation
    val a = run(Seq(all.take(3), all.slice(3, 6), all.drop(6)))
    val b = run(Seq(Seq(all(7), all(0)), Seq(all(5), all(2), all(4)),
      Seq(all(1), all(6), all(3))))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
  }

  test("startCusumSink: stream state after N epochs ≡ batch cusumDrift " +
    "step N under the same fixed reference rate; absent groups take " +
    "no step") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val out = scala.collection.mutable.Map[Long, Map[String, (Double, Boolean)]]()
    val q = graft.stream.StreamCuration.startCusumSink(
      ms.toDF().toDF("g", "n"), "g", "n", mu = 10.0, slack = 0.1,
      hMult = 0.5,
      java.nio.file.Files.createTempDirectory("cusum-ckpt").toString,
      (df, epoch) => out.synchronized {
        out(epoch) = df.collect().map(r => r.getString(0) ->
          ((r.getDouble(2), r.getBoolean(3)))).toMap
      })
    try {
      // epoch 1: g quiet, h bursts; epoch 2: g bursts, h absent
      ms.addData(Seq(("g", 4L), ("g", 6L), ("h", 30L)))
      q.processAllAvailable()
      ms.addData(Seq(("g", 25L)))
      q.processAllAvailable()
    } finally q.stop()
    val epochs = out.synchronized(out.toMap)
    assert(epochs.size == 2)
    val e1 = epochs(epochs.keys.min); val e2 = epochs(epochs.keys.max)
    assert(e2.keySet == Set("g")) // h absent -> no step, no report
    // batch replay over the union with the SAME offline reference
    val batch = Analytics.cusumDrift(
      Seq(("g", 1, 10L), ("g", 2, 25L), ("h", 1, 30L))
        .toDF("grp", "step", "x"),
      col("grp"), col("step"), col("x"), mu0 = Some(10.0))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(e1("g") == batch(("g", 1)) && e1("h") == batch(("h", 1)))
    assert(e2("g") == batch(("g", 2)))
    // the burst actually alarms (h epoch 1, g epoch 2)
    assert(e1("h")._2 && e2("g")._2 && !e1("g")._2)
  }

  test("calibrationReport: bins, means, accuracy and gap by hand; " +
    "conf = 1.0 clamps into the top bin") {
    val preds = Seq((0.95, true), (0.85, false), (0.85, true), (1.0, true))
      .toDF("conf", "ok")
    val rep = Quality.calibrationReport(preds, col("conf"), col("ok"), 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rep.keySet == Set(8L, 9L))
    assert(rep(8L) == ((2L, 0.85, 0.5, 0.35)))
    assert(rep(9L) == ((2L, 0.975, 1.0, 0.025)))
  }

  test("isotonicCalibration: PAV pools the violating bins to the " +
    "pooled rate; monotone input unchanged; output always monotone") {
    // 4 bins with raw rates .2, .6, .4, .8 and equal mass: PAV pools
    // bins 1 and 2 to (3+2)/10 = 0.5
    val preds = (Seq.fill(1)((0.1, true)) ++ Seq.fill(4)((0.1, false)) ++
      Seq.fill(3)((0.35, true)) ++ Seq.fill(2)((0.35, false)) ++
      Seq.fill(2)((0.6, true)) ++ Seq.fill(3)((0.6, false)) ++
      Seq.fill(4)((0.85, true)) ++ Seq.fill(1)((0.85, false)))
      .toDF("conf", "ok")
    val r = Quality.isotonicCalibration(preds, col("conf"), col("ok"), 4)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(0L) == ((0.2, 0.2)) && r(1L) == ((0.6, 0.5)) &&
      r(2L) == ((0.4, 0.5)) && r(3L) == ((0.8, 0.8)))
    // already-monotone input: iso ≡ raw
    val mono = (Seq.fill(1)((0.1, true)) ++ Seq.fill(4)((0.1, false)) ++
      Seq.fill(3)((0.6, true)) ++ Seq.fill(2)((0.6, false)))
      .toDF("conf", "ok")
    val m = Quality.isotonicCalibration(mono, col("conf"), col("ok"), 4)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(3), x.getDouble(4)))).toMap
    assert(m(0L) == ((0.2, 0.2)) && m(2L) == ((0.6, 0.6)))
    // monotonicity is structural: sorted by bin, iso never decreases
    val seq = Quality.isotonicCalibration(preds.repartition(7),
        col("conf"), col("ok"), 4)
      .orderBy(col("bin")).collect().map(_.getDouble(4)).toSeq
    assert(seq == seq.sorted)
  }

  test("splitConformal: q̂ is the exact ⌈(n+1)(1−α)⌉-th calibration " +
    "residual and coverage replays scalar-side; starved cal → NULL " +
    "q̂, coverage 1") {
    val df = (1 to 300).map(i => ("g", (i % 23).toDouble, i.toLong))
      .toDF("grp", "y", "id")
    val r = Quality.splitConformal(df, col("grp"), col("y"), col("id"),
      alpha = 0.5).collect().head
    // independent scalar replay of the whole pipeline
    val base = df.select(col("grp"), col("y"),
        pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(3L)).as("role"))
      .collect().map(x => (x.getDouble(1), x.getLong(2)))
    val tr = base.filter(_._2 == 0L).map(_._1)
    val yhat = tr.map(v => math.floor(v * 1e9 + 0.5)).sum / 1e9 / tr.length
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val cal = base.filter(_._2 == 1L).map(v => r6(math.abs(v._1 - yhat)))
      .sorted
    val need = math.ceil((cal.length + 1).toDouble * (1.0 - 0.5)).toInt
    val qhat = cal(need - 1)
    val te = base.filter(_._2 == 2L).map(v => r6(math.abs(v._1 - yhat)))
    val cov = te.count(_ <= qhat).toDouble / te.length
    assert(r.getLong(1) == tr.length.toLong &&
      r.getLong(2) == cal.length.toLong && r.getLong(3) == te.length.toLong)
    assert(r.getDouble(4) == qhat)
    assert(r.getDouble(5) == r6(cov) && r.getDouble(6) == 0.5)
    // α so strict the finite-sample rank exceeds n_cal: the interval
    // is the whole line — q̂ NULL, coverage exactly 1
    val starved = Quality.splitConformal(df, col("grp"), col("y"),
      col("id"), alpha = 0.001).collect().head
    assert(starved.isNullAt(4) && starved.getDouble(5) == 1.0)
  }

  test("captureRecapture: Chapman point and Seber variance by hand; " +
    "duplicate rows in a catch don't inflate it") {
    import graft.ops.TextDedup
    val a = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 5L))
      .toDF("doc_a", "doc_b") // dup row collapses
    val b = Seq((1L, 2L), (4L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val r = TextDedup.captureRecapture(a, b, "doc_a", "doc_b")
      .collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == r6(5.0 * 4.0 / 3.0 - 1.0))
    assert(r.getDouble(4) ==
      r6(math.sqrt(5.0 * 4.0 * 2.0 * 1.0 / (3.0 * 3.0 * 4.0))))
  }

  test("youdenThreshold: hand ROC sweep picks the J-max operating " +
    "point; J ties break to the LOWEST threshold; one-class NULL") {
    val preds = Seq((0.9, true), (0.8, true), (0.6, true),
      (0.7, false), (0.4, false), (0.3, false), (0.1, false))
      .toDF("s", "pos")
    val r = Quality.youdenThreshold(preds, col("s"), col("pos"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.6 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 0.25 && r.getDouble(5) == 0.75)
    assert(r.getDouble(6) == BigDecimal(6.0 / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // J = 0.5 at both t = 1.0 and t = 0.5: accept-more wins
    val tie = Quality.youdenThreshold(
      Seq((1.0, true), (0.5, true), (0.7, false), (0.2, false))
        .toDF("s", "pos"), col("s"), col("pos")).collect().head
    assert(tie.getDouble(2) == 0.5)
    val oneClass = Quality.youdenThreshold(
      Seq((0.9, true), (0.4, true)).toDF("s", "pos"), col("s"),
      col("pos")).collect().head
    assert(oneClass.isNullAt(2) && oneClass.isNullAt(5))
  }

  test("delongAuc: tie-aware placements give the hand AUC and DeLong " +
    "se; perfect separation has se 0; tiny classes NULL") {
    val preds = Seq((0.8, true), (0.4, true), (0.8, false), (0.2, false))
      .toDF("s", "pos")
    val r = Quality.delongAuc(preds, col("s"), col("pos")).collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // V10 = {.75, .5}, V01 = {.25, 1}: AUC = .625,
    // var = .03125/2 + .28125/2 = .15625
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.625)
    assert(r.getDouble(3) == r6(math.sqrt(0.15625)))
    val perfect = Quality.delongAuc(
      Seq((0.9, true), (0.8, true), (0.7, false), (0.6, false))
        .toDF("s", "pos"), col("s"), col("pos")).collect().head
    assert(perfect.getDouble(2) == 1.0 && perfect.getDouble(3) == 0.0 &&
      perfect.getDouble(4) == 1.0 && perfect.getDouble(5) == 1.0)
    val tiny = Quality.delongAuc(
      Seq((0.9, true), (0.7, false), (0.6, false)).toDF("s", "pos"),
      col("s"), col("pos")).collect().head
    assert(tiny.isNullAt(2) && tiny.isNullAt(3))
  }

  test("randomizationTest: a null effect keeps p near 1; an effect " +
    "aligned with the observed split is never re-beaten (p = 1/(R+1))") {
    import graft.ops.Analytics
    val flat = (1 to 16).map(i => (i.toLong, 5.0)).toDF("u", "y")
    val arm = pmod(conv(substring(md5(col("u").cast("string")), 1, 8),
      16, 10).cast("long"), lit(100L)) < 50
    val r0 = Analytics.randomizationTest(flat, col("u"), col("y"), arm)
      .collect().head
    assert(r0.getLong(1) == 199L && r0.getDouble(2) == 0.0)
    assert(r0.getDouble(4) >= 0.9 && !r0.getBoolean(5))
    // y IS the observed arm: no relabeling re-separates it exactly
    val strong = (1 to 40).map(_.toLong).toDF("u")
      .select(col("u"), when(pmod(conv(substring(
        md5(col("u").cast("string")), 1, 8), 16, 10).cast("long"),
        lit(100L)) < 50, 10.0).otherwise(0.0).as("y"))
    val r1 = Analytics.randomizationTest(strong, col("u"), col("y"), arm)
      .collect().head
    assert(r1.getDouble(2) == 10.0 && r1.getLong(3) == 0L &&
      r1.getDouble(4) == 0.005 && r1.getBoolean(5))
  }

  test("obrienFleming: hand z trajectory z_k = sqrt(2(2k-1)) crosses " +
    "the OBF bounds exactly where expected; exact day cutoffs") {
    import graft.ops.Analytics
    // 5 days, per day 2 A rows (10, 12) and 2 B rows (8, 10):
    // diff = 2, se_k = sqrt(2/(2k-1))
    val rows = for {
      d <- 1 to 5; (y, a) <- Seq((10.0, true), (12.0, true),
        (8.0, false), (10.0, false))
    } yield (s"2024-01-0$d 00:00:00", y, a)
    val df = rows.toDF("ts", "y", "arm")
      .select(col("ts").cast("timestamp").as("ts"), col("y"), col("arm"))
    val r = Analytics.obrienFleming(df, col("ts"), col("y"), col("arm"))
      .collect().map(x => x.getLong(0) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    for (k <- 1 to 5) {
      val row = r(k.toLong)
      assert(row.getLong(1) == 19722L + k, s"day_cut at look $k")
      assert(row.getLong(2) == 2L * k && row.getLong(3) == 2L * k)
      assert(row.getDouble(4) == 2.0)
      assert(row.getDouble(5) == r6(math.sqrt(2.0 * (2 * k - 1))),
        s"z at look $k")
    }
    // sqrt(2)=1.41 < 4.562; sqrt(6)=2.45 < 3.226; sqrt(10)=3.16 > 2.634
    assert(!r(1L).getBoolean(7) && !r(2L).getBoolean(7))
    assert(r(3L).getBoolean(7) && r(4L).getBoolean(7) &&
      r(5L).getBoolean(7))
  }

  test("meanSampleSize: hand moments give the Cohen n and Lehr " +
    "cross-check; zero variance NULL") {
    import graft.ops.Analytics
    val units = (1 to 16).map(i => if (i % 2 == 0) 12.0 else 8.0)
      .toDF("y")
    val r = Analytics.meanSampleSize(units, col("y")).collect().head
    val v = 64.0 / 15.0
    val z = 1.959964 + 0.841621
    assert(r.getLong(0) == 16L && r.getDouble(1) == 10.0)
    assert(r.getDouble(3) == 0.5)
    assert(r.getLong(4) == math.ceil(2.0 * (z * z) * v / 0.25).toLong)
    assert(r.getLong(5) == math.ceil(16.0 * v / 0.25).toLong)
    val const = Analytics.meanSampleSize(
      Seq(5.0, 5.0, 5.0).toDF("y"), col("y")).collect().head
    assert(const.isNullAt(4) && const.isNullAt(5))
  }

  test("startDelongSink: each emission ≡ batch delongAuc over all " +
    "arrived rows, under shuffled batch splits (additive grid state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all: Seq[(Double, Boolean)] = Seq((0.9, true), (0.8, true),
      (0.8, false), (0.6, true), (0.4, true), (0.4, false), (0.2, false),
      (0.1, false), (0.7, true), (0.3, false))
    def run(batches: Seq[Seq[(Double, Boolean)]]): Seq[String] = {
      val ms = MemoryStream[(Double, Boolean)]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamCuration.startDelongSink(
        ms.toDF().toDF("s", "pos"), "s", "pos",
        java.nio.file.Files.createTempDirectory("dl-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.collect().map(_.toString).toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val want = Quality.delongAuc(all.toDF("s", "pos"), col("s"),
      col("pos")).collect().map(_.toString).toSeq
    val a = run(Seq(all.take(4), all.slice(4, 7), all.drop(7)))
    val b = run(Seq(all.reverse.take(6), all.reverse.drop(6)))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
  }

  test("startBenfordSink: each emission ≡ batch benfordReport over " +
    "all arrived values, incl. the NULL skipped bucket, under splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all: Seq[Double] = Seq(1.0, 2.5, 19.99, 0.3, -5.0, 0.0, 900.0,
      3.2, 0.11, 77.0, -1.0, 12.0)
    def run(batches: Seq[Seq[Double]]): Seq[String] = {
      val ms = MemoryStream[Double]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamCuration.startBenfordSink(
        ms.toDF().toDF("v"), "v",
        java.nio.file.Files.createTempDirectory("bf-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.orderBy(col("digit")).collect()
            .map(_.toString).toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val want = Quality.benfordReport(all.toDF("v"), col("v"))
      .orderBy(col("digit")).collect().map(_.toString).toSeq
    val a = run(Seq(all.take(5), all.slice(5, 9), all.drop(9)))
    val b = run(Seq(all.reverse.take(7), all.reverse.drop(7)))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
    // the skip accounting survived the merge: 3 non-positive values
    assert(want.head.contains(",3]"))
  }

  test("cohensH: hand 0.5-vs-0.1 case is 'large'; equal arms 0 " +
    "'negligible'; empty arm NULL") {
    val u = ((1 to 10).map(i => (true, i <= 5)) ++
      (1 to 10).map(i => (false, i <= 1))).toDF("a", "conv")
    val r = Quality.cohensH(u, col("a"), col("conv")).collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.1)
    assert(r.getDouble(4) ==
      r6(2.0 * math.asin(math.sqrt(0.5)) - 2.0 * math.asin(math.sqrt(0.1))))
    assert(r.getString(5) == "large")
    val eq = ((1 to 5).map(i => (true, i <= 2)) ++
      (1 to 5).map(i => (false, i <= 2))).toDF("a", "conv")
    val re = Quality.cohensH(eq, col("a"), col("conv")).collect().head
    assert(re.getDouble(4) == 0.0 && re.getString(5) == "negligible")
    val one = (1 to 5).map(i => (true, i <= 2)).toDF("a", "conv")
    assert(Quality.cohensH(one, col("a"), col("conv"))
      .collect().head.isNullAt(4))
  }

  test("rbpScore: hand list (rel at ranks 1 and 3, p=0.8) scores " +
    "0.328 with residual 0.8^5; empty relevance scores 0") {
    val ranked = Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (5L, false)).toDF("rank", "rel")
    val r = Quality.rbpScore(ranked, col("rank"), col("rel")).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.328)
    assert(r.getDouble(3) == BigDecimal(math.pow(0.8, 5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val none = Quality.rbpScore(
      Seq((1L, false), (2L, false)).toDF("rank", "rel"),
      col("rank"), col("rel")).collect().head
    assert(none.getDouble(2) == 0.0)
  }

  test("clarityScore: a collection-in-miniature query scores exactly " +
    "0 bits; a concentrated topical query scores well above 0") {
    import graft.expr.TextStats
    val flat = (1L to 4L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val r0 = TextStats.clarityScore(flat, col("doc_id"), col("text"),
      Seq("a"), fbDocs = 2).collect().head
    assert(r0.getLong(0) == 2L && r0.getDouble(2) == 0.0)
    val mixed = ((1L to 4L).map(i => (i, "q q q q")) ++
      Seq((5L, "a b c d"), (6L, "e f g h"), (7L, "i j k l")))
      .toDF("doc_id", "text")
    val r1 = TextStats.clarityScore(mixed, col("doc_id"), col("text"),
      Seq("q"), fbDocs = 2).collect().head
    assert(r1.getDouble(2) > 0.5, s"clarity ${r1.getDouble(2)}")
  }

  test("bloomFprCalibration: members always pass (measured 1.0 when " +
    "probing the build set); disjoint probes match the analytic form") {
    import graft.ops.Sketch
    val build = (1 to 50).map(i => 2L * i).toDF("id")
    val probe = (0 to 50).map(i => 2L * i + 1L).toDF("id")
    val r = Sketch.bloomFprCalibration(build, col("id"), probe, col("id"),
      bits = 64, k = 2).collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 50L && r.getLong(1) == 51L)
    assert(r.getDouble(4) ==
      r6(math.pow(1.0 - math.pow(1.0 - 1.0 / 64, 2.0 * 50), 2.0)))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    // no false negatives ever: probing the build set passes everything
    val self = Sketch.bloomFprCalibration(build, col("id"), build,
      col("id"), bits = 64, k = 2).collect().head
    assert(self.getLong(2) == 50L && self.getDouble(3) == 1.0)
  }

  test("dedupThresholdSweep: hand pair set fires the right pairs and " +
    "doc counts at every threshold, with explicit zeros") {
    import graft.ops.TextDedup
    val pairs = Seq((1L, 2L, 0.95), (2L, 3L, 0.55), (4L, 5L, 0.15))
      .toDF("doc_a", "doc_b", "jaccard")
    val r = TextDedup.dedupThresholdSweep(pairs, col("doc_a"),
        col("doc_b"), col("jaccard"))
      .collect().map(x => math.round(x.getDouble(0) * 10).toInt ->
        ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1) == ((3L, 5L)))
    for (t <- 2 to 5) assert(r(t) == ((2L, 3L)), s"t=0.$t")
    for (t <- 6 to 9) assert(r(t) == ((1L, 2L)), s"t=0.$t")
  }

  test("cmErrorCalibration: errors are never negative; a width far " +
    "above the item count gives zero error and a met guarantee") {
    import graft.ops.Sketch
    val items = (1 to 40).flatMap(i => Seq.fill(i % 4 + 1)(i.toLong))
      .toDF("id")
    val wide = Sketch.cmErrorCalibration(items, col("id"), depth = 3,
      width = 4096).collect().head
    assert(wide.getLong(0) == 40L)
    assert(wide.getDouble(2) == 0.0 && wide.getLong(3) == 0L)
    assert(wide.getBoolean(8))
    // a tight sketch still never under-counts (max_err ≥ mean_err ≥ 0)
    val tight = Sketch.cmErrorCalibration(items, col("id"), depth = 2,
      width = 8).collect().head
    assert(tight.getDouble(2) >= 0.0 && tight.getLong(3) >= 0L)
    assert(tight.getLong(1) == items.count())
  }

  test("markovAttribution: hand journey set gives reach 0.5 and the " +
    "expected removal effects/shares (view 0.75, click 0.5)") {
    import graft.ops.Analytics
    // u1: view→purchase; u2: view→click→purchase; u3: click;
    // u4: view  ⇒ reach = .75·(⅓ + ⅓·.5) + .25·.5 = 0.5
    val ev = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "view"), (2L, 2L, 4L, "click"), (2L, 3L, 5L, "purchase"),
      (3L, 1L, 6L, "click"),
      (4L, 1L, 7L, "view")).toDF("u", "t", "i", "e")
    val r = Analytics.markovAttribution(ev, col("u"), col("t"), col("i"),
        col("e"), "purchase", removable0 = Some(Seq("click", "view")))
      .collect().map(x => x.getString(0) -> x).toMap
    def near(a: Double, b: Double, tol: Double = 1e-3) =
      math.abs(a - b) < tol
    assert(near(r("view").getDouble(1), 0.5, 1e-4)) // reach_full
    // removing view leaves START→click→purchase = .125: effect .75
    assert(near(r("view").getDouble(3), 0.75))
    // removing click leaves START→view→purchase = .25: effect .5
    assert(near(r("click").getDouble(3), 0.5))
    assert(near(r("view").getDouble(4), 0.6) &&
      near(r("click").getDouble(4), 0.4))
    // shares over the removable set sum to 1 (up to rounding)
    assert(near(r.values.map(_.getDouble(4)).sum, 1.0, 1e-5))
  }

  test("medianCI: n=25 uniform grid gives median 13 with CI [7, 19] " +
    "at the hand normal-approximation ranks; tiny groups NULL bounds") {
    import graft.ops.Analytics
    val df = ((1 to 25).map(i => ("g", i.toDouble)) ++
      Seq(("t", 1.0), ("t", 2.0), ("t", 3.0))).toDF("grp", "x")
    val r = Analytics.medianCI(df, col("grp"), col("x"))
      .collect().map(x => x.getString(0) -> x).toMap
    // rmed=13; rlo=⌊(25−1.959964·5)/2⌋=7; rhi=min(25,⌈17.4⌉+1)=19
    assert(r("g").getLong(1) == 25L && r("g").getDouble(2) == 13.0)
    assert(r("g").getDouble(3) == 7.0 && r("g").getDouble(4) == 19.0)
    // n=3: rlo < 1 → the distribution-free interval is not available
    assert(r("t").getDouble(2) == 2.0 && r("t").isNullAt(3) &&
      r("t").isNullAt(4))
  }

  test("yuenTest: shifted uniform arms give the hand trimmed means, " +
    "exactly df=10 under equal winsorized variances, and p=0") {
    import graft.ops.Analytics
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val u = ((1 to 10).map(i => (true, i.toDouble)) ++
      (1 to 10).map(i => (false, i.toDouble + 100.0))).toDF("a", "y")
    val r = Analytics.yuenTest(u, col("a"), col("y")).collect().head
    // g=2, h=6: interior 3..8 → tm_a=5.5; SSw=42.5 → d=42.5/30 each
    assert(r.getLong(2) == 6L && r.getLong(3) == 6L)
    assert(r.getDouble(4) == 5.5 && r.getDouble(5) == 105.5)
    assert(r.getDouble(6) == -100.0)
    val d = 42.5 / 30.0
    assert(r.getDouble(7) == r6(-100.0 / math.sqrt(2 * d)))
    assert(r.getDouble(8) == 10.0) // equal d ⇒ Welch df = 10 exactly
    assert(r.getDouble(9) == 0.0)
  }

  test("logregDistill: step-1 closed form, loss decreases, determinism") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "good stuff here ok"), (2L, "bad junk there no"),
      (3L, "good more words yes"), (4L, "bad other token no"))
      .toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"),
      when(col("text").contains("good"), 1.0).otherwise(0.0).as("y"))
    val w = Quality.logregDistill(docs, col("doc_id"), col("text"),
        labels, nBuckets = 8)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // independent replay in plain Scala: md5-hex bucket, x counts,
    // w1 = snap6(eta/N * sum x(y - 1/2)) — the exact-halves gradient
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 8
    }
    val rows = Seq(
      (1L, "good stuff here ok", 1.0), (2L, "bad junk there no", 0.0),
      (3L, "good more words yes", 1.0), (4L, "bad other token no", 0.0))
    val x = rows.flatMap { case (d, t, y) =>
      t.split(" ").map(tok => (d, bucket(tok), y)) }
      .groupBy { case (d, b, _) => (d, b) }
      .map { case ((d, b), g) => (d, b, g.size.toDouble, g.head._3) }
    val g1 = x.groupBy(_._2).map { case (b, g) =>
      b -> g.map { case (_, _, xc, y) => xc * (y - 0.5) }.sum }
    val w1Exp = g1.map { case (b, g) =>
      b -> math.floor((0.5 * g / 4.0) * 1e6 + 0.5) / 1e6 }
    assert(w.keySet == w1Exp.keySet)
    w1Exp.foreach { case (b, v) => assert(w(b)._1 == v, s"bucket $b") }
    // training moves predictions toward labels: mean log-loss under w2
    // < under w1 < ln 2 (the w = 0 loss)
    def loss(wsel: Long => Double): Double = {
      val ms = x.groupBy(_._1).map { case (d, g) =>
        d -> g.map { case (_, b, xc, _) => xc * wsel(b) }.sum }
      val ys = rows.map(r => r._1 -> r._3).toMap
      val ls = ms.map { case (d, m) =>
        val p = 1.0 / (1.0 + math.exp(-m))
        -(ys(d) * math.log(p) + (1 - ys(d)) * math.log(1 - p)) }
      ls.sum / ls.size
    }
    assert(loss(b => w(b)._2) < loss(b => w(b)._1))
    assert(loss(b => w(b)._1) < math.log(2.0))
    // deterministic under repartition
    val w9 = Quality.logregDistill(docs.repartition(7), col("doc_id"),
        col("text"), labels, nBuckets = 8)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(w9 == w)
  }

  test("passAtK: hand combinatorics, degenerate branches, monotone in k") {
    import org.apache.spark.sql.functions._
    // problem 1: n=4, c=1 -> pass1 = 1/4, pass2 = 1 - (3/4)(2/3) = 1/2,
    // pass4 = 1 (c > n - 4); problem 2: c=0 -> all zero;
    // problem 3: n=2 -> pass4 undefined (NULL)
    val cands = Seq(
      (1L, true), (1L, false), (1L, false), (1L, false),
      (2L, false), (2L, false), (2L, false), (2L, false),
      (3L, true), (3L, true))
      .toDF("pid", "ok")
    val out = Quality.passAtK(cands, col("pid"), col("ok"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out(1L) == ((4L, 1L, Some(0.25), Some(0.5), Some(1.0))))
    assert(out(2L) == ((4L, 0L, Some(0.0), Some(0.0), Some(0.0))))
    assert(out(3L) == ((2L, 2L, Some(1.0), Some(1.0), None)))
    // pass@k is monotone nondecreasing in k wherever defined
    def d(o: Option[Any]) = o.map(_.asInstanceOf[Double])
    for ((_, (_, _, p1, p2, _)) <- out; a <- d(p1); b <- d(p2))
      assert(a <= b)
    for ((_, (_, _, _, p2, p4)) <- out; a <- d(p2); b <- d(p4))
      assert(a <= b)
  }

  test("startLogregGateSink: union of per-batch scorings ≡ batch " +
    "scoring of the unioned docs; admit = margin sign; unseen buckets 0") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val labels = graft.expr.TextStats.gopherRules(docs, col("doc_id"),
      col("text")).select(col("doc_id"),
      when(col("keep"), 1.0).otherwise(0.0).as("y"))
    val weights = Quality.logregDistill(docs, col("doc_id"), col("text"),
      labels).select(col("bucket"), col("w2").as("w")).localCheckpoint(true)
    val arriving = docs.filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val gated = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = graft.stream.StreamClassify.startLogregGateSink(weights,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      java.nio.file.Files.createTempDirectory("lr-ckpt").toString,
      (df, epoch) => gated.synchronized {
        gated(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(arriving.take(arriving.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(arriving.drop(arriving.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = gated.synchronized(gated.values.flatten.toSeq.sorted)
    val batch = Quality.logregScore(weights,
      docs.filter(col("doc_id") < 40), col("doc_id"), col("text"))
    val expected = batch.collect().map(_.toString).sorted.toSeq
    assert(got == expected && got.nonEmpty)
    assert(gated.synchronized(gated.size) == 2)
    // the admit bit is exactly the margin's sign
    assert(batch.filter((col("m") >= 0) =!= col("admit")).isEmpty)
    // buckets missing from the weight table score 0 (left join +
    // coalesce): under an empty weight table every margin is 0
    val probe = Seq((999L, "zzqq wwrr")).toDF("doc_id", "text")
    val r = Quality.logregScore(weights.filter(lit(false)), probe,
      col("doc_id"), col("text")).collect().head
    assert(r.getDouble(1) == 0.0 && r.getBoolean(3))
  }

  test("rateWilson: hand-computed interval, exact-zero lower bound at c=0") {
    import org.apache.spark.sql.functions._
    val df = (1 to 10).map(i => ("g1", i <= 3)) ++
      (1 to 5).map(_ => ("g0", false))
    val out = Quality.rateWilson(df.toDF("g", "ok"), col("g"), col("ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // independent replay of the closed form for n=10, c=3
    val (n, ph, z) = (10.0, 0.3, 1.96)
    val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = (ph + z2 / (n * 2.0)) / denom
    val half = (z / denom) * math.sqrt(ph * (1.0 - ph) / n + z2 / (n * n * 4.0))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out("g1") == ((10L, 3L, 0.3, r6(center - half), r6(center + half))))
    assert(out("g1")._4 > 0.0 && out("g1")._5 < 1.0)
    // c = 0: the Wilson lower bound is EXACTLY zero (center == half)
    assert(out("g0")._3 == 0.0 && out("g0")._4 == 0.0)
    assert(out("g0")._5 > 0.0) // but the upper bound is honest, not 0
  }

  test("logregScore: bucket-width mismatch rejected; NULL text still decided") {
    import org.apache.spark.sql.functions._
    // a %64-trained table (bucket 40 exists) served at %32 must throw,
    // not silently score a different feature space
    val w64 = Seq((40L, 0.5)).toDF("bucket", "w")
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Quality.logregScore(w64, docs, col("doc_id"), col("text"))
    }
    assert(e.getMessage.contains("bucket widths differ"))
    // an admission gate answers for EVERY doc: NULL text coalesces to
    // empty and still emits a decision row
    val w = Seq((0L, 0.5)).toDF("bucket", "w")
    val mixed = Seq((1L, Some("a b")), (2L, None))
      .toDF("doc_id", "text")
    val out = Quality.logregScore(w, mixed, col("doc_id"), col("text"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("fleissKappa: hand 3-rater table; unanimous table -> NULL kappa") {
    import org.apache.spark.sql.functions._
    // items (r1, r2, r3): c1 = 3, 2, 0, 1 -> agree = 6+2+6+2 = 16
    // pbar = 16/24; p1 = 6/12 -> pe = .5; kappa = (2/3 - .5)/.5 = 1/3
    val items = Seq((true, true, true), (true, true, false),
      (false, false, false), (true, false, false))
      .toDF("r1", "r2", "r3")
    val r = Quality.fleissKappa(items,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == math.floor(16.0 / 24.0 * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6)
    // every rating in one category: p1 = 1, pe = 1, kappa undefined
    val unan = Seq((true, true, true), (true, true, true))
      .toDF("r1", "r2", "r3")
    val r2 = Quality.fleissKappa(unan,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    assert(r2.getDouble(1) == 1.0 && r2.getDouble(2) == 1.0)
    assert(r2.isNullAt(3))
  }

  test("brierDecomposition: hand bins satisfy the Murphy identity") {
    import org.apache.spark.sql.functions._
    // bin 8: conf .8 on {T,F}; bin 3: conf .3 on {F,F}
    val preds = Seq((0.8, true), (0.8, false), (0.3, false), (0.3, false))
      .toDF("conf", "ok")
    val r = Quality.brierDecomposition(preds, col("conf"), col("ok"))
      .collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.25)     // o_bar
    assert(r.getDouble(2) == 0.215)    // (0.68 + 0.18) / 4
    assert(r.getDouble(3) == 0.09)     // reliability
    assert(r.getDouble(4) == 0.0625)   // resolution
    assert(r.getDouble(5) == 0.1875)   // uncertainty = .25 * .75
    // bin-constant forecasts: brier = rel - res + unc exactly
    assert(r.getDouble(2) == r.getDouble(3) - r.getDouble(4) + r.getDouble(5))
  }

  test("cusumDrift: hand series alarms only after the burst; a flat " +
    "series never accumulates; partition-invariant") {
    import graft.ops.Analytics
    // mu = 12, k = 13.2: four quiet steps drain to the floor, the
    // step-5 burst jumps S to 6.8 > h = mu/2 = 6
    val df = (Seq((1, 10L), (2, 10L), (3, 10L), (4, 10L), (5, 20L))
      .map { case (s, x) => ("g", s, x) } ++
      Seq((1, 7L), (2, 7L), (3, 7L), (4, 7L), (5, 7L))
        .map { case (s, x) => ("flat", s, x) })
      .toDF("grp", "step", "x")
    val r = Analytics.cusumDrift(df, col("grp"), col("step"), col("x"))
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        ((x.getDouble(3), x.getBoolean(4)))).toMap
    for (s <- 1 to 4) assert(r(("g", s)) == ((0.0, false)), s"step $s")
    assert(r(("g", 5)) == ((6.8, true)))
    for (s <- 1 to 5) assert(r(("flat", s)) == ((0.0, false)))
    val r5 = Analytics.cusumDrift(df.repartition(5), col("grp"),
      col("step"), col("x")).collect().map(x =>
        (x.getString(0), x.getInt(1)) ->
        ((x.getDouble(3), x.getBoolean(4)))).toMap
    assert(r5 == r)
  }

  test("funnel: strictly-after stage semantics (pre-view click and " +
    "same-instant click don't convert); conv columns") {
    import graft.ops.Analytics
    val ev = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "click"), ("u1", 3L, "purchase"),
      ("u2", 1L, "click"), ("u2", 2L, "view"),    // click BEFORE view
      ("u3", 1L, "view"), ("u3", 2L, "click"),
      ("u4", 5L, "purchase"),                      // never viewed
      ("u5", 1L, "view"), ("u5", 1L, "click"))     // same instant
      .toDF("u", "ts", "st")
    val r = Analytics.funnel(ev, col("u"), col("ts"), col("st"),
      Seq("view", "click", "purchase")).collect()
      .map(x => x.getString(1) -> ((x.getLong(0), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)),
        x.getDouble(4)))).toMap
    assert(r("view") == ((1L, 4L, None, 1.0)))
    assert(r("click") == ((2L, 2L, Some(0.5), 0.5)))
    assert(r("purchase") == ((3L, 1L, Some(0.5), 0.25)))
  }

  test("funnelBySegment: per-segment counts off ONE arrival chain " +
    "(sum over segments ≡ unsegmented funnel); per-segment windows") {
    import graft.ops.Analytics
    val ev = Seq(
      ("u1", 1L, "view", "A"), ("u1", 2L, "click", "A"),
      ("u2", 1L, "view", "A"),
      ("u3", 1L, "view", "B"), ("u3", 2L, "click", "B"),
      ("u3", 3L, "purchase", "B"))
      .toDF("u", "ts", "st", "seg")
    val r = Analytics.funnelBySegment(ev, col("u"), col("ts"), col("st"),
      Seq("view", "click", "purchase"), col("seg")).collect()
      .map(x => (x.getString(0), x.getString(2)) ->
        ((x.getLong(3), x.getDouble(5)))).toMap
    assert(r(("A", "view")) == ((2L, 1.0)))
    assert(r(("A", "click")) == ((1L, 0.5)))
    assert(!r.contains(("A", "purchase"))) // no A purchasers: no row
    assert(r(("B", "view")) == ((1L, 1.0)) &&
      r(("B", "purchase")) == ((1L, 1.0)))
    // Σ segments ≡ the unsegmented funnel at every stage
    val whole = Analytics.funnel(ev, col("u"), col("ts"), col("st"),
      Seq("view", "click", "purchase")).collect()
      .map(x => x.getString(1) -> x.getLong(2)).toMap
    val bySeg = r.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2._1).sum).toMap
    assert(bySeg == whole.filter(_._2 > 0))
  }

  test("funnelTimes: exact type-1 dwell quantiles in seconds over the " +
    "strictly-after arrival chain") {
    import graft.ops.Analytics
    val ev = Seq(
      ("u1", 0L, "view"), ("u1", 2000000L, "click"),
      ("u1", 5000000L, "purchase"),
      ("u2", 0L, "view"), ("u2", 4000000L, "click"),
      ("u3", 1L, "view"))
      .toDF("u", "ts", "st")
    val r = Analytics.funnelTimes(ev, col("u"), col("ts"), col("st"),
      Seq("view", "click", "purchase")).collect()
      .map(x => x.getString(1) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    // click dwells {2s, 4s}: p50 = rank ⌈1⌉ = 2.0, p90 = rank ⌈1.8⌉ = 4.0
    assert(r("click") == ((2L, 2.0, 4.0)))
    assert(r("purchase") == ((1L, 5.0, 5.0)))
  }

  test("mannWhitneyU: separated arms give U=0 and the hand z; " +
    "identical arms give U = nm/2, z = 0, p = 1; partition-invariant") {
    import graft.ops.Analytics
    val sep = Seq(("g", 1.0, true), ("g", 2.0, true),
      ("g", 3.0, false), ("g", 4.0, false)).toDF("g", "v", "a")
    val r = Analytics.mannWhitneyU(sep, col("g"), col("a"), col("v"))
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.0) // all of A below all of B
    // z = (0 - 2) / sqrt(2*2*5/12), rounded to 4
    assert(r.getDouble(4) == BigDecimal(-2.0 / math.sqrt(5.0 / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 0.2)
    val same = Seq(("g", 1.0, true), ("g", 2.0, true),
      ("g", 1.0, false), ("g", 2.0, false)).toDF("g", "v", "a")
    val rs = Analytics.mannWhitneyU(same, col("g"), col("a"), col("v"))
      .collect().head
    assert(rs.getDouble(3) == 2.0) // U = na*nb/2 under H0 symmetry
    assert(rs.getDouble(4) == 0.0 && rs.getDouble(5) == 1.0)
    val r3 = Analytics.mannWhitneyU(sep.repartition(3), col("g"),
      col("a"), col("v")).collect().head
    assert(r3 == r)
  }

  test("ewmaDrift: matches the serial recursion z_t = λx + (1−λ)z; " +
    "flat series pins ewma = mu with zero-width limits and no alarm; " +
    "alarm ≡ outside [lcl, ucl]; partition-invariant") {
    import graft.ops.Analytics
    val xs = Seq(10L, 10L, 10L, 10L, 20L)
    val df = (xs.zipWithIndex.map { case (x, i) => ("g", i + 1, x) } ++
      (1 to 5).map(i => ("flat", i, 7L))).toDF("grp", "step", "x")
    val r = Analytics.ewmaDrift(df, col("grp"), col("step"), col("x"))
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x).toMap
    // driver-side serial replay of the textbook recursion, z0 = mu
    val mu = xs.sum.toDouble / xs.size
    var z = mu
    xs.zipWithIndex.foreach { case (x, i) =>
      z = 0.2 * x + 0.8 * z
      val row = r(("g", i + 1))
      assert(math.abs(row.getDouble(3) - z) < 1e-6, s"step ${i + 1}")
      // alarm column is exactly the rounded-band exceedance
      assert(row.getBoolean(6) ==
        (row.getDouble(3) < row.getDouble(4) ||
          row.getDouble(3) > row.getDouble(5)))
    }
    for (i <- 1 to 5) {
      val row = r(("flat", i))
      assert(row.getDouble(3) == 7.0 && row.getDouble(4) == 7.0 &&
        row.getDouble(5) == 7.0 && !row.getBoolean(6))
    }
    val r5 = Analytics.ewmaDrift(df.repartition(5), col("grp"),
      col("step"), col("x")).collect()
      .map(x => (x.getString(0), x.getInt(1)) -> x.getDouble(3)).toMap
    assert(r5 == r.map { case (k, v) => k -> v.getDouble(3) })
  }

  test("chi2Drift: hand 2x2 gives chi2 = 20, V = 0.5, tiny p; " +
    "identical halves give chi2 = 0; single-category group is NULL") {
    import graft.ops.Analytics
    def half(rows: Seq[(String, String)]) = rows.toDF("src", "cat")
    val e = half(Seq.fill(30)(("g", "A")) ++ Seq.fill(10)(("g", "B")) ++
      Seq.fill(5)(("one", "A")) ++ Seq.fill(6)(("same", "A")) ++
      Seq.fill(6)(("same", "B")))
    val a = half(Seq.fill(10)(("g", "A")) ++ Seq.fill(30)(("g", "B")) ++
      Seq.fill(7)(("one", "A")) ++ Seq.fill(6)(("same", "A")) ++
      Seq.fill(6)(("same", "B")))
    val r = Analytics.chi2Drift(e, a, col("src"), col("cat"))
      .collect().map(x => x.getString(0) -> x).toMap
    val g = r("g")
    assert(g.getLong(1) == 40L && g.getLong(2) == 40L && g.getLong(3) == 1L)
    assert(g.getDouble(4) == 20.0 && g.getDouble(5) == 0.5)
    assert(g.getDouble(6) < 0.001)
    // same composition both halves: chi2 exactly 0 (WH p is the
    // approximation's value at 0, far from significance)
    assert(r("same").getDouble(4) == 0.0 && r("same").getDouble(6) > 0.9)
    // one category: df = 0, all stats undefined
    assert(r("one").isNullAt(3) && r("one").isNullAt(4) &&
      r("one").isNullAt(5) && r("one").isNullAt(6))
  }

  test("jsDivergence: identical snapshots give 0 terms; symmetric in " +
    "old/new; disjoint strata are positive and total ≤ ln 2") {
    import graft.ops.Analytics
    val o = (Seq.fill(6)("x") ++ Seq.fill(4)("y")).toDF("s")
    val r0 = Analytics.jsDivergence(o, o, col("s")).collect()
    assert(r0.forall(_.getDouble(5) == 0.0))
    val n = (Seq.fill(2)("y") ++ Seq.fill(8)("z")).toDF("s")
    val fwd = Analytics.jsDivergence(o, n, col("s")).collect()
      .map(x => x.getString(0) -> x.getDouble(5)).toMap
    val bwd = Analytics.jsDivergence(n, o, col("s")).collect()
      .map(x => x.getString(0) -> x.getDouble(5)).toMap
    assert(fwd == bwd) // JSD is symmetric, term by term
    assert(fwd("x") > 0.0 && fwd("z") > 0.0)
    assert(fwd.values.sum <= math.log(2.0) + 1e-9)
  }

  test("spearmanCorr: monotone -> 1, reversed -> -1, hand tie case, " +
    "constant side NULL, outlier-proof, partition-invariant") {
    import graft.ops.Analytics
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.spearmanCorr(d, col("g"), col("x"), col("y")).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val d = (Seq(("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 1e9),
      ("down", 1.0, 3.0), ("down", 2.0, 2.0), ("down", 3.0, 1.0),
      ("tie", 1.0, 1.0), ("tie", 2.0, 1.0), ("tie", 3.0, 2.0),
      ("const", 1.0, 5.0), ("const", 2.0, 5.0)))
      .toDF("g", "x", "y")
    val r = run(d)
    // the 1e9 outlier can't drag rank correlation off exactly 1
    assert(r("up") == Some(1.0) && r("down") == Some(-1.0))
    assert(r("tie") == Some(0.866025)) // 6/sqrt(48), hand-computed
    assert(r("const") == None)
    assert(run(d.repartition(5)) == r)
  }

  test("sprtAb: steady at-baseline series drifts to accept_h0 at the " +
    "hand-computed day and freezes; degenerate p0 yields NULLs") {
    import graft.ops.Analytics
    // 12 days of 5/10 at p0 = 0.5 exactly: per-day LLR term
    // 5·ln(1.25) + 5·ln(0.75) = −0.322693; crosses ln(0.05/0.95) =
    // −2.944439 at day 10
    val rows = (1 to 12).flatMap(d => (1 to 10).map(i =>
      ("g", d, i <= 5))) ++
      (1 to 3).flatMap(d => (1 to 4).map(_ => ("allwin", d, true)))
    val df = rows.toDF("grp", "day", "s")
    val r = Analytics.sprtAb(df, col("grp"), col("day"), col("s"))
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x).toMap
    for (d <- 1 to 9)
      assert(r(("g", d)).getString(5) == "continue", s"day $d")
    for (d <- 10 to 12)
      assert(r(("g", d)).getString(5) == "accept_h0", s"day $d")
    val llr10 = r(("g", 10)).getDouble(4)
    assert(math.abs(llr10 - 10 * (5 * math.log(1.25) +
      5 * math.log(0.75))) < 1e-6)
    for (d <- 1 to 3) {
      assert(r(("allwin", d)).isNullAt(4) && r(("allwin", d)).isNullAt(5))
    }
  }

  test("theilSenTrend: hand even-pair median; linear series gives " +
    "exact slope and max S; constant series nulls z/p via zero " +
    "variance") {
    import graft.ops.Analytics
    val d = (Seq((0, 0L), (1, 1L), (2, 4L), (3, 5L)).map {
      case (t, x) => ("mix", t, x) } ++
      (0 to 4).map(t => ("lin", t, 2L * t)) ++
      (0 to 4).map(t => ("const", t, 9L))).toDF("g", "t", "x")
    val r = Analytics.theilSenTrend(d, col("g"), col("t"), col("x"))
      .collect().map(x => x.getString(0) -> x).toMap
    // slopes [1,1,5/3,2,2,3]: median = (5/3 + 2)/2 = 11/6
    assert(r("mix").getDouble(6) ==
      math.floor(11.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(r("mix").getLong(3) == 6L) // all pairs increasing
    val lin = r("lin")
    assert(lin.getLong(1) == 5L && lin.getLong(2) == 10L &&
      lin.getLong(3) == 10L && lin.getDouble(6) == 2.0)
    assert(lin.getDouble(4) > 0 && lin.getDouble(5) < 0.05)
    val c = r("const")
    assert(c.getLong(3) == 0L && c.isNullAt(4) && c.isNullAt(5) &&
      c.getDouble(6) == 0.0)
  }

  test("embeddingFrechet: identical snapshots give 0; a pure mean " +
    "shift lands entirely in mean_dist2") {
    import graft.ops.Analytics
    val o = Seq(Seq(0f, 0f), Seq(2f, 2f)).map(Tuple1(_)).toDF("embedding")
    val n = Seq(Seq(1f, 1f), Seq(3f, 3f)).map(Tuple1(_)).toDF("embedding")
    val same = Analytics.embeddingFrechet(o, o, col("embedding"))
      .collect().head
    assert(same.getLong(0) == 2L && same.getDouble(3) == 0.0 &&
      same.getDouble(4) == 0.0 && same.getDouble(5) == 0.0)
    val r = Analytics.embeddingFrechet(o, n, col("embedding"))
      .collect().head
    // means shift by 1 per dim, sigmas equal (1) on both sides
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 2.0)
  }

  test("temperatureScan: confident-correct scores prefer the coldest " +
    "grid T; a confidently-wrong model prefers the hottest") {
    val scores = Seq((1L, "a", 0.0), (1L, "b", -2.0),
      (2L, "a", 0.0), (2L, "b", -2.0)).toDF("doc_id", "clab", "score")
    def best(lab: String) = Quality.temperatureScan(scores,
      Seq((1L, lab), (2L, lab)).toDF("doc_id", "lab"))
      .filter(col("best")).collect().head.getDouble(0)
    assert(best("a") == 0.25) // NLL = ln(1+e^(-2/T)) shrinks as T -> 0
    assert(best("b") == 4.0)  // + 2/T term flips the argmin to hot
  }

  test("bootstrapCiMean: constant series collapses the CI to the " +
    "mean; spread series brackets it within the data range; " +
    "deterministic and partition-invariant") {
    import graft.ops.Analytics
    val d = ((1 to 40).map(i => ("const", i.toLong, 5.0)) ++
      (1 to 40).map(i => ("spread", i.toLong,
        if (i % 2 == 0) 0.0 else 100.0))).toDF("g", "id", "x")
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.bootstrapCiMean(df, col("g"), col("id"), col("x"),
        b = 50).collect().map(r => r.getString(0) -> r).toMap
    val r = run(d)
    val c = r("const")
    assert(c.getLong(1) == 40L && c.getDouble(2) == 5.0)
    assert(c.getDouble(3) == 5.0 && c.getDouble(4) == 5.0) // every
    // replicate mean of a constant column is the constant
    assert(c.getLong(5) == 50L)
    val s = r("spread")
    assert(s.getDouble(2) == 50.0)
    assert(s.getDouble(3) < s.getDouble(4))
    assert(s.getDouble(3) >= 0.0 && s.getDouble(4) <= 100.0)
    // deterministic hash weights: a re-run and a repartition agree
    val r2 = run(d.repartition(7))
    assert(r2("spread").getDouble(3) == s.getDouble(3) &&
      r2("spread").getDouble(4) == s.getDouble(4))
  }

  test("labelNoise: a planted flipped label is the only suspected " +
    "error; clean corpus flags nothing") {
    val clean = ((0 until 10).map(i => (i.toLong, "aa aa", "A")) ++
      (10 until 20).map(i => (i.toLong, "bb bb", "B")))
    val r = Quality.labelNoise(
      (clean :+ ((20L, "bb bb", "A"))).toDF("id", "text", "lab"),
      col("id"), col("text"), col("lab")).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "A" && r.head.getString(1) == "B" &&
      r.head.getLong(2) == 1L)
    val r0 = Quality.labelNoise(clean.toDF("id", "text", "lab"),
      col("id"), col("text"), col("lab")).collect()
    assert(r0.isEmpty)
  }

  test("skewAdvisor: hand shares/ratios/salts; topK keeps the heavy " +
    "keys only") {
    import graft.ops.Analytics
    val d = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    val r = Analytics.skewAdvisor(d, col("k"), targetRowsPerTask = 2L,
      topK = 2).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = r.head
    // total 9, mean 3: share 6/9, ratio 2.0, salt ceil(6/2) = 3
    assert(a.getLong(1) == 6L && a.getDouble(2) == 0.666667 &&
      a.getDouble(3) == 2.0 && a.getLong(4) == 3L)
    assert(r(1).getLong(4) == 1L) // b: 2 rows fit one task
  }

  test("kAnonymity: cells below k flag at_risk; cells at k pass") {
    val d = (Seq.fill(5)(("en", "s1")) :+ (("fr", "s1"))).toDF("l", "s")
    val r = Quality.kAnonymity(d, Seq("l" -> col("l"), "s" -> col("s")),
      k = 5L).collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r("en") == ((5L, false)) && r("fr") == ((1L, true)))
  }

  test("dpNoisyCounts: deterministic under repartition, seed-sensitive, " +
    "every cell noised, raw counts absent from the schema") {
    val d = (Seq.fill(40)(("en", "a")) ++ Seq.fill(25)(("fr", "b")))
      .toDF("l", "s")
    def run(df: org.apache.spark.sql.DataFrame, seed: String) =
      Quality.dpNoisyCounts(df, Seq("l" -> col("l"), "s" -> col("s")),
        epsilon = 1.0, seed = seed).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
    val r = run(d, "s1")
    assert(r.size == 2)
    assert(run(d.repartition(7), "s1") == r)
    assert(run(d, "s2") != r)
    // Laplace(1) noise is almost surely non-integer: the release never
    // equals the raw count
    assert(r(("en", "a")) != 40.0 && r(("fr", "b")) != 25.0)
    val cols = Quality.dpNoisyCounts(d, Seq("l" -> col("l")),
      1.0, "s1").columns.toSeq
    assert(cols == Seq("l", "n_noisy"))
  }

  test("startFunnelSink: in-order batches reproduce the batch funnel; " +
    "a unit progressing ACROSS batches converts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, String)]
    val out = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = graft.stream.StreamFunnel.startFunnelSink(
      ms.toDF().toDF("u", "ts", "st"), "u", "ts", "st",
      Seq("view", "click", "purchase"),
      java.nio.file.Files.createTempDirectory("funnel-ckpt").toString,
      (df, epoch) => out.synchronized {
        out(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    val b1 = Seq(("u1", 1L, "view"), ("u2", 2L, "view"), ("u2", 3L, "click"))
    val b2 = Seq(("u1", 5L, "click"), ("u1", 6L, "purchase"),
      ("u3", 7L, "view"))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val epochs = out.synchronized(out.toMap)
    assert(epochs.size == 2)
    def want(rows: Seq[(String, Long, String)]) =
      Analytics.funnel(rows.toDF("u", "ts", "st"), col("u"), col("ts"),
        col("st"), Seq("view", "click", "purchase"))
        .collect().map(_.toString).sorted.toSeq
    assert(epochs(epochs.keys.min) == want(b1))
    // u1's click/purchase arrive a batch after its view: the
    // maintained state still converts it — ≡ batch over the union
    assert(epochs(epochs.keys.max) == want(b1 ++ b2))
  }

  test("startWatermarkFunnelSink: batch ≡ stream under SHUFFLED arrival " +
    "within the watermark (the out-of-order caveat narrows to beyond-" +
    "watermark lateness)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    // u1 converts fully but its view ARRIVES after its click (the case
    // the arrival-order sink documents as lost); u2's click precedes
    // its view in EVENT time (never converts); u9 is the watermark
    // pusher that finalizes everything BEFORE it (itself still
    // buffered: the emission covers finalized events only)
    val finalized = Seq(("u1", 10L, "view"), ("u1", 20L, "click"),
      ("u1", 30L, "purchase"), ("u2", 12L, "view"), ("u2", 11L, "click"),
      ("u3", 15L, "view"))
    def run(batches: Seq[Seq[(String, Long, String)]]): Seq[String] = {
      val ms = MemoryStream[(String, Long, String)]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamFunnel.startWatermarkFunnelSink(
        ms.toDF().toDF("u", "ts", "st"), "u", "ts", "st",
        Seq("view", "click", "purchase"), 50L,
        java.nio.file.Files.createTempDirectory("wmfunnel-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.collect().map(_.toString).sorted.toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val want = Analytics.funnel(finalized.toDF("u", "ts", "st"), col("u"),
      col("ts"), col("st"), Seq("view", "click", "purchase"))
      .collect().map(_.toString).sorted.toSeq
    // arrival order A: click-before-view across batches
    val a = run(Seq(
      Seq(("u1", 20L, "click"), ("u2", 12L, "view")),
      Seq(("u1", 10L, "view"), ("u2", 11L, "click"),
        ("u3", 15L, "view"), ("u1", 30L, "purchase")),
      Seq(("u9", 1000L, "view"))))
    // arrival order B: a different shuffle of the same events
    val b = run(Seq(
      Seq(("u1", 30L, "purchase"), ("u3", 15L, "view")),
      Seq(("u2", 11L, "click"), ("u1", 20L, "click")),
      Seq(("u2", 12L, "view"), ("u1", 10L, "view"), ("u9", 1000L, "view"))))
    assert(a == want, s"order A diverged from batch:\n$a\nvs\n$want")
    assert(b == want, s"order B diverged from batch:\n$b\nvs\n$want")
  }

  test("riskCoverage: hand curve; chosen = smallest threshold at the " +
    "accuracy bar (max coverage); unreachable bar marks nothing") {
    val preds = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, true))
      .toDF("conf", "ok")
    def run(bar: Double) = Quality.riskCoverage(preds, col("conf"),
      col("ok"), bar).collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getBoolean(5))))).toMap
    val r = run(0.9)
    assert(r(0.9) == ((1L, 1.0, Some(false))))
    assert(r(0.8) == ((2L, 1.0, Some(true)))) // max coverage at the bar
    assert(r(0.7)._2 == math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6)
    assert(r(0.6) == ((4L, 0.75, Some(false))))
    assert(run(1.1).values.forall(_._3 == None)) // no qualifying t
  }

  test("averagePrecision: hand step-form AP; no positives yields NULL") {
    val preds = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, true))
      .toDF("s", "p")
    val r = Quality.averagePrecision(preds, col("s"), col("p"))
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    // 1·⅓ + 1·⅓ + 0 + ¾·⅓, snapped then 6-dp
    assert(r.getDouble(2) == 0.916667)
    val none = Quality.averagePrecision(
      Seq((0.9, false)).toDF("s", "p"), col("s"), col("p"))
      .collect().head
    assert(none.isNullAt(2))
  }

  test("essReport: equal weights give ESS = n; a dominant weight " +
    "collapses toward 1; shift-invariant in the log scores") {
    import graft.ops.Sampling
    val d = Seq(("eq", 3.0), ("eq", 3.0), ("eq", 3.0),
      ("dom", 0.0), ("dom", -20.0)).toDF("g", "lw")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.essReport(df, col("g"), col("lw")).collect()
        .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3))))
        .toMap
    val r = run(d)
    assert(r("eq") == ((3.0, 1.0)))
    assert(r("dom")._1 < 1.01 && r("dom")._2 < 0.51)
    // ESS is scale-invariant: a constant log-shift changes nothing
    assert(run(d.withColumn("lw", col("lw") + lit(5.0))) == r)
  }

  test("quantileShift: identical sides shift 0 at every decile; a " +
    "constant offset shifts every decile by it; one-sided groups drop") {
    import graft.ops.Analytics
    val e = ((1 to 10).map(v => ("g", v.toDouble)) ++
      (1 to 10).map(v => ("solo", v.toDouble))).toDF("g", "x")
    val a = (1 to 10).map(v => ("g", v.toDouble + 5.0)).toDF("g", "x")
    val same = Analytics.quantileShift(e, e, col("g"), col("x"))
      .collect()
    assert(same.length == 18 && same.forall(_.getDouble(4) == 0.0))
    val r = Analytics.quantileShift(e, a, col("g"), col("x")).collect()
    assert(r.length == 9) // 'solo' has no actual side -> dropped
    assert(r.forall(_.getDouble(4) == 5.0))
    // type-1 decile check: p50 of 1..10 is the 5th value
    val p50 = r.find(_.getLong(1) == 50L).get
    assert(p50.getDouble(2) == 5.0 && p50.getDouble(3) == 10.0)
  }

  test("cochranQ: hand integer-exact Q; all-identical rows null out " +
    "the degenerate denominator") {
    val items = Seq((true, true, false), (true, false, false),
      (true, true, true), (true, false, false)).toDF("r1", "r2", "r3")
    val r = Quality.cochranQ(items,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    // C = (4,2,1), T = 7, sumR2 = 15: Q = 2(3*21 - 49)/(21 - 15) = 28/6
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == math.floor(28.0 / 6.0 * 1e4 + 0.5) / 1e4)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 0.2)
    val deg = Seq((true, true, true), (true, true, true))
      .toDF("r1", "r2", "r3")
    val rd = Quality.cochranQ(deg,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    assert(rd.isNullAt(2) && rd.isNullAt(3))
  }

  test("mcnemar: hand corrected chi2; symmetric discordance scores 0 " +
    "with p = 1; no discordance nulls out") {
    def run(ab: Int, ba: Int, cc: Int) = {
      val rows = Seq.fill(ab)((true, false)) ++
        Seq.fill(ba)((false, true)) ++ Seq.fill(cc)((true, true))
      Quality.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().head
    }
    val r = run(6, 2, 4)
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.125) // (|6-2|-1)^2 / 8
    assert(r.getDouble(4) > 0.28 && r.getDouble(4) < 0.30)
    val sym = run(3, 3, 2)
    assert(sym.getDouble(3) == 0.0 && sym.getDouble(4) == 1.0)
    val none = run(0, 0, 5)
    assert(none.isNullAt(3) && none.isNullAt(4))
  }

  test("krippendorffAlpha: hand case with abstention (unpairable " +
    "single-rating item drops); unanimous pool yields NULL alpha") {
    val items = Seq(
      (Some(true), Some(true), Some(true)),    // agree, m=3
      (Some(true), Some(false), None),         // disagree, m=2
      (Some(false), Some(false), Some(false)), // agree, m=3
      (Some(true), None, None))                // m=1: unpairable, drops
      .toDF("r1", "r2", "r3")
    val r = Quality.krippendorffAlpha(items,
      Seq(col("r1"), col("r2"), col("r3"))).collect().head
    // n_items=3, n=8, n1=4, dsum=2: D_o=0.25, D_e=32/56, alpha=0.5625
    assert(r.getLong(0) == 3L && r.getLong(1) == 8L)
    assert(r.getDouble(2) == 0.25)
    assert(r.getDouble(3) == math.floor(32.0 / 56.0 * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(4) == 0.5625)
    val unanimous = Seq((true, true), (true, true)).toDF("r1", "r2")
    val ru = Quality.krippendorffAlpha(unanimous,
      Seq(col("r1"), col("r2"))).collect().head
    assert(ru.getDouble(2) == 0.0 && ru.isNullAt(4))
  }

  test("kfoldNbEval: separable classes give accuracy 1.0 on every " +
    "fold; fold sizes partition the corpus") {
    val docs = (0 until 20).map(i =>
      (i.toLong, if (i % 2 == 0) "aa aa" else "bb bb",
        if (i % 2 == 0) "A" else "B")).toDF("id", "text", "lab")
    val r = Quality.kfoldNbEval(docs, col("id"), col("text"), col("lab"),
      k = 5).collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == (0L to 4L).toSet)
    r.values.foreach { row =>
      assert(row.getLong(1) == 4L && row.getLong(2) == 4L &&
        row.getDouble(3) == 1.0)
    }
  }
  test("bestOfN: n=1 is the mean, n=M is the max, a hand n=2 matches " +
    "the order-statistics weights; n > M gives NULL; nCap subsamples") {
    import graft.ops.Quality
    val u = Seq(("t", 1L, 1.0), ("t", 2L, 2.0), ("t", 3L, 3.0))
      .toDF("task", "id", "s")
    val r = Quality.bestOfN(u, col("task"), col("id"), col("s"),
      nCap = 20, ns = Seq(1, 2, 3, 5))
      .collect().map(x => x.getInt(1) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r(1).getLong(2) == 3L && r(1).getDouble(3) == 2.0) // mean
    assert(r(3).getDouble(3) == 3.0)                          // max
    // n=2: weights 1/3 on s_(2)=2, 2/3 on s_(3)=3 (snapped terms)
    val want2 = (math.floor(1.0 / 3.0 * 2.0 * 1e9 + 0.5) +
      math.floor(2.0 / 3.0 * 3.0 * 1e9 + 0.5)) / 1e9
    assert(r(2).getDouble(3) == r6(want2))
    assert(r(5).isNullAt(3)) // not enough samples to ask
    // nCap = 2: the md5 min-k subsample keeps exactly 2 rows
    val capped = Quality.bestOfN(u, col("task"), col("id"), col("s"),
      nCap = 2, ns = Seq(1)).collect().head
    assert(capped.getLong(2) == 2L)
  }
  test("startChangepointSink: final emission ≡ batch changepoint over " +
    "all events, under shuffled batch splits (additive count state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    // periods 1..4 quiet (1-2 events), 5..8 loud (5-6 events)
    val all = Seq(1L, 2L, 2L, 3L, 4L, 5L, 5L, 5L, 5L, 5L, 6L, 6L, 6L,
      6L, 6L, 6L, 7L, 7L, 7L, 7L, 7L, 8L, 8L, 8L, 8L, 8L, 8L)
    def run(batches: Seq[Seq[Long]]): Seq[String] = {
      val ms = MemoryStream[Long]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamCuration.startChangepointSink(
        ms.toDF().toDF("p"), "p",
        java.nio.file.Files.createTempDirectory("cp-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.collect().map(_.toString).toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val counts = all.groupBy(identity).toSeq
      .map { case (p, xs) => (p, xs.size.toDouble) }
    val want = Analytics.changepoint(counts.toDF("p", "y"), col("p"),
      col("y")).collect().map(_.toString).toSeq
    val a = run(Seq(all.take(9), all.slice(9, 18), all.drop(18)))
    val b = run(Seq(all.reverse.take(13), all.reverse.drop(13)))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
    // and the verdict itself: the level breaks after period 4
    assert(want.head.contains("4") || want.head.contains("5"))
  }

  test("startIsotonicSink: each emission ≡ batch isotonicCalibration " +
    "over all arrived predictions, under shuffled batch splits " +
    "(additive per-bin state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the PAV-pooling fixture from the batch spec (+ a violation)
    val all: Seq[(Double, Boolean)] =
      Seq.fill(1)((0.1, true)) ++ Seq.fill(4)((0.1, false)) ++
        Seq.fill(3)((0.35, true)) ++ Seq.fill(2)((0.35, false)) ++
        Seq.fill(2)((0.6, true)) ++ Seq.fill(3)((0.6, false)) ++
        Seq.fill(4)((0.85, true)) ++ Seq.fill(1)((0.85, false))
    def run(batches: Seq[Seq[(Double, Boolean)]]): Seq[String] = {
      val ms = MemoryStream[(Double, Boolean)]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamCuration.startIsotonicSink(
        ms.toDF().toDF("conf", "ok"), "conf", "ok", 4,
        java.nio.file.Files.createTempDirectory("iso-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.orderBy(col("bin")).collect()
            .map(_.toString).toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val want = Quality.isotonicCalibration(all.toDF("conf", "ok"),
        col("conf"), col("ok"), 4)
      .orderBy(col("bin")).collect().map(_.toString).toSeq
    val a = run(Seq(all.take(7), all.slice(7, 14), all.drop(14)))
    val b = run(Seq(all.reverse.take(11), all.reverse.drop(11)))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
    // and the curve itself pooled the .6/.4 violation to .5/.5
    assert(want.exists(_.contains("0.5")))
  }
  test("markovAttribution: journeys with NO intermediate states and no " +
    "pinned removable set fail with a real message, not a reduce crash; " +
    "unabsorbed residual is emitted per variant") {
    import graft.ops.Analytics
    val direct = Seq(
      (1L, 1L, 1L, "purchase"), (2L, 1L, 2L, "purchase"))
      .toDF("u", "t", "i", "e")
    val ex = intercept[IllegalArgumentException] {
      Analytics.markovAttribution(direct, col("u"), col("t"), col("i"),
        col("e"), "purchase", removable0 = None)
    }
    assert(ex.getMessage.contains("no removable"), ex.getMessage)
    // the hand fixture: after 16 transitions every path is absorbed,
    // so the truncation readout must be exactly 0 for each variant
    val ev = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "view"), (2L, 2L, 4L, "click"), (2L, 3L, 5L, "purchase"),
      (3L, 1L, 6L, "click"),
      (4L, 1L, 7L, "view")).toDF("u", "t", "i", "e")
    val r = Analytics.markovAttribution(ev, col("u"), col("t"), col("i"),
      col("e"), "purchase", removable0 = Some(Seq("click", "view")))
    assert(r.columns.last == "unabsorbed")
    val ua = r.collect().map(_.getDouble(5))
    assert(ua.forall(v => v >= 0.0 && v < 1e-4), ua.mkString(","))
  }

  test("splitConformal: a group whose md5 split leaves a role EMPTY is " +
    "still emitted — NULL q-hat / coverage-1 convention, never dropped") {
    // pick unit ids by their actual md5 role so group "starv" has NO
    // calibration (role 1) rows but several train + test rows
    val roles = (1L to 400L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      i -> java.lang.Long.parseLong(h, 16) % 3L
    }
    val noCal = roles.filter(_._2 != 1L).map(_._1).take(20)
    assert(noCal.exists(i => roles.toMap.apply(i) == 0L) &&
      noCal.exists(i => roles.toMap.apply(i) == 2L))
    val df = noCal.map(i => ("starv", i.toDouble, i))
      .toDF("grp", "y", "id")
      .unionByName((1L to 60L).map(i => ("ok", (i % 7).toDouble, i + 1000L))
        .toDF("grp", "y", "id"))
    val out = Quality.splitConformal(df, col("grp"), col("y"), col("id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.contains("starv"), "calibration-starved group dropped")
    val s = out("starv")
    assert(s.getLong(2) == 0L, "n_cal must be 0")
    assert(s.isNullAt(4), "q_hat must be NULL")
    assert(s.getDouble(5) == 1.0, "coverage-1 convention")
    assert(out.contains("ok") && !out("ok").isNullAt(4))
  }

  test("ipsOffPolicy: hand-checked propensity weights; uniform logs " +
    "give ips = snips = plain mean and ESS = n") {
    // context x0: actions A (3 logs, r = 1) and B (1 log, r = 0)
    //   pi_b(A|x0) = 3/4, pi_b(B|x0) = 1/4; uniform target = 1/2
    //   w(A) = (1/2)/(3/4) = 2/3, w(B) = (1/2)/(1/4) = 2
    val logs = Seq((0L, "A", 1.0), (0L, "A", 1.0), (0L, "A", 1.0),
      (0L, "B", 0.0)).toDF("x", "a", "r")
    val r = Quality.ipsOffPolicy(logs, col("x"), col("a"), col("r"))
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    // ips = (3 * 2/3 * 1 + 2 * 0) / 4 = 0.5
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-6)
    // snips = 2 / (3 * 2/3 + 2) = 0.5
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-6)
    // ess = (sum w)^2 / sum w^2 = 16 / (3 * 4/9 + 4) = 3.0
    assert(math.abs(r.getDouble(5) - 3.0) < 1e-5)
    // behavior = target (uniform logs): every w = 1 -> ips = snips =
    // mean reward, ess = n
    val uni = Seq((0L, "A", 2.0), (0L, "B", 4.0), (0L, "A", 2.0),
      (0L, "B", 4.0)).toDF("x", "a", "r")
    val u = Quality.ipsOffPolicy(uni, col("x"), col("a"), col("r"))
      .collect().head
    assert(math.abs(u.getDouble(2) - 3.0) < 1e-6 &&
      math.abs(u.getDouble(3) - 3.0) < 1e-6 &&
      math.abs(u.getDouble(5) - 4.0) < 1e-5)
    // clipping binds: one rare action with a huge weight
    val rare = (Seq.fill(40)((0L, "A", 0.0)) :+ ((0L, "B", 1.0)))
      .toDF("x", "a", "r")
    val c = Quality.ipsOffPolicy(rare, col("x"), col("a"), col("r"),
      clipM = 2.0).collect().head
    assert(c.getDouble(4) < c.getDouble(2),
      "clipped estimate must sit below the raw one when a weight is cut")
  }

  test("mauveCurve: identical corpora give zero KLs and area ~1; " +
    "disjoint-cell corpora collapse the curve; 9 interior points") {
    import graft.ops.Analytics
    val same = ((1 to 30).map(i => (true, i % 4)) ++
      (1 to 30).map(i => (false, i % 4))).toDF("isp", "cell")
    val rs = Analytics.mauveCurve(same, col("isp"), col("cell"))
      .orderBy(col("lambda")).collect()
    assert(rs.length == 9)
    assert(rs.forall(x => x.getDouble(1) == 0.0 && x.getDouble(2) == 0.0))
    assert(rs.forall(x => x.getDouble(3) == 1.0 && x.getDouble(4) == 1.0))
    // the corner-completed AUC scores identical corpora exactly 1
    assert(rs.head.getDouble(5) == 1.0)
    // disjoint supports: P on cells {0,1}, Q on {2,3} — big KLs, tiny
    // x/y products, monotone frontier
    val disj = ((1 to 20).map(i => (true, i % 2)) ++
      (1 to 20).map(i => (false, 2 + i % 2))).toDF("isp", "cell")
    val rd = Analytics.mauveCurve(disj, col("isp"), col("cell"))
      .orderBy(col("lambda")).collect()
    assert(rd.forall(x => x.getDouble(1) > 0.0 && x.getDouble(2) > 0.0))
    val xs = rd.map(_.getDouble(3)).toSeq
    assert(xs == xs.sorted.reverse, s"x must fall as lambda rises: $xs")
    assert(rd.head.getDouble(5) > 0.0 && rd.head.getDouble(5) < 0.5,
      "disjoint corpora must score a small area")
  }

  test("plattScaling: separable scores fit a rising sigmoid; score-free " +
    "labels fit a ~= 0 with sigmoid(b) ~ smoothed base rate; guards") {
    // labels follow the score: high scores positive
    val sep = ((1 to 40).map(i => (i.toDouble, i > 20)) ++
      Seq((20.5, true), (20.4, false))).toDF("s", "y")
    val r = Quality.plattScaling(sep, col("s"), col("y")).collect().head
    assert(r.getLong(0) == 42L && r.getLong(1) == 21L)
    val aSep = r.getDouble(2)
    assert(aSep > 1.0, s"separable data must fit a steep slope: $aSep")
    // labels independent of score: slope ~ 0, intercept ~ logit of the
    // smoothed positive share (25% of 40 -> t+ ~ .917, t- ~ .031,
    // mean target ~ .25)
    val flat = (1 to 40).map(i => (i.toDouble, i % 4 == 0)).toDF("s", "y")
    val f = Quality.plattScaling(flat, col("s"), col("y")).collect().head
    val aF = f.getDouble(2); val bF = f.getDouble(3)
    assert(math.abs(aF) < 0.2, s"uncorrelated scores must fit a~0: $aF")
    val pb = 1.0 / (1.0 + math.exp(-bF))
    assert(math.abs(pb - 0.25) < 0.05,
      s"sigmoid(b)=$pb must sit near the base rate 0.25")
    // NLL of the fitted model beats the a=0,b=0 coin (2-dp check via
    // recompute): coin NLL = n * mean softplus terms at q=.5 -> ln 2
    assert(r.getDouble(4) / 42.0 < math.log(2.0),
      "fitted NLL per row must beat the uniform coin")
    // guards: single class / constant scores fail loudly
    intercept[IllegalArgumentException] {
      Quality.plattScaling((1 to 5).map(i => (i.toDouble, true))
        .toDF("s", "y"), col("s"), col("y"))
    }
    intercept[IllegalArgumentException] {
      Quality.plattScaling(Seq((1.0, true), (1.0, false))
        .toDF("s", "y"), col("s"), col("y"))
    }
  }

  test("confidentLearning: planted label flips surface as off-diagonal " +
    "mass pointing back at the true class") {
    // two sharply separated vocabularies; 3 docs of each class get the
    // WRONG label — CL should suggest their true class
    def aDoc(i: Long) = (i, "alpha beta gamma alpha beta gamma alpha", "A")
    def bDoc(i: Long) = (i, "delta epsilon zeta delta epsilon zeta", "B")
    val clean = (1L to 30L).map(i => if (i % 2 == 0) aDoc(i) else bDoc(i))
    val flipped = Seq(
      (31L, "alpha beta gamma alpha beta gamma", "B"),
      (32L, "alpha beta gamma alpha gamma", "B"),
      (33L, "delta epsilon zeta epsilon", "A"))
    val docs = (clean ++ flipped).toDF("doc_id", "text", "lang")
    val r = Quality.confidentLearning(docs, col("doc_id"), col("text"),
        col("lang"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    // the planted alpha-vocab docs labeled B are suggested A, and the
    // planted delta-vocab doc labeled A is suggested B
    assert(r.getOrElse(("B", "A"), 0L) >= 2L, s"missed planted flips: $r")
    assert(r.getOrElse(("A", "B"), 0L) >= 1L, s"missed planted flip: $r")
    // clean docs dominate the diagonal
    assert(r.getOrElse(("A", "A"), 0L) >= 12L &&
      r.getOrElse(("B", "B"), 0L) >= 12L, s"diagonal collapsed: $r")
  }

  test("lDiversity: a k-anonymous but homogeneous class fails the " +
    "diversity gate; uniform sensitive values give entropy_l = " +
    "distinct_l") {
    // class A: 12 rows, all the same sensitive value -> entropy_l 1
    // class B: 12 rows, 4 values x 3 -> entropy_l = 4 exactly
    // class C: 9 rows, values 6/2/1 -> diverse at l=2? H < ln 3
    val df = ((1 to 12).map(_ => ("A", "x", 0L)) ++
      (1 to 12).map(i => ("B", "x", (i % 4).toLong)) ++
      (Seq.fill(6)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(1)(2L))
        .map(v => ("C", "x", v)))
      .toDF("g", "h", "s")
    val r = Quality.lDiversity(df, Seq("g" -> col("g"), "h" -> col("h")),
        col("s"), l = 2.0)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), x.getDouble(4), x.getBoolean(5))))
      .toMap
    assert(r("A") == ((12L, 1L, 1.0, false)),
      s"homogeneous class must fail: ${r("A")}")
    assert(r("B")._2 == 4L && math.abs(r("B")._3 - 4.0) < 1e-3 &&
      r("B")._4, s"uniform 4-value class: ${r("B")}")
    // C: H = .667 ln(1.5) + .222 ln(4.5) + .111 ln(9) -> e^H ~ 2.21
    assert(r("C")._2 == 3L && r("C")._4 &&
      r("C")._3 > 2.0 && r("C")._3 < 3.0, s"skewed class: ${r("C")}")
  }

  test("tCloseness: hand EMDs on the ordered grid — concentration at " +
    "an edge costs more than at the middle; m = 1 reads 0") {
    // global over sv {0,1,2}: 3/3/3 -> p = (1/3, 1/3, 1/3)
    // X: all mass at the MIDDLE (sv=1): cum (-1/3, 1/3) -> EMD = 1/3
    // Y: all mass at the EDGE (sv=2): cum (-1/3, -2/3) -> EMD = 1/2
    // Z: all mass at sv=0:            cum ( 2/3,  1/3) -> EMD = 1/2
    val df = (Seq.fill(3)(("X", 1L)) ++ Seq.fill(3)(("Y", 2L)) ++
      Seq.fill(3)(("Z", 0L))).toDF("g", "s")
    val r = Quality.tCloseness(df, Seq("g" -> col("g")), col("s"),
        t = 0.4)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r("X") == ((3L, 0.333333, true)), s"middle: ${r("X")}")
    assert(r("Y") == ((3L, 0.5, false)), s"edge: ${r("Y")}")
    assert(r("Z") == ((3L, 0.5, false)), s"edge: ${r("Z")}")
    // a class matching the global distribution is 0-close
    val df2 = (Seq.fill(2)(("A", 0L)) ++ Seq.fill(2)(("A", 1L)) ++
      Seq.fill(1)(("B", 0L)) ++ Seq.fill(1)(("B", 1L))).toDF("g", "s")
    val r2 = Quality.tCloseness(df2, Seq("g" -> col("g")), col("s"),
        t = 0.1)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r2("A") == 0.0 && r2("B") == 0.0, s"global-matching: $r2")
    // m = 1 (a single sensitive value corpus-wide): emd 0, close
    val df3 = Seq(("A", 7L), ("A", 7L), ("B", 7L)).toDF("g", "s")
    val r3 = Quality.tCloseness(df3, Seq("g" -> col("g")), col("s"),
        t = 0.1).collect().map(x => x.getString(0) ->
        ((x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r3("A") == ((0.0, true)) && r3("B") == ((0.0, true)), s"$r3")
  }

  test("privacy audits keep a NULL-keyed quasi class: l-diversity and " +
    "t-closeness report it like any other class (ADVICE r12)") {
    // the NULL class mirrors Y (all mass at the edge of the {0,1,2}
    // grid) so its EMD is hand-checkable; an equi-join regression
    // would DROP the row or read its distribution as all-zero
    val df = (Seq.fill(3)(("X", 1L)) ++ Seq.fill(3)(("Y", 2L)) ++
      Seq.fill(3)((null: String, 0L))).toDF("g", "s")
    val tc = Quality.tCloseness(df, Seq("g" -> col("g")), col("s"),
        t = 0.4)
      .collect().map(x => Option(x.getString(0)) ->
        ((x.getLong(1), x.getDouble(2), x.getBoolean(3)))).toMap
    assert(tc.keySet ==
      Set(Some("X"), Some("Y"), None: Option[String]),
      s"null class lost: ${tc.keySet}")
    assert(tc(None) == ((3L, 0.5, false)), s"null@edge: ${tc(None)}")
    assert(tc(Some("X")) == ((3L, 0.333333, true)), s"${tc(Some("X"))}")
    val ld = Quality.lDiversity(df, Seq("g" -> col("g")), col("s"),
        l = 1.0)
      .collect().map(x => Option(x.getString(0)) ->
        ((x.getLong(1), x.getLong(2)))).toMap
    assert(ld(None) == ((3L, 1L)), s"null class in l-div: $ld")
  }

  test("qiniBin: a NULL score lands in bin 0 (the bottom of the " +
    "curve), never the top bin (ADVICE r12)") {
    import graft.ops.Analytics
    val bins = Seq(Some(9.9), Some(0.1), None)
      .toDF("s")
      .select(Analytics.qiniBin(col("s"), lit(10.0), 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(9L, 0L, 0L), s"null must not read as best: $bins")
  }

  test("qiniCurve: perfect targeting reads coefficient +0.5, inverted " +
    "targeting −0.5; cumulative class counts exact") {
    import graft.ops.Analytics
    // two score levels, balanced arms; conversions only where stated
    def mk(rows: Seq[(Boolean, Double, Boolean)]) = rows.toDF("t", "s", "y")
    val good = mk(Seq(
      (true, 10.0, true), (true, 10.0, true),    // high score, T converts
      (false, 10.0, false), (false, 10.0, false),
      (true, 1.0, false), (true, 1.0, false),    // low score: nothing
      (false, 1.0, false), (false, 1.0, false)))
    val r = Analytics.qiniCurve(good, col("t"), col("s"), col("y"),
      bins = 2).collect()
    assert(r.length == 2, r.mkString("|"))
    // columns: bin, n_t, n_c, conv_t, conv_c, frac, qini, random, coef
    val top = r(0)
    assert(top.getLong(0) == 1L && top.getLong(1) == 2L &&
      top.getLong(2) == 2L && top.getLong(3) == 2L &&
      top.getLong(4) == 0L, top.toString)
    assert(top.getDouble(5) == 0.5 && top.getDouble(6) == 2.0 &&
      top.getDouble(7) == 1.0, top.toString)
    assert(top.getDouble(8) == 0.5, s"perfect-targeting coef: $top")
    // inverted score: the converters sit at the BOTTOM of the ranking
    val bad = mk(Seq(
      (true, 1.0, true), (true, 1.0, true),
      (false, 1.0, false), (false, 1.0, false),
      (true, 10.0, false), (true, 10.0, false),
      (false, 10.0, false), (false, 10.0, false)))
    val r2 = Analytics.qiniCurve(bad, col("t"), col("s"), col("y"),
      bins = 2).collect()
    assert(r2(0).getDouble(8) == -0.5, s"anti-targeting coef: ${r2(0)}")
    // both curves end at the same total incremental lift
    assert(r(1).getDouble(6) == 2.0 && r2(1).getDouble(6) == 2.0)
  }

  test("shapleyAttribution: hand 2-channel coalition lattice; post-" +
    "conversion touches ignored; efficiency (shares sum to 1)") {
    import graft.ops.Analytics
    // masks: {A}: u1(conv), u2, u6(conv — B arrives AFTER buy and must
    // be ignored) -> v = 2/3; {B}: u3, u5 -> v = 0; {A,B}: u4 -> v = 1
    // phi_A = 1/2*v(A) + 1/2*(v(AB) - v(B)) = 1/3 + 1/2 = 5/6
    // phi_B = 1/2*0 + 1/2*(v(AB) - v(A)) = 1/6
    val ev = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "buy"),
      (2L, 1L, 3L, "A"),
      (3L, 1L, 4L, "B"),
      (4L, 1L, 5L, "A"), (4L, 2L, 6L, "B"), (4L, 3L, 7L, "buy"),
      (5L, 1L, 8L, "B"),
      (6L, 1L, 9L, "A"), (6L, 2L, 10L, "buy"), (6L, 3L, 11L, "B"))
      .toDF("u", "t", "i", "e")
    val r = Analytics.shapleyAttribution(ev, col("u"), col("t"),
        col("i"), col("e"), "buy", channels = Seq("A", "B"))
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2)))).toMap
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-4
    assert(near(r("A")._1, 5.0 / 6) && near(r("B")._1, 1.0 / 6),
      r.toString)
    // efficiency: shares sum to 1; phi sums to v(grand) - v(empty) = 1
    assert(near(r("A")._2 + r("B")._2, 1.0))
    assert(near(r("A")._1 + r("B")._1, 1.0))
    // channel list guards
    intercept[IllegalArgumentException] {
      Analytics.shapleyAttribution(ev, col("u"), col("t"), col("i"),
        col("e"), "buy", channels = Seq("A", "buy"))
    }
  }

}
