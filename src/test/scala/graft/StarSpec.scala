package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.expr.Flags
import graft.ops.{Ann, Incremental, Star}

/** Star-schema composition, alternate-key lookup disjointness (F5/J2),
  * incremental export, flags, and ANN ranking.
  */
class StarSpec extends SparkSpec {
  import spark.implicits._

  test("altKeyLookup: primary path wins; fallback only when primary key NULL") {
    val dim = Seq(("AA", "AAL", "American"), ("BB", "BBL", "Beta"))
      .toDF("iata", "icao", "name")
    val fact = Seq(
      (1L, "AA", "WRONG"), // primary present → iata path, icao ignored
      (2L, null, "BBL"),   // primary NULL → fallback icao path
      (3L, null, "ZZZ"),   // no match either way → NULL
      (4L, "CC", "AAL"))   // primary present but unmatched → NULL (no fallback!)
      .toDF("id", "f_iata", "f_icao")
    val out = Star.altKeyLookup(fact, dim,
        ("f_iata", "iata"), ("f_icao", "icao"), Seq(("name", "airline_name")))
      .select("id", "airline_name").orderBy("id").collect()
    assert(out.toSeq == Seq(
      Row(1L, "American"), Row(2L, "Beta"), Row(3L, null), Row(4L, null)))
  }

  test("denormalize: missing dims tolerated (left joins)") {
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("fid", "dim_id")
    val dim = Seq((10L, "known")).toDF("d_id", "d_name")
    val out = Star.denormalize(fact, Seq((dim, col("dim_id") === col("d_id"))))
      .select("fid", "d_name").orderBy("fid").collect()
    assert(out.toSeq == Seq(Row(1L, "known"), Row(2L, null)))
  }

  test("surrogateId: deterministic, NULL-preserving") {
    val df = Seq((Some("AA"), Some("AAL")), (Some("AA"), Some("AAL")),
        (None: Option[String], None: Option[String]))
      .toDF("iata", "icao")
      .select(Flags.surrogateId(col("iata"), col("icao")).as("id"))
    val r = df.collect()
    assert(r(0).getLong(0) == r(1).getLong(0))
    assert(r(2).isNullAt(0))
  }

  test("surrogateId: NULL position is significant, md5-replayable") {
    // the sentinel rendering must keep (a,NULL,b) ≠ (a,b,NULL) — a bare
    // concat_ws would silently drop the NULL and collide them
    val df = Seq((Some("a"), None: Option[String], Some("b")),
        (Some("a"), Some("b"), None: Option[String]))
      .toDF("x", "y", "z")
      .select(Flags.surrogateId(col("x"), col("y"), col("z")).as("id"))
    val r = df.collect()
    assert(r(0).getLong(0) != r(1).getLong(0))
    // length-prefixed framing: a '|' INSIDE a value cannot shift field
    // boundaries, and a literal sentinel value cannot impersonate NULL
    val inj = Seq(("a|b", "c"), ("a", "b|c")).toDF("x", "y")
      .select(Flags.surrogateId(col("x"), col("y")).as("id")).collect()
    assert(inj(0).getLong(0) != inj(1).getLong(0))
    val sentinel = Seq((Some("a"), Some("␀")), (Some("a"), None: Option[String]))
      .toDF("x", "y")
      .select(Flags.surrogateId(col("x"), col("y")).as("id")).collect()
    assert(sentinel(0).getLong(0) != sentinel(1).getLong(0))
    // replayable by any engine: id = first 15 md5 hex digits of the
    // length-prefixed canon, as the q46 oracle computes it in DuckDB
    val canon = "7:airline|4:i:AA"
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val got = Seq(("airline", "i:AA")).toDF("k", "v")
      .select(Flags.surrogateId(col("k"), col("v")).as("id"))
      .head().getLong(0)
    assert(got == expected)
  }

  test("flightNum fallback chain and flightKey derivation (P11/D4)") {
    val r = Seq(
      (Some("AA100"), Some("AAL100"), Some("100")),
      (None, Some("AAL100"), Some("100")),
      (None, None, Some("100")),
      (None: Option[String], None: Option[String], None: Option[String]))
      .toDF("iata", "icao", "number")
      .select(Flags.flightNum(col("iata"), col("icao"), col("number")).as("num"))
      .as[String].collect()
    assert(r.toSeq == Seq("AA100", "AAL100", "100", "UNKNOWN"))
    val k = Seq(("AA100", "2024-05-09T10:00:00+00:00")).toDF("n", "d")
      .select(Flags.flightKey(col("n"), col("d"))).as[String].collect()
    assert(k.head == "AA100_2024-05-09T10:00:00+00:00")
  }

  test("onTimeFlag: NULL-guarded threshold") {
    val r = Seq(Some(3.0), Some(5.0), Some(6.0), None).toDF("d")
      .select(Flags.onTimeFlag(col("d"), 5.0).as("f")).collect()
    assert(r(0).getInt(0) == 1 && r(1).getInt(0) == 1 && r(2).getInt(0) == 0)
    assert(r(3).isNullAt(0))
  }

  test("exportBatch: strict watermark, ordered, bounded; advance is monotonic") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("wm", "v")
    val batch = Incremental.exportBatch(df, col("wm"), lit(1L), Seq(col("wm")), 2)
    assert(batch.select("v").as[String].collect().toSeq == Seq("b", "c"))
    val next = Incremental.advanceWatermark(batch, col("wm"), lit(99L)).collect()(0)
    assert(next.getLong(0) == 99L) // old watermark larger → kept (monotonic)
    val next2 = Incremental.advanceWatermark(batch, col("wm"), lit(0L)).collect()(0)
    assert(next2.getLong(0) == 3L)
  }

  test("hashSplit: deterministic, exhaustive, approximately proportioned") {
    import graft.ops.Sampling
    val ids = (1L to 2000L).toDF("id")
    val cuts = Seq(10 -> "val", 20 -> "test", 100 -> "train")
    val a = Sampling.hashSplit(ids, col("id"), cuts)
    val b = Sampling.hashSplit(ids, col("id"), cuts)
    assert(a.collect().toSeq == b.collect().toSeq) // run-to-run identical
    val byLabel = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum == 2000L) // exhaustive, no NULL split
    assert(byLabel("train") > 1400 && byLabel("val") > 100 && byLabel("test") > 100)
    // sample keeps exactly the ids whose bucket qualifies — join-stable
    val sampled = Sampling.hashSample(ids, col("id"), 10)
    assert(sampled.count() ==
      a.filter(col("split") === "val").count())
  }

  test("drainAll: full table exported once, in order, bounded batches") {
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("wm", "v")
    val batches = Incremental.drainAll(df, col("wm"), Seq(col("wm")),
      start = 2L, n = 3)
    assert(batches.map(_.count()).toSeq == Seq(3, 3, 2)) // rows 3..10
    val all = batches.flatMap(_.select("wm").as[Long].collect())
    assert(all == (3L to 10L)) // ordered, no dup, no gap, respects start
  }

  test("bruteForceTopK: self excluded, rank deterministic, k bounded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.01f)))
      .toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L), 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_id") == 3L) // closest to (1,0)
    assert(out(1).getAs[Long]("n_id") == 1L)
    assert(out.forall(_.getAs[Long]("n_id") != 0L))
  }

  test("ivfTopK: probed-cell search returns plausible neighbors") {
    // two well-separated cells
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), "x"), (1L, Array(0.95f, 0.05f), "x"),
      (2L, Array(0.9f, 0.1f), "x"),
      (10L, Array(0.0f, 1.0f), "y"), (11L, Array(0.05f, 0.95f), "y"))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L), "label", 2)
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n_id")).toSet == Set(1L, 2L)) // same cell only
  }
  test("SparkEntry.entry: the driver smoke contract — rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }
}
