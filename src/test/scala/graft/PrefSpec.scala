package graft

import org.apache.spark.sql.functions._
import graft.ops.Pref

/** Bradley–Terry preference aggregation: closed-form two-player case,
  * strength/win-rate ordering, winless fixed point, normalization and
  * partition invariance. */
class PrefSpec extends SparkSpec {

  import spark.implicits._

  test("two evenly-matched players land exactly on 0.5/0.5 (closed form " +
    "of the MM step)") {
    val duels = Seq(("A", "B"), ("B", "A")).toDF("w", "l")
    val r = Pref.bradleyTerry(duels, col("w"), col("l"))
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r("A") == ((0.5, 1.0, 2.0)))
    assert(r("B") == ((0.5, 1.0, 2.0)))
  }

  test("strengths order with dominance; a winless player sits at the " +
    "W_i = 0 fixed point; strengths normalize to ~1; partition-invariant") {
    // A beats B 3:1, both beat C always → strength A > B > C = 0
    val duels = Seq(
      ("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"),
      ("A", "C"), ("A", "C"), ("B", "C"), ("B", "C"))
      .toDF("w", "l")
    val out = Pref.bradleyTerry(duels, col("w"), col("l"))
    val r = out.collect().map(x => x.getString(0) ->
      ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r("A")._1 > r("B")._1 && r("B")._1 > r("C")._1)
    assert(r("C")._1 == 0.0 && r("C")._2 == 0.0 && r("C")._3 == 4.0)
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-5)
    assert(r("A")._2 == 5.0 && r("A")._3 == 6.0)
    val r7 = Pref.bradleyTerry(duels.repartition(7), col("w"), col("l"))
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r7 == r)
  }

  test("duel multiplicity via weight ≡ repeated rows") {
    val rep = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val wtd = Seq(("A", "B", 2L), ("B", "A", 1L)).toDF("w", "l", "n")
    val a = Pref.bradleyTerry(rep, col("w"), col("l"))
      .collect().map(_.toString).sorted.toSeq
    val b = Pref.bradleyTerry(wtd, col("w"), col("l"), col("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
  test("fractional duel weights are honored, not truncated: a 0.5/0.5 " +
    "draw pair ≡ one win each way") {
    // pre-fix, cast(long) truncated 0.5 -> 0 and dropped BOTH duels
    val draws = Seq(("A", "B", 0.5), ("B", "A", 0.5)).toDF("w", "l", "n")
    val whole = Seq(("A", "B", 1L), ("B", "A", 1L)).toDF("w", "l", "n")
    val rd = Pref.bradleyTerry(draws, col("w"), col("l"), col("n"))
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(rd("A") == ((0.5, 0.5, 1.0)) && rd("B") == ((0.5, 0.5, 1.0)))
    val rw = Pref.bradleyTerry(whole, col("w"), col("l"), col("n"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(rd("A")._1 == rw("A") && rd("B")._1 == rw("B"))
    // and btCalibration carries the halves too
    val cal = Pref.btCalibration(draws, col("w"), col("l"),
      Pref.bradleyTerry(draws, col("w"), col("l"), col("n"))
        .select(col("item"), col("strength")), col("n")).collect()(0)
    assert(cal.getDouble(2) == 1.0 && cal.getDouble(3) == 0.5 &&
      cal.getDouble(4) == 0.5)
  }

  test("btCalibration: observed rates by hand, perfect fit on the " +
    "symmetric two-player case, abs_err identity") {
    val even = Seq(("A", "B"), ("B", "A")).toDF("w", "l")
    val st = Pref.bradleyTerry(even, col("w"), col("l"))
      .select(col("item"), col("strength"))
    val r = Pref.btCalibration(even, col("w"), col("l"), st).collect()(0)
    // observed 1/2, predicted 0.5/(0.5+0.5) = 0.5 -> err 0
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5 &&
      r.getDouble(6) == 0.0)
    val skew = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("w", "l")
    val st2 = Pref.bradleyTerry(skew, col("w"), col("l"))
      .select(col("item"), col("strength"))
    val r2 = Pref.btCalibration(skew, col("w"), col("l"), st2).collect()(0)
    assert(r2.getDouble(4) == 0.75) // observed 3/4
    assert(r2.getDouble(6) == BigDecimal(
      math.abs(r2.getDouble(4) - r2.getDouble(5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // two players: the BT fixed point reproduces the observed rate
    assert(math.abs(r2.getDouble(5) - 0.75) < 0.02, r2.toString)
  }
}
