package graft

import org.apache.spark.sql.functions._
import graft.ops.LinAlg

/** Gram-matrix sufficient statistics + driver-side normal-equation
  * solve: recovery of a planted linear model, residual orthogonality on
  * noisy data, and the mergeability/symmetry contracts. */
class LinAlgSpec extends SparkSpec {

  import spark.implicits._

  private def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Double] =
    df.collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap

  test("recovers a planted exact linear model") {
    // y = 2 + 3*x1 - 1*x2, no noise; quarter-grid values are
    // binary-exact so the solve is exact up to elimination arithmetic
    val rows = for { a <- 0 to 7; b <- 0 to 7 } yield {
      val (x1, x2) = (a * 0.25, b * 0.25)
      Seq(x1.toFloat, x2.toFloat, (2.0 + 3.0 * x1 - 1.0 * x2).toFloat)
    }
    val df = rows.toDF("v")
    val beta = LinAlg.solveNormal(
      cells(LinAlg.gramMatrix(df, col("v"), 2)), nFeatures = 2)
    assert(beta.length == 3)
    assert(math.abs(beta(0) - 2.0) < 1e-6)
    assert(math.abs(beta(1) - 3.0) < 1e-6)
    assert(math.abs(beta(2) + 1.0) < 1e-6)
  }

  test("residuals are orthogonal to the design on noisy data") {
    // deterministic pseudo-noise; OLS residuals must satisfy X^T r ≈ 0
    val rows = (0 until 200).map { i =>
      val x1 = (i % 17) * 0.1; val x2 = (i % 7) * 0.3
      val noise = ((i * 2654435761L % 1000) / 1000.0 - 0.5)
      Seq(x1.toFloat, x2.toFloat, (1.0 + 0.5 * x1 + 2.0 * x2 + noise).toFloat)
    }
    val df = rows.toDF("v")
    val g = cells(LinAlg.gramMatrix(df, col("v"), 2))
    val beta = LinAlg.solveNormal(g, nFeatures = 2)
    // X^T r = X^T y - (X^T X) β, all entries directly from the gram cells
    def cell(i: Int, j: Int) = g((i min j, i max j))
    for (i <- 0 to 2) {
      val xtr = cell(i, 3) - (0 to 2).map(j => cell(i, j) * beta(j)).sum
      assert(math.abs(xtr) < 1e-4, s"X^T r row $i = $xtr")
    }
  }

  test("gram matrix is the full upper triangle with row counts") {
    val df = Seq(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)).toDF("v")
    val out = LinAlg.gramMatrix(df, col("v"), 2).collect()
    assert(out.length == 10) // (d+2)(d+3)/2 for d=2 → 4*5/2
    assert(out.forall(_.getLong(3) == 2L))
    // intercept-intercept cell = row count
    val g = cells(LinAlg.gramMatrix(df, col("v"), 2))
    assert(g((0, 0)) == 2.0)
    // spot value: x1·y = 1*3 + 4*6 = 27
    assert(g((1, 3)) == 27.0)
  }

  test("partial gram matrices merge by cell sum (mergeability)") {
    val all = (0 until 40).map(i =>
      Seq((i % 5).toFloat, (i % 3).toFloat, (i % 7).toFloat))
    val (a, b) = all.splitAt(17)
    val gAll = cells(LinAlg.gramMatrix(all.toDF("v"), col("v"), 2))
    val gA = cells(LinAlg.gramMatrix(a.toDF("v"), col("v"), 2))
    val gB = cells(LinAlg.gramMatrix(b.toDF("v"), col("v"), 2))
    for (k <- gAll.keys)
      assert(math.abs(gAll(k) - (gA(k) + gB(k))) < 1e-9, s"cell $k")
  }

  test("pcaPowerProject: recovers the dominant axis, deterministic") {
    // variance concentrated on axis 0; axis 1 is small noise
    val vecs = Seq(
      (1L, Seq(10.0f, 1.0f)), (2L, Seq(8.0f, -1.0f)),
      (3L, Seq(-9.0f, 0.5f)), (4L, Seq(-10.0f, -0.5f)),
      (5L, Seq(0.1f, 1.0f)))
      .toDF("vec_id", "e")
    val p = LinAlg.pcaPowerProject(vecs, col("vec_id"), col("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // opposite-x0 vectors project with opposite signs; the
    // small-x0 vector projects near zero relative to the big ones
    assert(p(1L) * p(3L) < 0 && p(2L) * p(4L) < 0)
    assert(math.abs(p(5L)) < math.abs(p(1L)) / 5)
    // |projection| ordering follows |x0| for the dominant vectors
    assert(math.abs(p(1L)) > math.abs(p(2L)))
    // deterministic under repartition (driver trajectory is snapped)
    val p2 = LinAlg.pcaPowerProject(vecs.repartition(5), col("vec_id"),
      col("e")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p2 == p)
  }
  test("pcaPowerProject: a RAGGED corpus fails loudly (whole-corpus " +
    "min/max dim probe), not with silent NULL dots") {
    val ragged = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f, 5.0f)))
      .toDF("vec_id", "e")
    val ex = intercept[IllegalArgumentException] {
      LinAlg.pcaPowerProject(ragged, col("vec_id"), col("e"))
    }
    assert(ex.getMessage.contains("ragged"), ex.getMessage)
  }

}
