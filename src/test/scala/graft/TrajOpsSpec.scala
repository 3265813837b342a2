package graft

import graft.traj.TrajOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable geometry — the analog of the reference's 2-atom
  * tests/test.xyz fixture unit tests (SURVEY §5). */
class TrajOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def one(colExprs: (String, org.apache.spark.sql.Column)*)
      : Map[String, Double] = {
    val df0 = spark.range(1).toDF("i")
    val df = colExprs.foldLeft(df0) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }
    val row = df.collect()(0)
    colExprs.map { case (n, _) =>
      n -> row.getAs[Any](n).toString.toDouble
    }.toMap
  }

  test("Euclidean distance: 3-4-5 triangle") {
    val r = one("d" -> TrajOps.dist(lit(0.0), lit(0.0), lit(0.0),
      lit(3.0), lit(4.0), lit(0.0)))
    assert(r("d") === 5.0)
  }

  test("MIC folds displacement into half-box (distance.py:50-58)") {
    // delta=5 in a box of 6 → image at -1
    val r = one(
      "m" -> TrajOps.micDelta(lit(5.0), lit(6.0)),
      "d" -> TrajOps.distMic(lit(0.0), lit(0.0), lit(0.0),
        lit(5.0), lit(0.0), lit(0.0), lit(6.0), lit(6.0), lit(6.0)))
    assert(r("m") === -1.0)
    assert(r("d") === 1.0)
  }

  test("right angle is pi/2 (angle.py:142-176)") {
    val r = one("a" -> TrajOps.angleRad(lit(1.0), lit(0.0), lit(0.0),
      lit(0.0), lit(1.0), lit(0.0)))
    assert(math.abs(r("a") - math.Pi / 2) < 1e-12)
  }

  test("degenerate cosine is clamped, not NaN") {
    // parallel vectors with rounding noise would push |cos| past 1
    val r = one("a" -> TrajOps.angleRad(lit(1.0), lit(1.0), lit(1.0),
      lit(1.0), lit(1.0), lit(1.0)))
    assert(r("a") === 0.0)
  }

  test("triclinic MIC reduces to per-axis MIC on an orthorhombic box") {
    val box = TrajOps.triBox(6.0, 7.0, 8.0, 90.0, 90.0, 90.0)
    // snap zeroes the off-diagonals at 90° angles
    assert(box.bx == 0.0 && box.cx == 0.0 && box.cy == 0.0)
    for ((dx, dy, dz) <- Seq((5.5, -6.9, 15.2), (0.1, 0.2, 0.3),
      (-11.7, 3.6, -4.1))) {
      val r = one(
        "tri" -> TrajOps.distMicTriclinic(lit(dx), lit(dy), lit(dz), box),
        "ortho" -> TrajOps.distMic(lit(dx), lit(dy), lit(dz),
          lit(0.0), lit(0.0), lit(0.0), lit(6.0), lit(7.0), lit(8.0)))
      assert(math.abs(r("tri") - r("ortho")) < 1e-9,
        s"($dx,$dy,$dz): tri=${r("tri")} ortho=${r("ortho")}")
    }
  }

  test("triclinic MIC: lattice-vector displacements fold to zero") {
    val b = TrajOps.triBox(6.0, 7.0, 8.0, 60.0, 60.0, 90.0)
    // a displacement equal to any Bravais vector (or a sum of them) is
    // periodically equivalent to zero
    val cases = Seq(
      (b.ax, 0.0, 0.0),
      (b.bx, b.by, 0.0),
      (b.cx, b.cy, b.cz),
      (b.ax + b.cx, b.cy, b.cz),
      (2 * b.ax + b.bx, b.by, 0.0))
    cases.foreach { case (dx, dy, dz) =>
      val r = one("d" -> TrajOps.distMicTriclinic(
        lit(dx), lit(dy), lit(dz), b))
      assert(r("d") < 1e-9, s"($dx,$dy,$dz) -> ${r("d")}")
    }
    // and a small displacement is already minimal
    val r = one("d" -> TrajOps.distMicTriclinic(
      lit(0.3), lit(-0.2), lit(0.1), b))
    assert(math.abs(r("d") - math.sqrt(0.09 + 0.04 + 0.01)) < 1e-9)
  }

  test("orthorhombic box vectors are diagonal after snap " +
    "(validation.py:146-229)") {
    val cols = TrajOps.boxVectors(lit(6.0), lit(6.0), lit(6.0),
      lit(90.0), lit(90.0), lit(90.0))
    val r = one(cols: _*)
    assert(r("vax") === 6.0 && r("vby") === 6.0 && r("vcz") === 6.0)
    assert(r("vbx") === 0.0 && r("vcx") === 0.0 && r("vcy") === 0.0)
  }

  test("box roundtrip recovers lengths and angles " +
    "(tests/test_utils.py:106-111 analog)") {
    val vecs = TrajOps.boxVectors(lit(5.0), lit(6.0), lit(7.0),
      lit(60.0), lit(70.0), lit(80.0))
    val df0 = spark.range(1).toDF("i")
    val withVec = vecs.foldLeft(df0) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }
    val back = TrajOps.vectorsToBox(col("vax"), col("vay"), col("vaz"),
      col("vbx"), col("vby"), col("vbz"),
      col("vcx"), col("vcy"), col("vcz"))
    val df = back.foldLeft(withVec) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }
    val row = df.collect()(0)
    val got = Seq("r_a", "r_b", "r_c", "r_alpha", "r_beta", "r_gamma")
      .map(row.getAs[Double])
    val want = Seq(5.0, 6.0, 7.0, 60.0, 70.0, 80.0)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"$g != $w")
    }
  }

  test("periodic closest contact flips the winner the MIC fold favors " +
    "(distance.py:394-426, periodic=True default)") {
    // hand-computed: query atom at origin in a 6×7×8 box; candidate A at
    // (1,0,0) → dist 1 both ways; candidate B at (5.9,0,0) → plain dist
    // 5.9 but MIC dist |5.9 − 6·round(5.9/6)| = 0.1. Non-periodic top-1
    // is A; periodic top-1 must be B.
    import spark.implicits._
    val cands = Seq((1L, 1.0, 0.0, 0.0), (2L, 5.9, 0.0, 0.0))
      .toDF("cand", "x", "y", "z")
    val plain = cands.select(col("cand"),
      TrajOps.dist(lit(0.0), lit(0.0), lit(0.0),
        col("x"), col("y"), col("z")).as("d"))
      .orderBy("d").limit(1).collect()(0)
    val mic = cands.select(col("cand"),
      sqrt(TrajOps.norm2(
        TrajOps.micDelta(col("x") - 0.0, lit(6.0)),
        TrajOps.micDelta(col("y") - 0.0, lit(7.0)),
        TrajOps.micDelta(col("z") - 0.0, lit(8.0)))).as("d"))
      .orderBy("d").limit(1).collect()(0)
    assert(plain.getLong(0) == 1L && math.abs(plain.getDouble(1) - 1.0) < 1e-12)
    assert(mic.getLong(0) == 2L && math.abs(mic.getDouble(1) - 0.1) < 1e-9)
  }

  test("q_traj_closest_contact_periodic: one row, dist_mic <= plain dist " +
    "(MIC can only shorten)") {
    val d = "/root/testdata/sf0.001"
    val per = graft.traj.TrajQueries.trajClosestContactPeriodic(spark, d)
      .collect()
    val plain = graft.traj.TrajQueries.trajClosestContact(spark, d)
      .collect()
    assert(per.length == 1 && plain.length == 1)
    assert(per(0).getAs[Double]("dist_mic") <=
      plain(0).getAs[Double]("dist") + 1e-9)
  }
}
