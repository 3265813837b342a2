package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InpcrdDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def f12(v: Double): String =
    String.format(java.util.Locale.ROOT, "%12.7f", v)

  /** 3 atoms, coords 1..9 Å, velocity block, box 20/30/40 Å 90°. */
  private def restart(time: Double, shift: Double): String = {
    val coords = (1 to 9).map(_ + shift)
    val vels = (1 to 9).map(_ * 0.01)
    (Seq("amber restart", s"     3  ${time}") ++
      coords.grouped(6).map(_.map(f12).mkString) ++
      vels.grouped(6).map(_.map(f12).mkString) ++
      Seq(Seq(20.0, 30.0, 40.0, 90.0, 90.0, 90.0).map(f12).mkString))
      .mkString("", "\n", "\n")
  }

  test("single restart file reads as one frame with header time, " +
    "velocity block skipped, box lengths + angles") {
    val f = Files.createTempFile("r", ".rst7")
    Files.writeString(f, restart(12.5, 0.0))
    val df = spark.read.format("inpcrd").load(f.toString)
    assert(df.count() == 3)
    val r = df.filter(col("atom_id") === 1).collect()(0)
    assert(r.getAs[Long]("frame_id") == 0L)
    assert(r.getAs[Double]("time") == 12.5)
    // atom 1: coords 4,5,6 Å → 0.4,0.5,0.6 nm
    assert(math.abs(r.getAs[Float]("x") - 0.4f) < 1e-5)
    assert(math.abs(r.getAs[Float]("z") - 0.6f) < 1e-5)
    assert(math.abs(r.getAs[Float]("box_a") - 2.0f) < 1e-5)
    // angles are NOT unit-scaled
    assert(r.getAs[Float]("box_gamma") == 90.0f)
  }

  test("a directory of restarts reads as one trajectory in shard " +
    "name order; frame_id pushdown prunes FILES before any I/O") {
    val dir = Files.createTempDirectory("rsts")
    Files.writeString(dir.resolve("a000.rst7"), restart(1.0, 0.0))
    Files.writeString(dir.resolve("a001.rst7"), restart(2.0, 10.0))
    Files.writeString(dir.resolve("a002.rst7"), restart(3.0, 20.0))
    val df = spark.read.format("inpcrd").option("chunks", 1)
      .load(dir.toString)
    assert(df.count() == 9)
    assert(df.rdd.getNumPartitions == 3)
    val t = df.filter(col("frame_id") === 2).select("time").distinct()
      .collect()(0).getDouble(0)
    assert(t == 3.0)
    val pruned = df.filter(col("frame_id") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 3)
  }

  test("block detection: coords-only and coords+box files parse " +
    "without options") {
    val coordsOnly = (Seq("t", "     3") ++
      (1 to 9).map(_.toDouble).grouped(6).map(_.map(f12).mkString))
      .mkString("", "\n", "\n")
    val f1 = Files.createTempFile("co", ".inpcrd")
    Files.writeString(f1, coordsOnly)
    val d1 = spark.read.format("inpcrd").load(f1.toString)
    assert(d1.count() == 3)
    assert(d1.filter(col("box_a").isNull).count() == 3)
    // time defaults to the frame ordinal when the header has none
    assert(d1.select("time").distinct().collect()(0).getDouble(0) == 0.0)
    val withBox = (Seq("t", "     3") ++
      (1 to 9).map(_.toDouble).grouped(6).map(_.map(f12).mkString) ++
      Seq(Seq(20.0, 30.0, 40.0, 90.0, 90.0, 90.0).map(f12).mkString))
      .mkString("", "\n", "\n")
    val f2 = Files.createTempFile("cb", ".inpcrd")
    Files.writeString(f2, withBox)
    val d2 = spark.read.format("inpcrd").load(f2.toString)
    assert(d2.filter(col("box_a").isNotNull).count() == 3)
  }

  test("natoms <= 2 ambiguity is pinned by the velocities option") {
    // 1 atom: coordLines = 1; coords+box (2 extra lines... actually
    // coords(1) + box(1) = 2 = 2*coordLines → auto reads velocities.
    // velocities=false forces the coords+box reading.
    val txt = (Seq("t", "     1") ++
      Seq(Seq(1.0, 2.0, 3.0).map(f12).mkString) ++
      Seq(Seq(20.0, 30.0, 40.0, 90.0, 90.0, 90.0).map(f12).mkString))
      .mkString("", "\n", "\n")
    val f = Files.createTempFile("amb", ".rst7")
    Files.writeString(f, txt)
    val d = spark.read.format("inpcrd").option("velocities", "false")
      .load(f.toString)
    assert(d.filter(col("box_a").isNotNull).count() == 1)
  }

  test("TrajLoad dispatches .rst7/.inpcrd/.restrt") {
    val f = Files.createTempFile("r", ".inpcrd")
    Files.writeString(f, restart(5.0, 0.0))
    assert(graft.traj.TrajLoad.formatFor(f.toString) == "inpcrd")
    assert(graft.traj.TrajLoad.load(spark, f.toString).count() == 3)
  }

  test("streaming read: each new restart file is one frame, ids " +
    "continue across micro-batches") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("inpstream")
    Files.writeString(dir.resolve("r000.rst7"), restart(1.0, 0.0))
    Files.writeString(dir.resolve("r001.rst7"), restart(2.0, 10.0))
    val stream = spark.readStream.format("inpcrd").load(dir.toString)
    val q = stream.writeStream.format("memory").queryName("inp_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("inp_stream").count() == 6) // 2 files x 3
      Files.writeString(dir.resolve("r002.rst7"), restart(3.0, 20.0))
      q.processAllAvailable()
      assert(spark.table("inp_stream").count() == 9)
      val r = spark.table("inp_stream")
        .filter(col("frame_id") === 2 && col("atom_id") === 0)
        .collect()(0)
      assert(r.getAs[Double]("time") == 3.0)
    } finally q.stop()
  }
}
