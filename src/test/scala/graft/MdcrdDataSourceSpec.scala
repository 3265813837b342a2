package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MdcrdDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 4 atoms × 2 frames with box: 12 coords/frame → 2 coordinate lines
    * (10 + 2) + 1 box line. Coordinates 1.0..12.0 / 13.0..24.0 in Å;
    * fields are fixed 8-char columns with NO separating whitespace on
    * the negative-value line. */
  private lazy val fixture: String = {
    def line(vs: Seq[Double]): String =
      vs.map(v => f"$v%8.3f").mkString
    val f1 = (1 to 12).map(_.toDouble)
    val f2 = (13 to 24).map(_.toDouble)
    val txt = (Seq("test amber trajectory") ++ Seq(
      line(f1.take(10)), line(f1.drop(10)), line(Seq(20.0, 30.0, 40.0)),
      line(f2.take(10)), line(f2.drop(10)), line(Seq(20.0, 30.0, 40.0))))
      .mkString("", "\n", "\n")
    val f = Files.createTempFile("traj", ".mdcrd")
    Files.writeString(f, txt)
    f.toString
  }

  test("scan parses fixed-width frames, requires natoms, applies the " +
    "Angstrom-to-nm default scale") {
    val df = spark.read.format("mdcrd")
      .option("natoms", 4).option("box", "true").load(fixture)
    assert(df.count() == 8)
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 1)
      .collect()(0)
    // atom 1 of frame 2: coords 16,17,18 Å → 1.6,1.7,1.8 nm
    assert(math.abs(r.getAs[Float]("x") - 1.6f) < 1e-5)
    assert(math.abs(r.getAs[Float]("y") - 1.7f) < 1e-5)
    assert(math.abs(r.getAs[Float]("z") - 1.8f) < 1e-5)
    assert(math.abs(r.getAs[Float]("box_a") - 2.0f) < 1e-5)
    assert(math.abs(r.getAs[Float]("box_c") - 4.0f) < 1e-5)
    // natoms is required
    val e = intercept[IllegalArgumentException] {
      spark.read.format("mdcrd").load(fixture).collect()
    }
    assert(e.getMessage.contains("natoms"))
  }

  test("abutting negative fixed-width fields parse by 8-char slicing") {
    // -99.999-100.001 style: whitespace split would fuse the fields
    val txt = "t\n" +
      f"${-99.999}%8.3f" + f"${-100.001}%8.3f" + f"${1.5}%8.3f" + "\n"
    val f = Files.createTempFile("neg", ".mdcrd")
    Files.writeString(f, txt)
    val r = spark.read.format("mdcrd").option("natoms", 1)
      .option("unit_scale", "1.0").load(f.toString).collect()(0)
    assert(math.abs(r.getAs[Float]("x") + 99.999f) < 1e-4)
    assert(math.abs(r.getAs[Float]("y") + 100.001f) < 1e-4)
    assert(math.abs(r.getAs[Float]("z") - 1.5f) < 1e-4)
  }

  test("frame_id pushdown prunes partitions at plan time") {
    val df = spark.read.format("mdcrd").option("natoms", 4)
      .option("box", "true").option("chunks", 1).load(fixture)
    assert(df.rdd.getNumPartitions == 2)
    val pruned = df.filter(col("frame_id") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 4)
  }

  test("write -> read round-trip inverts the unit scale") {
    val src = spark.read.format("mdcrd").option("natoms", 4)
      .option("box", "true").load(fixture)
    val dir = Files.createTempDirectory("mdcrd_out").toString
    src.repartitionByRange(1, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
      .write.format("mdcrd").option("box", "true")
      .mode("overwrite").save(dir)
    val back = spark.read.format("mdcrd").option("natoms", 4)
      .option("box", "true").load(dir)
    val a = src.select("frame_id", "atom_id", "x", "y", "z", "box_a")
      .orderBy("frame_id", "atom_id").collect().map(_.toString).toSeq
    val b = back.select("frame_id", "atom_id", "x", "y", "z", "box_a")
      .orderBy("frame_id", "atom_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("TrajLoad dispatches .mdcrd and .crd with pass-through options") {
    val df = graft.traj.TrajLoad.load(spark, fixture,
      options = Map("natoms" -> "4", "box" -> "true"))
    assert(df.count() == 8)
  }
}
