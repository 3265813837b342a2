package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArcDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2 atoms × 2 frames with a triclinic box line; atom lines carry
    * trailing type/bond fields the reader must ignore. */
  private lazy val fixture: String = {
    val txt =
      """2 sample tinker archive
        |20.0 30.0 40.0 90.0 80.0 70.0
        |1 O 1.0 2.0 3.0 8 2
        |2 H 4.0 5.0 6.0 1 1
        |2 sample tinker archive
        |20.0 30.0 40.0 90.0 80.0 70.0
        |1 O 1.1 2.1 3.1 8 2
        |2 H 4.1 5.1 6.1 1 1
        |""".stripMargin
    val f = Files.createTempFile("traj", ".arc")
    Files.writeString(f, txt)
    f.toString
  }

  test("scan parses atom names, ignores bond fields, detects the box " +
    "line structurally") {
    val df = spark.read.format("arc").load(fixture)
    assert(df.count() == 4)
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[String]("element") == "H")
    assert(math.abs(r.getAs[Float]("x") - 0.41f) < 1e-5)
    assert(math.abs(r.getAs[Float]("box_a") - 2.0f) < 1e-5)
    // angles pass through unscaled
    assert(r.getAs[Float]("box_beta") == 80.0f)
    assert(r.getAs[Float]("box_gamma") == 70.0f)
  }

  test("boxless archives read with null box columns") {
    val txt =
      """2 no box here
        |1 O 1.0 2.0 3.0
        |2 H 4.0 5.0 6.0
        |""".stripMargin
    val f = Files.createTempFile("nb", ".arc")
    Files.writeString(f, txt)
    val df = spark.read.format("arc").load(f.toString)
    assert(df.count() == 2)
    assert(df.filter(col("box_a").isNull).count() == 2)
  }

  test("frame_id pushdown prunes partitions at plan time") {
    val df = spark.read.format("arc").option("chunks", 1).load(fixture)
    assert(df.rdd.getNumPartitions == 2)
    val pruned = df.filter(col("frame_id") === 0)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 2)
  }

  test("write -> read round-trip; TrajLoad dispatches .arc") {
    val src = spark.read.format("arc").load(fixture)
    val dir = Files.createTempDirectory("arc_out").toString
    src.repartitionByRange(1, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
      .write.format("arc").mode("overwrite").save(dir)
    val back = graft.traj.TrajLoad.load(spark, dir)
    val cols = Seq("frame_id", "atom_id", "element", "x", "y", "z",
      "box_a", "box_beta", "box_gamma")
    val a = src.select(cols.map(col): _*).orderBy("frame_id", "atom_id")
      .collect().map(_.toString).toSeq
    val b = back.select(cols.map(col): _*).orderBy("frame_id", "atom_id")
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
