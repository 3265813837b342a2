package graft

import java.nio.file.Files

import graft.traj.TrajDataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class XyzDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 3 atoms × 3 frames, boxes on frames 0/1, none on frame 2. */
  private lazy val fixture: String = {
    val txt =
      """3
        |# Step: 0 Box: 6.0 6.0 6.0
        |C 1.0 2.0 3.0
        |O 4.0 5.0 6.0
        |H 0.5 0.5 0.5
        |3
        |# Step: 10 Box: 6.0 6.0 6.0
        |C 1.1 2.1 3.1
        |O 4.1 5.1 6.1
        |H 0.6 0.6 0.6
        |3
        |# Step: 20
        |C 1.2 2.2 3.2
        |O 4.2 5.2 6.2
        |H 0.7 0.7 0.7
        |""".stripMargin
    val f = Files.createTempFile("traj", ".xyz")
    Files.writeString(f, txt)
    f.toString
  }

  test("scan yields one row per (frame, atom) with parsed header") {
    val df = spark.read.format("xyz").load(fixture)
    assert(df.count() == 9)
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[String]("element") == "O")
    assert(math.abs(r.getAs[Float]("x") - 4.1f) < 1e-6)
    assert(r.getAs[Double]("time") == 10.0)
    assert(r.getAs[Float]("box_x") == 6.0f)
    // frame without a Box header → null box
    val noBox = spark.read.format("xyz").load(fixture)
      .filter(col("frame_id") === 2)
    assert(noBox.filter(col("box_x").isNull).count() == 3)
  }

  test("chunked partition planning: one task per `chunks` frames " +
    "(core/dask_traj.py:87-90 analog)") {
    val df = spark.read.format("xyz").option("chunks", 2).load(fixture)
    assert(df.rdd.getNumPartitions == 2) // ceil(3/2)
    assert(df.count() == 9)
  }

  test("unit conversion on scan (in_units_of analog)") {
    val df = spark.read.format("xyz").option("unit_scale", "0.1")
      .load(fixture)
    val x = df.filter(col("frame_id") === 0 && col("atom_id") === 0)
      .collect()(0).getAs[Float]("x")
    assert(math.abs(x - 0.1f) < 1e-6)
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format("xyz").load(fixture).select("element")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("element"))
    assert(df.distinct().count() == 3)
  }

  test("frame_id predicate pushdown prunes partitions at plan time") {
    val df = spark.read.format("xyz").option("chunks", 1).load(fixture)
    // full scan: 3 frames → 3 partitions
    assert(df.rdd.getNumPartitions == 3)
    val pruned = df.filter(col("frame_id") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 3)
    val range = df.filter(col("frame_id") >= 1 && col("frame_id") < 3)
    assert(range.rdd.getNumPartitions == 2)
    assert(range.count() == 6)
    // contradiction → zero partitions, empty result, no error
    assert(df.filter(col("frame_id") > 5).count() == 0)
  }

  test("limit pushdown plans only the needed frames") {
    val df = spark.read.format("xyz").option("chunks", 1).load(fixture)
      .limit(2)
    // 2 rows fit in one 3-atom frame → a single planned partition
    assert(df.rdd.getNumPartitions <= 3)
    assert(df.count() == 2)
  }

  test(".xyz.gz transparently decompresses (file_returns registers " +
    "the gzipped variant, core/dask_traj.py:50)") {
    val gz = Files.createTempFile("traj", ".xyz.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    out.write(Files.readAllBytes(java.nio.file.Paths.get(fixture)))
    out.close()
    val df = spark.read.format("xyz").load(gz.toString)
    assert(df.count() == 9)
    assert(df.filter(col("frame_id") === 1 && col("atom_id") === 1)
      .collect()(0).getAs[Float]("x") == 4.1f)
  }

  test("wide typed facade round-trips through the long layout") {
    val long0 = spark.read.format("xyz").load(fixture)
      .select(col("frame_id"), col("atom_id"),
        col("x").cast("double"), col("y").cast("double"),
        col("z").cast("double"))
    val wide = TrajDataset.wide(long0)
    assert(wide.count() == 3)
    val f0 = wide.filter(_.frame_id == 0L).collect()(0)
    assert(f0.n_atoms == 3)
    assert(f0.xyz.head == Seq(1.0, 2.0, 3.0))
    assert(f0.box.isEmpty) // no box columns in the input → None
    val back = TrajDataset.long(wide)
    assert(back.count() == 9)
  }

  test("wide facade carries per-frame unitcell when box columns present") {
    val long0 = spark.read.format("xyz").load(fixture)
      .select(col("frame_id"), col("atom_id"),
        col("x").cast("double"), col("y").cast("double"),
        col("z").cast("double"),
        col("box_x"), col("box_y"), col("box_z"))
    val wide = TrajDataset.wide(long0)
    val f0 = wide.filter(_.frame_id == 0L).collect()(0)
    assert(f0.box.contains(Seq(6.0, 6.0, 6.0)))
    // frame 2 has no Box header → None, not a partial array
    val f2 = wide.filter(_.frame_id == 2L).collect()(0)
    assert(f2.box.isEmpty)
  }
}
