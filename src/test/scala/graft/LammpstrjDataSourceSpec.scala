package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LammpstrjDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2 atoms × 2 frames, orthogonal box 6×8×10, ATOMS declares an
    * extra trailing column the reader must skip by layout. */
  private lazy val fixture: String = {
    val txt =
      """ITEM: TIMESTEP
        |0
        |ITEM: NUMBER OF ATOMS
        |2
        |ITEM: BOX BOUNDS pp pp pp
        |0.0 6.0
        |1.0 9.0
        |-2.0 8.0
        |ITEM: ATOMS id type x y z vx
        |1 C 1.0 2.0 3.0 0.9
        |2 O 4.0 5.0 6.0 0.8
        |ITEM: TIMESTEP
        |100
        |ITEM: NUMBER OF ATOMS
        |2
        |ITEM: BOX BOUNDS pp pp pp
        |0.0 6.0
        |1.0 9.0
        |-2.0 8.0
        |ITEM: ATOMS id type x y z vx
        |1 C 1.1 2.1 3.1 0.7
        |2 O 4.1 5.1 6.1 0.6
        |""".stripMargin
    val f = Files.createTempFile("traj", ".lammpstrj")
    Files.writeString(f, txt)
    f.toString
  }

  test("scan parses self-describing ATOMS layout, box lengths, " +
    "orthogonal angles") {
    val df = spark.read.format("lammpstrj").load(fixture)
    assert(df.count() == 4)
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[String]("element") == "O")
    assert(math.abs(r.getAs[Float]("x") - 4.1f) < 1e-6)
    assert(r.getAs[Double]("time") == 100.0)
    assert(r.getAs[Float]("box_a") == 6.0f)
    assert(r.getAs[Float]("box_b") == 8.0f)
    assert(r.getAs[Float]("box_c") == 10.0f)
    assert(r.getAs[Float]("box_alpha") == 90.0f)
  }

  test("triclinic bounds: tilt factors convert to lengths + angles " +
    "via the LAMMPS bound-adjustment formulas") {
    // lx=4, ly=3, lz=5, xy=1, xz=0, yz=0 after adjustment:
    // xlo_b=0, xhi_b=5 carry max tilt 1 → lx=4; |b|=sqrt(1+9)=3.1623
    // gamma = acos(xy/|b|) = acos(1/3.1623) = 71.565°
    val txt =
      """ITEM: TIMESTEP
        |0
        |ITEM: NUMBER OF ATOMS
        |1
        |ITEM: BOX BOUNDS xy xz yz pp pp pp
        |0.0 5.0 1.0
        |0.0 3.0 0.0
        |0.0 5.0 0.0
        |ITEM: ATOMS id x y z
        |1 0.5 0.5 0.5
        |""".stripMargin
    val f = Files.createTempFile("tri", ".lammpstrj")
    Files.writeString(f, txt)
    val r = spark.read.format("lammpstrj").load(f.toString).collect()(0)
    assert(math.abs(r.getAs[Float]("box_a") - 4.0f) < 1e-5)
    assert(math.abs(r.getAs[Float]("box_b") - 3.16228f) < 1e-4)
    assert(math.abs(r.getAs[Float]("box_c") - 5.0f) < 1e-5)
    assert(math.abs(r.getAs[Float]("box_gamma") - 71.5651f) < 1e-3)
    assert(math.abs(r.getAs[Float]("box_beta") - 90.0f) < 1e-5)
    // no element/type column → placeholder
    assert(r.getAs[String]("element") == "X")
  }

  test("frame_id pushdown prunes partitions at plan time") {
    val df = spark.read.format("lammpstrj").option("chunks", 1)
      .load(fixture)
    assert(df.rdd.getNumPartitions == 2)
    val pruned = df.filter(col("frame_id") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 2)
  }

  test("gzip variant reads transparently") {
    val raw = Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val gz = Files.createTempFile("traj", ".lammpstrj.gz")
    val os = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz.toFile))
    os.write(raw); os.close()
    val df = spark.read.format("lammpstrj").load(gz.toString)
    assert(df.count() == 4)
  }

  test("write → read round-trip through a shard directory with " +
    "globally contiguous frame ids") {
    val src = spark.read.format("lammpstrj").load(fixture)
    val dir = Files.createTempDirectory("lmp_out").toString
    src.repartitionByRange(2, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
      .write.format("lammpstrj").mode("overwrite").save(dir)
    val back = spark.read.format("lammpstrj").load(dir)
    assert(back.count() == 4)
    val a = src.select("frame_id", "atom_id", "element", "x", "y", "z",
      "box_a", "box_b", "box_c").orderBy("frame_id", "atom_id")
      .collect().map(_.toString).toSeq
    val b = back.select("frame_id", "atom_id", "element", "x", "y", "z",
      "box_a", "box_b", "box_c").orderBy("frame_id", "atom_id")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("TrajLoad dispatches .lammpstrj through the registry") {
    val df = graft.traj.TrajLoad.load(spark, fixture)
    assert(df.count() == 4)
  }

  test("scaled coordinates fail with a clear error") {
    val txt =
      """ITEM: TIMESTEP
        |0
        |ITEM: NUMBER OF ATOMS
        |1
        |ITEM: BOX BOUNDS pp pp pp
        |0.0 1.0
        |0.0 1.0
        |0.0 1.0
        |ITEM: ATOMS id xs ys zs
        |1 0.5 0.5 0.5
        |""".stripMargin
    val f = Files.createTempFile("scaled", ".lammpstrj")
    Files.writeString(f, txt)
    val e = intercept[Exception] {
      spark.read.format("lammpstrj").load(f.toString).collect()
    }
    assert(e.getMessage.contains("xs"))
  }
}
