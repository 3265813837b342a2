package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Second format through the DSv2 registry (SURVEY §2.1 S4 — the
  * reference's file_returns maps .gro → [xyz, time, unitcell_vectors],
  * core/dask_traj.py:49) plus the xyz write path (S6 inverse). */
class GroDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2 atoms × 2 frames; frame 1 has a triclinic 9-term box line.
    * Fixed-width atom lines per the GROMACS format. */
  private lazy val fixture: String = {
    def atom(resId: Int, res: String, name: String, num: Int,
        x: Double, y: Double, z: Double): String =
      f"$resId%5d$res%-5s$name%-5s$num%5d$x%8.3f$y%8.3f$z%8.3f"
    val txt = Seq(
      "MD sim t= 0.0",
      "2",
      atom(1, "SOL", "OW", 1, 0.126, 1.624, 1.679),
      atom(1, "SOL", "HW1", 2, 0.190, 1.661, 1.747),
      "   6.00000   6.00000   6.00000",
      "MD sim t= 10.0",
      "2",
      atom(1, "SOL", "OW", 1, 0.230, 0.628, 0.113),
      atom(1, "SOL", "HW1", 2, 0.262, 0.612, 0.205),
      "   6.0   7.0   8.0   0.0   0.0   0.5   0.0   4.0   4.0",
      "").mkString("\n")
    val f = Files.createTempFile("traj", ".gro")
    Files.writeString(f, txt)
    f.toString
  }

  test("gro scan: one row per (frame, atom), fixed-width fields, " +
    "title time, box vectors") {
    val df = spark.read.format("gro").load(fixture)
    assert(df.count() == 4)
    val r = df.filter(col("frame_id") === 0 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[String]("res_name") == "SOL")
    assert(r.getAs[String]("atom_name") == "HW1")
    assert(math.abs(r.getAs[Float]("x") - 0.190f) < 1e-6)
    assert(r.getAs[Double]("time") == 0.0)
    assert(r.getAs[Float]("bv1x") == 6.0f)
    assert(r.getAs[Float]("bv2x") == 0.0f) // orthorhombic: off-diag 0
    // triclinic frame: off-diagonal terms populated
    val t = df.filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    assert(t.getAs[Double]("time") == 10.0)
    assert(t.getAs[Float]("bv2y") == 7.0f)
    assert(t.getAs[Float]("bv2x") == 0.5f)
    assert(t.getAs[Float]("bv3y") == 4.0f)
  }

  test("gro chunked planning mirrors the xyz source") {
    val df = spark.read.format("gro").option("chunks", 1).load(fixture)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4)
  }

  test("gro frame_id pushdown prunes partitions at plan time " +
    "(xyz parity)") {
    val df = spark.read.format("gro").option("chunks", 1).load(fixture)
    val pruned = df.filter(col("frame_id") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 2)
    assert(df.filter(col("frame_id") > 5).rdd.getNumPartitions == 0)
    // pushed range is visible in the planned scan
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PushedFilters") ||
      pruned.rdd.getNumPartitions < df.rdd.getNumPartitions)
  }

  test("gro option validation at plan time") {
    intercept[IllegalArgumentException] {
      spark.read.format("gro").option("chunks", 0).load(fixture).count()
    }
  }

  test("derived unitcell lengths/angles from gro vectors " +
    "(validation.py:232-292 lazy-column analog)") {
    val df = graft.traj.TrajDataset.withUnitcellLengthsAngles(
      spark.read.format("gro").load(fixture))
    val f0 = df.filter(col("frame_id") === 0 && col("atom_id") === 0)
      .collect()(0)
    assert(math.abs(f0.getAs[Double]("unitcell_a") - 6.0) < 1e-6)
    assert(math.abs(f0.getAs[Double]("unitcell_alpha") - 90.0) < 1e-6)
    val f1 = df.filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    // v2 = (0.5, 7, 0), v3 = (4, 4, 8)
    assert(math.abs(f1.getAs[Double]("unitcell_b")
      - math.sqrt(0.25 + 49.0)) < 1e-5)
    assert(math.abs(f1.getAs[Double]("unitcell_c")
      - math.sqrt(16.0 + 16.0 + 64.0)) < 1e-5)
  }

  test("concat-join compatibility check (core/dask_traj.py:608-627)") {
    val p = spark.read.format("gro").load(fixture)
      .select(col("frame_id"), col("atom_id"))
    val a = p.filter(col("frame_id") === 0)
    val b = p.filter(col("frame_id") === 1)
    assert(graft.traj.TrajDataset.joinCompatible(a, b))
    // atom_slice one side → incompatible, like the reference's
    // topology-mismatch refusal
    assert(!graft.traj.TrajDataset.joinCompatible(
      a, b.filter(col("atom_id") === 0)))
  }

  test("gro write path round-trips through the gro scan") {
    val dir = Files.createTempDirectory("groout").toString
    val df = spark.range(0, 2).selectExpr("id AS frame_id")
      .crossJoin(spark.range(0, 3).selectExpr("CAST(id AS INT) AS atom_id"))
      .selectExpr(
        "frame_id",
        "CAST(frame_id * 5 AS DOUBLE) AS time",
        "atom_id",
        "CAST(1 AS INT) AS res_id",
        "'SOL' AS res_name",
        "CASE WHEN atom_id = 0 THEN 'OW' ELSE 'HW' END AS atom_name",
        "CAST(frame_id + atom_id * 0.125 AS FLOAT) AS x",
        "CAST(1.25 AS FLOAT) AS y",
        "CAST(atom_id AS FLOAT) AS z",
        "CAST(6.0 AS FLOAT) AS bv1x", "CAST(0.0 AS FLOAT) AS bv1y",
        "CAST(0.0 AS FLOAT) AS bv1z", "CAST(0.0 AS FLOAT) AS bv2x",
        "CAST(7.0 AS FLOAT) AS bv2y", "CAST(0.0 AS FLOAT) AS bv2z",
        "CAST(0.0 AS FLOAT) AS bv3x", "CAST(0.0 AS FLOAT) AS bv3y",
        "CAST(8.0 AS FLOAT) AS bv3z")
      .repartitionByRange(1, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
    df.write.format("gro").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gro"))
    assert(files.length == 1)
    val back = spark.read.format("gro").load(files(0).getPath)
    assert(back.count() == 6)
    val r = back.filter(col("frame_id") === 1 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[String]("atom_name") == "HW")
    assert(math.abs(r.getAs[Float]("x") - 1.25f) < 1e-3)
    assert(r.getAs[Double]("time") == 5.0)
    assert(r.getAs[Float]("bv2y") == 7.0f)
  }

  test("mode=DROPMALFORMED drops bad records instead of failing " +
    "(ensure_type warn-and-continue analog, validation.py:97-101)") {
    // xyz: frame of 3 atoms, middle atom line corrupt
    val xyz = Files.createTempFile("perm", ".xyz")
    Files.writeString(xyz,
      "3\n# Step: 0 Box: 6.0 6.0 6.0\n" +
        "C 1.0 2.0 3.0\nH 4.0 oops 6.0\nO 7.0 8.0 9.0\n" +
        "3\n# Step: 1 Box: 6.0 6.0 6.0\n" +
        "C 1.5 2.5 3.5\nH 4.5 5.5 6.5\nO 7.5 8.5 9.5\n")
    intercept[org.apache.spark.SparkException] {
      spark.read.format("xyz").load(xyz.toString).collect()
    }
    val tolerant = spark.read.format("xyz")
      .option("mode", "DROPMALFORMED").load(xyz.toString)
    assert(tolerant.count() == 5) // 6 records, 1 dropped
    // the drop does not disturb frame arithmetic: frame 1 is intact
    assert(tolerant.filter(col("frame_id") === 1).count() == 3)
    assert(tolerant.filter(col("frame_id") === 0)
      .collect().map(_.getAs[Int]("atom_id")).sorted.toSeq == Seq(0, 2))
    // gro: same contract through the buffered reader
    val gro = Files.createTempFile("perm", ".gro")
    def groAtom(num: Int, x: String): String =
      f"${1}%5d${"SOL"}%-5s${"OW"}%-5s$num%5d$x%8s${1.0}%8.3f${2.0}%8.3f"
    Files.writeString(gro,
      "t= 0\n2\n" + groAtom(1, "0.100") + "\n" + groAtom(2, "bad!") +
        "\n   6.0   6.0   6.0\n")
    val groTol = spark.read.format("gro")
      .option("mode", "DROPMALFORMED").load(gro.toString)
    assert(groTol.count() == 1)
    assert(groTol.collect()(0).getAs[Int]("atom_id") == 0)
    // invalid mode value is a plan-time error
    intercept[IllegalArgumentException] {
      spark.read.format("xyz").option("mode", "LENIENT")
        .load(xyz.toString).count()
    }
  }

  test("malformed frames fail with file/frame/line context") {
    // xyz: non-numeric coordinate
    val badXyz = Files.createTempFile("bad", ".xyz")
    Files.writeString(badXyz, "1\n# Step: 0\nC 1.0 oops 3.0\n")
    val e1 = intercept[org.apache.spark.SparkException] {
      spark.read.format("xyz").load(badXyz.toString).collect()
    }
    assert(e1.getMessage.contains("xyz parse error") ||
      Option(e1.getCause).exists(_.getMessage.contains("xyz parse error")))
    // gro: atom line too short
    val badGro = Files.createTempFile("bad", ".gro")
    Files.writeString(badGro, "t= 0\n1\nshort line\n 6.0 6.0 6.0\n")
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format("gro").load(badGro.toString).collect()
    }
    assert(e2.getMessage.contains("gro parse error") ||
      Option(e2.getCause).exists(_.getMessage.contains("gro parse error")))
  }

  test("gro.gz reads transparently (shared XyzLines gzip machinery)") {
    val gz = Files.createTempFile("traj", ".gro.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz.toFile))
    out.write(Files.readAllBytes(java.nio.file.Paths.get(fixture)))
    out.close()
    val df = spark.read.format("gro").load(gz.toString)
    assert(df.count() == 4)
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Double]("time") == 10.0)
    assert(r.getAs[Float]("bv2y") == 7.0f)
  }

  test("gro streaming read over a shard directory picks up new shards") {
    val dir = Files.createTempDirectory("grostream").toString
    def shard(name: String, t: Double, x: Double): Unit = {
      val txt = Seq(
        s"MD sim t= $t",
        "2",
        f"${1}%5d${"SOL"}%-5s${"OW"}%-5s${1}%5d$x%8.3f${1.0}%8.3f${2.0}%8.3f",
        f"${1}%5d${"SOL"}%-5s${"HW1"}%-5s${2}%5d$x%8.3f${3.0}%8.3f${4.0}%8.3f",
        "   6.00000   6.00000   6.00000",
        "").mkString("\n")
      Files.writeString(java.nio.file.Paths.get(dir, name), txt)
    }
    shard("part-00000.gro", 0.0, 0.5)
    shard("part-00001.gro", 5.0, 1.5)
    val stream = spark.readStream.format("gro").load(dir)
    val q = stream.writeStream.format("memory").queryName("gro_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("gro_stream").count() == 4)
      // a shard arriving mid-stream lands in the next micro-batch
      shard("part-00002.gro", 10.0, 2.5)
      q.processAllAvailable()
      assert(spark.table("gro_stream").count() == 6)
      val t = spark.table("gro_stream")
        .filter(col("time") === 10.0 && col("atom_id") === 0)
        .collect()(0)
      assert(t.getAs[Float]("x") == 2.5f)
    } finally q.stop()
  }

  test("xyz streaming read over a shard directory picks up new shards") {
    val dir = Files.createTempDirectory("xyzstream").toString
    def shard(name: String, frame: Long): Unit = {
      val txt = s"2\n# Step: $frame Box: 6.0 6.0 6.0\n" +
        s"C ${frame + 0.5} 1.0 2.0\nH ${frame + 0.25} 3.0 4.0\n"
      Files.writeString(java.nio.file.Paths.get(dir, name), txt)
    }
    shard("part-00000.xyz", 0L)
    shard("part-00001.xyz", 1L)
    val stream = spark.readStream.format("xyz").load(dir)
    val q = stream.writeStream.format("memory").queryName("xyz_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("xyz_stream").count() == 4)
      // a shard arriving mid-stream lands in the next micro-batch
      shard("part-00002.xyz", 2L)
      q.processAllAvailable()
      assert(spark.table("xyz_stream").count() == 6)
      val t = spark.table("xyz_stream")
        .filter(col("time") === 2.0 && col("atom_id") === 0)
        .collect()(0)
      assert(t.getAs[Float]("x") == 2.5f)
    } finally q.stop()
  }

  test("xyz write path round-trips through the scan " +
    "(frame-grouped shards)") {
    val dir = Files.createTempDirectory("xyzout").toString
    // build canonical long-layout rows directly
    val df = spark.range(0, 3).selectExpr("id AS frame_id")
      .crossJoin(spark.range(0, 2).selectExpr("CAST(id AS INT) AS atom_id"))
      .selectExpr(
        "frame_id",
        "CAST(frame_id * 10 AS DOUBLE) AS time",
        "atom_id",
        "CASE WHEN atom_id = 0 THEN 'C' ELSE 'H' END AS element",
        "CAST(frame_id + atom_id AS FLOAT) AS x",
        "CAST(frame_id * 2 AS FLOAT) AS y",
        "CAST(atom_id AS FLOAT) AS z",
        "CAST(6.0 AS FLOAT) AS box_x",
        "CAST(6.0 AS FLOAT) AS box_y",
        "CAST(6.0 AS FLOAT) AS box_z")
      .repartitionByRange(1, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
    df.write.format("xyz").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xyz"))
    assert(files.length == 1)
    val back = spark.read.format("xyz").load(files(0).getPath)
    assert(back.count() == 6)
    val r = back.filter(col("frame_id") === 2 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[String]("element") == "H")
    assert(r.getAs[Float]("x") == 3.0f)
    assert(r.getAs[Double]("time") == 20.0)
    assert(r.getAs[Float]("box_x") == 6.0f)
  }
}
