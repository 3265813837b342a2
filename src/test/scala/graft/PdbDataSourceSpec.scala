package graft

import java.nio.file.Files

import graft.sources.PdbTopology
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third format through the DSv2 registry (SURVEY §2.1 S4): the
  * reference registers `.pdb`/`.pdb.gz` (core/dask_traj.py:36-37) and
  * its own real-data fixture pair is test.xtc + test.pdb — the PDB
  * supplies the topology whose element masses feed COM
  * (geometry/distance.py:319). Fixture mirrors MDTraj-written PDBs:
  * CRYST1 + MODEL/ENDMDL + fixed-column ATOM records. */
class PdbDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def atom(serial: Int, name: String, res: String, chain: String,
      resSeq: Int, x: Double, y: Double, z: Double, elem: String): String =
    f"ATOM  $serial%5d ${name}%-4s $res%-3s $chain$resSeq%4d    " +
      f"$x%8.3f$y%8.3f$z%8.3f  1.00  0.00          $elem%-2s"

  /** 3 atoms × 2 models, triclinic CRYST1 (Å in file). */
  private lazy val fixture: String = {
    val txt = Seq(
      "REMARK   1 CREATED WITH MDTraj 1.9.1, 2017-10-30",
      "CRYST1   68.555   68.555   68.555  60.00  60.00  90.00 P 1           1",
      "MODEL        0",
      atom(1, "N", "MET", "A", 1, 46.922, 74.356, 20.700, "N"),
      atom(2, "H", "MET", "A", 1, 45.936, 74.558, 20.780, "H"),
      atom(3, "CA", "MET", "A", 1, 47.220, 74.206, 21.654, "C"),
      "TER       4      MET A   1",
      "ENDMDL",
      "MODEL        1",
      atom(1, "N", "MET", "A", 1, 46.800, 74.300, 20.650, "N"),
      atom(2, "H", "MET", "A", 1, 45.900, 74.500, 20.700, "H"),
      atom(3, "CA", "MET", "A", 1, 47.100, 74.100, 21.600, "C"),
      "TER       4      MET A   1",
      "ENDMDL",
      "END",
      "").mkString("\n")
    val f = Files.createTempFile("traj", ".pdb")
    Files.writeString(f, txt)
    f.toString
  }

  test("pdb scan: multi-model frames, fixed columns, Å→nm, CRYST1 box") {
    val df = spark.read.format("pdb").load(fixture)
    assert(df.count() == 6)
    assert(df.select("frame_id").distinct().count() == 2)
    val r = df.filter(col("frame_id") === 0 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[String]("name") == "CA")
    assert(r.getAs[String]("res_name") == "MET")
    assert(r.getAs[String]("chain") == "A")
    assert(r.getAs[Int]("res_seq") == 1)
    assert(r.getAs[String]("element") == "C")
    // 47.220 Å → 4.7220 nm
    assert(math.abs(r.getAs[Float]("x") - 4.7220f) < 1e-4)
    // CRYST1 lengths nm-scaled, angles in degrees
    assert(math.abs(r.getAs[Float]("box_a") - 6.8555f) < 1e-4)
    assert(r.getAs[Float]("box_alpha") == 60.0f)
    assert(r.getAs[Float]("box_gamma") == 90.0f)
    // second model differs
    val r1 = df.filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    assert(math.abs(r1.getAs[Float]("x") - 4.6800f) < 1e-4)
  }

  test("pdb chunked planning: one partition per `chunks` models") {
    val df = spark.read.format("pdb").option("chunks", 1).load(fixture)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 6)
  }

  test("pdb frame_id pushdown prunes whole models at plan time " +
    "(xyz parity; an unpruned scan would read every MODEL to serve " +
    "frame_id = 0)") {
    val df = spark.read.format("pdb").option("chunks", 1).load(fixture)
    val pruned = df.filter(col("frame_id") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.select("frame_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(df.filter(col("frame_id") >= 7).rdd.getNumPartitions == 0)
  }

  test("MODEL-less file is a single frame; missing CRYST1 → null box") {
    val txt = Seq(
      atom(1, "O", "HOH", "B", 5, 1.000, 2.000, 3.000, "O"),
      atom(2, "H1", "HOH", "B", 5, 1.500, 2.500, 3.500, "H"),
      "END", "").mkString("\n")
    val f = Files.createTempFile("single", ".pdb")
    Files.writeString(f, txt)
    val df = spark.read.format("pdb").load(f.toString)
    assert(df.count() == 2)
    assert(df.select("frame_id").distinct().collect().map(_.getLong(0))
      .toSeq == Seq(0L))
    val r = df.filter(col("atom_id") === 0).collect()(0)
    assert(r.isNullAt(r.fieldIndex("box_a")))
    assert(math.abs(r.getAs[Float]("x") - 0.1f) < 1e-6)
  }

  test("element column feeds real IUPAC masses into a topology dimension") {
    val topo = PdbTopology.topology(spark, fixture).collect()
      .sortBy(_.getAs[Int]("atom_id"))
    assert(topo.length == 3) // frame 0 only
    assert(topo(0).getAs[Double]("mass") == 14.007) // N
    assert(topo(1).getAs[Double]("mass") == 1.008)  // H
    assert(topo(2).getAs[Double]("mass") == 12.011) // C
    // mass-weighted COM over the pdb trajectory: topology join works
    val pos = spark.read.format("pdb").load(fixture)
      .select("frame_id", "atom_id", "x", "y", "z")
    val com = pos.join(broadcast(
        PdbTopology.topology(spark, fixture).select("atom_id", "mass")),
        "atom_id")
      .groupBy("frame_id")
      .agg((sum(col("x") * col("mass")) / sum(col("mass"))).as("com_x"))
      .collect()
    assert(com.length == 2)
    com.foreach(r => assert(!r.isNullAt(1)))
  }

  test("pdb option validation at plan time") {
    intercept[IllegalArgumentException] {
      spark.read.format("pdb").option("chunks", 0).load(fixture).count()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("pdb").option("chunks", "xyz").load(fixture).count()
    }
  }

  test("malformed ATOM records fail with file/frame/line context") {
    val bad = Files.createTempFile("bad", ".pdb")
    Files.writeString(bad, Seq(
      "MODEL        0",
      "ATOM      1  N   MET A   1        oops  74.356  20.700",
      "ENDMDL", "").mkString("\n"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("pdb").load(bad.toString).collect()
    }
    assert(e.getMessage.contains("pdb parse error") ||
      Option(e.getCause).exists(_.getMessage.contains("pdb parse error")))
  }

  test("mode=DROPMALFORMED drops bad ATOM records, keeps the rest") {
    val mixed = Files.createTempFile("perm", ".pdb")
    Files.writeString(mixed, Seq(
      "MODEL        0",
      atom(1, "N", "MET", "A", 1, 1.0, 2.0, 3.0, "N"),
      "ATOM      2  H   MET A   1        oops  74.356  20.700",
      atom(3, "CA", "MET", "A", 1, 4.0, 5.0, 6.0, "C"),
      "ENDMDL", "").mkString("\n"))
    val df = spark.read.format("pdb")
      .option("mode", "DROPMALFORMED").load(mixed.toString)
    assert(df.count() == 2)
    // ordinal arithmetic stays stable across the dropped record
    assert(df.collect().map(_.getAs[Int]("atom_id")).sorted.toSeq ==
      Seq(0, 2))
  }

  test("pdb.gz reads transparently (shared XyzLines gzip machinery)") {
    val gz = Files.createTempFile("traj", ".pdb.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz.toFile))
    out.write(Files.readAllBytes(java.nio.file.Paths.get(fixture)))
    out.close()
    val df = spark.read.format("pdb").load(gz.toString)
    assert(df.count() == 6)
    assert(df.select("frame_id").distinct().count() == 2)
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format("pdb").load(fixture).select("element")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("C", "C", "H", "H", "N", "N"))
  }

  test("the per-format registry resolves all three short names " +
    "(file_returns analog, core/dask_traj.py:26-56)") {
    Seq("xyz", "gro", "pdb").foreach { fmt =>
      val cls = org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource(fmt, spark.sessionState.conf)
      assert(cls.getName.startsWith("graft.sources."),
        s"$fmt -> ${cls.getName}")
    }
  }

  test("pdb write path round-trips through the pdb scan (S6 parity)") {
    val dir = Files.createTempDirectory("pdbout").toString
    val df = spark.range(0, 2).selectExpr("id AS frame_id")
      .crossJoin(spark.range(0, 3).selectExpr("CAST(id AS INT) AS atom_id"))
      .selectExpr(
        "frame_id", "atom_id",
        "CAST(atom_id + 1 AS INT) AS serial",
        "CASE WHEN atom_id = 0 THEN 'N' WHEN atom_id = 1 THEN 'CA' " +
          "ELSE 'C' END AS name",
        "'MET' AS res_name",
        "'B' AS chain",
        "CAST(7 AS INT) AS res_seq",
        "CASE WHEN atom_id = 0 THEN 'N' ELSE 'C' END AS element",
        // nm values picked to be exact at the Å-file's %8.3f resolution
        "CAST(frame_id * 1.5 + atom_id * 0.125 AS FLOAT) AS x",
        "CAST(0.25 AS FLOAT) AS y",
        "CAST(atom_id AS FLOAT) AS z",
        "CAST(6.0 AS FLOAT) AS box_a", "CAST(7.0 AS FLOAT) AS box_b",
        "CAST(8.0 AS FLOAT) AS box_c", "CAST(90.0 AS FLOAT) AS box_alpha",
        "CAST(90.0 AS FLOAT) AS box_beta",
        "CAST(90.0 AS FLOAT) AS box_gamma")
      .repartitionByRange(1, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
    df.write.format("pdb").mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".pdb"))
    assert(files.length == 1)
    val back = spark.read.format("pdb").load(files(0).getPath)
    assert(back.count() == 6)
    assert(back.select("frame_id").distinct().count() == 2)
    val r = back.filter(col("frame_id") === 1 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[String]("name") == "C")
    assert(r.getAs[String]("res_name") == "MET")
    assert(r.getAs[String]("chain") == "B")
    assert(r.getAs[Int]("res_seq") == 7)
    assert(r.getAs[Int]("serial") == 3)
    // 1.75 nm → 17.500 Å in the file → 1.75 nm back (default 0.1 scale)
    assert(math.abs(r.getAs[Float]("x") - 1.75f) < 1e-5)
    assert(math.abs(r.getAs[Float]("z") - 2.0f) < 1e-5)
    // CRYST1 round-trip: 6 nm → 60 Å → 6 nm
    assert(math.abs(r.getAs[Float]("box_a") - 6.0f) < 1e-5)
    assert(r.getAs[Float]("box_gamma") == 90.0f)
  }
}
