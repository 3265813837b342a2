package graft

import java.nio.file.{Files, Paths}

import graft.sources.{Hdf5Format, Hdf5Write}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HDF5 DSv2 suite: the clean-room reader against files produced by
  * the repo's own spec-derived writer (the STRUCTURAL oracle lives in
  * [[Hdf5FormatSpec]] — hand-laid byte layouts independent of the
  * writer), covering the mdtraj `.h5` profile (chunked+gzip
  * coordinates, contiguous time/cells), the shuffle filter, the
  * legacy `.lh5` int16×1000 profile, chunk-partition planning,
  * pushdown/pruning/limit, multi-file loads, TrajLoad dispatch and
  * streaming. Reference registry rows `.h5/.hdf5/.lh5`
  * (core/dask_traj.py:32-33,39). */
class Hdf5DataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** frame/atom-coded: x = fr*10 + atom + 0.25*axis (nm). */
  private def mkFrames(n: Int, atoms: Int = 3,
      withCell: Boolean = true): Seq[Hdf5Write.Frame] =
    (0 until n).map { fr =>
      val xyz = Array.tabulate(3 * atoms) { i =>
        (fr * 10 + i / 3).toFloat + 0.25f * (i % 3)
      }
      Hdf5Write.Frame(xyz,
        cellLengths = if (withCell) Some(Array(2.0f, 3.0f, 4.0f))
                      else None,
        cellAngles = if (withCell) Some(Array(90.0f, 90.0f, 60.0f))
                     else None,
        time = fr * 0.5f)
    }

  private lazy val fixture: String = {
    val f = Files.createTempFile("traj", ".h5")
    Hdf5Write.write(f.toString, mkFrames(5), chunkFrames = 2)
    f.toString
  }

  test("mdtraj profile round-trip: one row per (frame, atom), exact " +
    "float32 values through gzip'd chunks, per-frame time and cells") {
    val df = spark.read.format("hdf5").load(fixture)
    assert(df.count() == 15)
    val r = df.filter(col("frame_id") === 3 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[Float]("x") == 31.0f)
    assert(r.getAs[Float]("y") == 31.25f)
    assert(r.getAs[Float]("z") == 31.5f)
    assert(r.getAs[Double]("time") == 1.5f.toDouble)
    assert(r.getAs[Float]("box_a") == 2.0f)
    assert(r.getAs[Float]("box_gamma") == 60.0f)
  }

  test("the shuffle filter variant round-trips bit-exact") {
    val f = Files.createTempFile("shuf", ".h5")
    Hdf5Write.write(f.toString, mkFrames(4), chunkFrames = 3,
      shuffle = true)
    val df = spark.read.format("hdf5").load(f.toString)
    val r = df.filter(col("frame_id") === 3 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[Float]("x") == 32.0f)
    assert(r.getAs[Float]("z") == 32.5f)
  }

  test("no-cell files read null box columns") {
    val f = Files.createTempFile("nocell", ".h5")
    Hdf5Write.write(f.toString, mkFrames(2, withCell = false))
    val r = spark.read.format("hdf5").load(f.toString).collect()(0)
    assert(r.isNullAt(r.fieldIndex("box_a")))
    assert(r.getAs[Double]("time") == 0.0)
  }

  test("lh5 profile: XYZList int16 = nm×1000 undone on read; no " +
    "time dataset → frame-ordinal time; quantization is the format's " +
    "own 0.001 nm contract") {
    val f = Files.createTempFile("legacy", ".lh5")
    Hdf5Write.writeLh5(f.toString, mkFrames(3, withCell = false),
      chunkFrames = 2)
    val df = spark.read.format("hdf5").load(f.toString)
    assert(df.count() == 9)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 1)
      .collect()(0)
    // 21.25 nm → 21250 (exact in int16) → 21.25
    assert(math.abs(r.getAs[Float]("x") - 21.0f) < 5e-4f)
    assert(math.abs(r.getAs[Float]("y") - 21.25f) < 5e-4f)
    assert(r.getAs[Double]("time") == 2.0) // ordinal synth
    assert(r.isNullAt(r.fieldIndex("box_a")))
  }

  test("unit_scale converts coordinates AND cell lengths (nm → Å) " +
    "but never the angles") {
    val df = spark.read.format("hdf5").option("unit_scale", 10.0)
      .load(fixture)
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 100.0f)
    assert(r.getAs[Float]("box_a") == 20.0f)
    assert(r.getAs[Float]("box_gamma") == 60.0f)
  }

  test("chunks option partitions the frame range; frame_id pushdown " +
    "prunes partitions; limit caps planning") {
    val df = spark.read.format("hdf5").option("chunks", 2).load(fixture)
    assert(df.rdd.getNumPartitions == 3) // 5 frames / 2
    assert(df.filter(col("frame_id") >= 4).rdd.getNumPartitions == 1)
    assert(df.filter(col("frame_id") === 2).collect().length == 3)
    assert(df.limit(4).rdd.getNumPartitions == 1)
  }

  test("column pruning: an x/y/z-free projection never touches the " +
    "coordinate chunks (corrupting them is harmless)") {
    val f = Files.createTempFile("prune", ".h5")
    Hdf5Write.write(f.toString, mkFrames(3), chunkFrames = 1)
    // corrupt every deflate chunk payload: find them via the parser
    val raf = graft.sources.FsIO.openRandom(f.toString)
    val (ds, chunkRefs) = try {
      val parsed = Hdf5Format.parse(raf, f.toString)
      val c = parsed.datasets("coordinates")
      (c, Hdf5Format.chunkIndex(raf, f.toString, c))
    } finally raf.close()
    assert(chunkRefs.nonEmpty && ds.filters.nonEmpty)
    val bytes = Files.readAllBytes(Paths.get(f.toString))
    chunkRefs.foreach { c =>
      (0 until c.storedBytes).foreach { i =>
        bytes(c.addr.toInt + i) = 0x5A.toByte
      }
    }
    Files.write(Paths.get(f.toString), bytes)
    val pruned = spark.read.format("hdf5").load(f.toString)
      .select("frame_id", "time", "atom_id")
    assert(pruned.count() == 9)
    assert(pruned.filter(col("frame_id") === 1).collect()
      .map(_.getAs[Int]("atom_id")).sorted.toSeq == Seq(0, 1, 2))
    // and the full projection DOES fail on the corrupt chunks
    intercept[Exception] {
      spark.read.format("hdf5").load(f.toString).select("x").collect()
    }
  }

  test("a 512-byte user block relocates every chunked structure: " +
    "stored addresses resolve base-relative end to end") {
    val f = Files.createTempFile("ublock", ".h5")
    Hdf5Write.write(f.toString, mkFrames(4), chunkFrames = 2)
    val orig = Files.readAllBytes(Paths.get(f.toString))
    val shifted = new Array[Byte](512 + orig.length)
    System.arraycopy(orig, 0, shifted, 512, orig.length)
    val g = Files.createTempFile("ublock2", ".h5")
    Files.write(g, shifted)
    val r = spark.read.format("hdf5").load(g.toString)
      .filter(col("frame_id") === 3 && col("atom_id") === 2)
      .collect()(0)
    assert(r.getAs[Float]("x") == 32.0f)
    assert(r.getAs[Float]("box_a") == 2.0f)
  }

  test("multi-file load concatenates with globally contiguous " +
    "frame ids, in argument order") {
    val a = Files.createTempFile("parta", ".h5")
    val b = Files.createTempFile("partb", ".h5")
    Hdf5Write.write(a.toString, mkFrames(2))
    Hdf5Write.write(b.toString, mkFrames(3))
    val df = spark.read.format("hdf5").load(a.toString, b.toString)
    assert(df.count() == 15)
    assert(df.agg(max("frame_id")).collect()(0).getLong(0) == 4L)
  }

  test("TrajLoad dispatches .h5/.hdf5/.lh5 to this source") {
    val df = graft.traj.TrajLoad.load(spark, fixture,
      chunkSize = Some(3))
    assert(df.count() == 15)
  }

  test("top= atom-count cross-check rejects a mismatched topology") {
    val pdb = Files.createTempFile("top", ".pdb")
    val lines = (1 to 7).map { i =>
      f"ATOM  $i%5d  CA  ALA A$i%4d      1.000   2.000   3.000" +
        "  1.00  0.00           C"
    } :+ "END"
    Files.write(pdb, String.join("\n", lines: _*).getBytes)
    val e = intercept[Exception] {
      spark.read.format("hdf5").option("top", pdb.toString)
        .load(fixture).count()
    }
    assert(e.getMessage.contains("atom"))
  }

  test("a single-frame file and a chunk size larger than the file " +
    "plan exactly one partition") {
    val f = Files.createTempFile("one", ".h5")
    Hdf5Write.write(f.toString, mkFrames(1))
    val df = spark.read.format("hdf5").option("chunks", 100)
      .load(f.toString)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 3)
  }

  test("embedded topology round-trips: the mdtraj-convention JSON " +
    "dataset reads back as the PDB-shaped atom dimension with IUPAC " +
    "masses; files without one fail with guidance") {
    val f = Files.createTempFile("seltop", ".h5")
    val json = """{"chains": [{"index": 0, "residues": [
      |{"index": 0, "name": "ALA", "resSeq": 1, "atoms": [
      |{"index": 0, "name": "N", "element": "N"},
      |{"index": 1, "name": "CA", "element": "C"},
      |{"index": 2, "name": "O", "element": "O"}]}]},
      |{"index": 1, "residues": [
      |{"index": 1, "name": "HOH", "resSeq": 2, "atoms": [
      |{"index": 3, "name": "H1", "element": "H"}]}]}],
      |"bonds": [[0, 1]]}""".stripMargin
    Hdf5Write.write(f.toString, mkFrames(2, atoms = 4),
      topologyJson = Some(json))
    val topo = graft.traj.TrajLoad.topology(spark, f.toString)
      .orderBy("atom_id").collect()
    assert(topo.length == 4)
    assert(topo(1).getAs[String]("name") == "CA")
    assert(topo(1).getAs[String]("res_name") == "ALA")
    assert(topo(1).getAs[String]("chain") == "A")
    assert(topo(1).getAs[Double]("mass") == 12.011)
    assert(topo(3).getAs[String]("chain") == "B")
    assert(topo(3).getAs[Int]("res_seq") == 2)
    assert(topo(3).getAs[Double]("mass") == 1.008)
    // a file without the dataset explains itself
    val bare = Files.createTempFile("notop", ".h5")
    Hdf5Write.write(bare.toString, mkFrames(1))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Hdf5Topology.topologyJson(bare.toString)
    }
    assert(e.getMessage.contains("topology"))
    // and COM over the self-described pair is mass-weighted, exact
    val traj = spark.read.format("hdf5").load(f.toString)
    val com = graft.traj.TrajQueries.comOfLoaded(traj,
      graft.traj.TrajLoad.topology(spark, f.toString)).collect()
    assert(com.length == 2)
    assert(com(0).getAs[Double]("total_mass") ==
      14.007 + 12.011 + 15.999 + 1.008)
  }

  test("streaming micro-batch read over a shard directory") {
    val dir = Files.createTempDirectory("h5stream")
    Hdf5Write.write(dir.resolve("s0.h5").toString, mkFrames(2))
    Hdf5Write.write(dir.resolve("s1.h5").toString, mkFrames(3))
    val q = spark.readStream.format("hdf5").load(dir.toString)
      .groupBy("frame_id").count()
      .writeStream.format("memory").queryName("h5sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM h5sink").collect()
      assert(rows.length == 5) // global frames 0..4
      assert(rows.forall(_.getAs[Long]("count") == 3L))
    } finally q.stop()
  }
}
