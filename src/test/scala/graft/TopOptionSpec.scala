package graft

import java.nio.file.Files
import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.PdbTopology
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `top=` topology option — the Spark-idiomatic form of the
  * reference's `load(filename, top=...)` argument
  * (core/dask_traj.py:61,80-83): a PDB topology supplies the atom
  * count for formats that don't carry one (mdcrd), and cross-checks
  * it for formats that do (inpcrd, binpos). */
class TopOptionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Minimal PDB with `n` atoms in one model. */
  private def pdbTop(n: Int, models: Int = 1): String = {
    val sb = new StringBuilder
    (0 until models).foreach { m =>
      if (models > 1) sb.append(f"MODEL     ${m + 1}%4d\n")
      (1 to n).foreach { i =>
        sb.append(
          f"ATOM  $i%5d  C   ALA A$i%4d      1.000   2.000   3.000" +
            "  1.00  0.00           C\n")
      }
      if (models > 1) sb.append("ENDMDL\n")
    }
    sb.append("END\n")
    val f = Files.createTempFile("top", ".pdb")
    Files.writeString(f, sb.toString)
    f.toString
  }

  /** 4-atom × 2-frame mdcrd with box line (the mdcrd suite's shape). */
  private lazy val mdcrdFixture: String = {
    def line(vs: Seq[Double]): String = vs.map(v => f"$v%8.3f").mkString
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

  test("PdbTopology.atomCount counts the FIRST model only and " +
    "rejects atom-less files") {
    assert(PdbTopology.atomCount(pdbTop(4)) == 4)
    assert(PdbTopology.atomCount(pdbTop(3, models = 5)) == 3)
    val e = intercept[IllegalArgumentException] {
      val f = Files.createTempFile("empty", ".pdb")
      Files.writeString(f, "REMARK nothing here\nEND\n")
      PdbTopology.atomCount(f.toString)
    }
    assert(e.getMessage.contains("no ATOM"))
  }

  test("mdcrd: top= alone derives natoms (reference load(top=...) " +
    "idiom); values match the explicit-natoms read") {
    val viaTop = spark.read.format("mdcrd")
      .option("top", pdbTop(4)).option("box", "true").load(mdcrdFixture)
    assert(viaTop.count() == 8)
    val viaN = spark.read.format("mdcrd")
      .option("natoms", 4).option("box", "true").load(mdcrdFixture)
    assert(viaTop.collect().map(_.toSeq).toSet ==
      viaN.collect().map(_.toSeq).toSet)
  }

  test("mdcrd: natoms and top disagreement fails at plan time with " +
    "both numbers") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("mdcrd").option("natoms", 5)
        .option("top", pdbTop(4)).option("box", "true")
        .load(mdcrdFixture).count()
    }
    assert(e.getMessage.contains("disagree"))
    assert(e.getMessage.contains("5") && e.getMessage.contains("4"))
    // agreeing values are fine
    assert(spark.read.format("mdcrd").option("natoms", 4)
      .option("top", pdbTop(4)).option("box", "true")
      .load(mdcrdFixture).count() == 8)
  }

  test("inpcrd: top= cross-checks the file's own natoms") {
    def f12(v: Double): String =
      String.format(java.util.Locale.ROOT, "%12.7f", v)
    val txt = (Seq("amber restart", "     3  1.0") ++
      (1 to 9).map(_.toDouble).grouped(6).map(_.map(f12).mkString))
      .mkString("", "\n", "\n")
    val f = Files.createTempFile("r", ".rst7")
    Files.writeString(f, txt)
    // matching topology: reads fine
    assert(spark.read.format("inpcrd").option("top", pdbTop(3))
      .load(f.toString).count() == 3)
    // disagreeing topology: fails with context
    val e = intercept[Exception] {
      spark.read.format("inpcrd").option("top", pdbTop(4))
        .load(f.toString).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(m => m.contains("disagrees") && m.contains("top"))))
  }

  test("inpcrd streaming twin applies the same top= cross-check") {
    def f12(v: Double): String =
      String.format(java.util.Locale.ROOT, "%12.7f", v)
    val restart = (Seq("amber restart", "     3  1.0") ++
      (1 to 9).map(_.toDouble).grouped(6).map(_.map(f12).mkString))
      .mkString("", "\n", "\n")
    val dir = Files.createTempDirectory("rst-stream")
    Files.writeString(dir.resolve("a000.rst7"), restart)
    // matching topology streams fine
    val ok = spark.readStream.format("inpcrd").option("top", pdbTop(3))
      .load(dir.toString)
      .writeStream.format("memory").queryName("top_stream_ok")
      .outputMode("append").start()
    try {
      ok.processAllAvailable()
      assert(spark.table("top_stream_ok").count() == 3)
    } finally ok.stop()
    // disagreeing topology fails the stream with context
    val bad = spark.readStream.format("inpcrd").option("top", pdbTop(4))
      .load(dir.toString)
      .writeStream.format("memory").queryName("top_stream_bad")
      .outputMode("append").start()
    try {
      val e = intercept[Exception] { bad.processAllAvailable() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("disagrees"))), s"got: $e")
    } finally bad.stop()
  }

  test("comOfLoaded: center of mass on an mdcrd + top= load matches " +
    "the hand-computed weighted mean (reference load(top=) COM " +
    "semantics — top delivers MASSES, not just an atom count)") {
    // topology: C, O, N, H — IUPAC masses 12.011/15.999/14.007/1.008
    val elems = Seq("C", "O", "N", "H")
    val sb = new StringBuilder
    elems.zipWithIndex.foreach { case (e, i) =>
      sb.append(f"ATOM  ${i + 1}%5d  $e%s   ALA A${i + 1}%4d      " +
        f"1.000   2.000   3.000  1.00  0.00           $e%s\n")
    }
    sb.append("END\n")
    val top = Files.createTempFile("top4", ".pdb")
    Files.writeString(top, sb.toString)
    val traj = spark.read.format("mdcrd")
      .option("top", top.toString).option("box", "true")
      .option("unit_scale", "1.0").load(mdcrdFixture)
    val topo = graft.traj.TrajLoad.topology(spark, top.toString)
    // masses resolve from the element column (IUPAC), per atom
    assert(topo.orderBy("atom_id").select("mass").collect()
      .map(_.getDouble(0)).toSeq == Seq(12.011, 15.999, 14.007, 1.008))
    val got = graft.traj.TrajQueries.comOfLoaded(traj, topo)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // hand-computed: frame 0 atoms (1,2,3)C (4,5,6)O (7,8,9)N
    // (10,11,12)H; Σm = 43.025, Σx·m = 184.136 → 184.136/43.025 =
    // 4.279744; y/z shift the numerator by Σm → +1 each; frame 1 = +12
    assert(got == Seq(
      (0L, 4L, 4.279744, 5.279744, 6.279744, 43.025),
      (1L, 4L, 16.279744, 17.279744, 18.279744, 43.025)))
    // groupKeys: residue-level COM on loaded data (one atom per
    // residue here, so each group's COM is that atom's position)
    val byRes = graft.traj.TrajQueries.comOfLoaded(
      traj, topo, Seq("res_seq"))
    assert(byRes.count() == 8)
    assert(byRes.filter(col("frame_id") === 0 && col("res_seq") === 2)
      .select("com_x").head.getDouble(0) == 4.0)
    // topologies that aren't PDBs are rejected with guidance
    val e = intercept[IllegalArgumentException] {
      graft.traj.TrajLoad.topology(spark, "/tmp/nope.prmtop")
    }
    assert(e.getMessage.contains("PDB"))
  }

  test("binpos: top= cross-checks the header natoms at plan time") {
    val f = Files.createTempFile("t", ".binpos")
    val atoms = 2; val frames = 3
    val bb = ByteBuffer.allocate(4 + frames * (4 + 12 * atoms))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("fxyz".getBytes("US-ASCII"))
    var v = 1.0f
    (0 until frames).foreach { _ =>
      bb.putInt(atoms)
      (0 until 3 * atoms).foreach { _ => bb.putFloat(v); v += 1.0f }
    }
    Files.write(f, bb.array())
    assert(spark.read.format("binpos").option("top", pdbTop(2))
      .load(f.toString).count() == 6)
    val e = intercept[Exception] {
      spark.read.format("binpos").option("top", pdbTop(3))
        .load(f.toString).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("disagrees"))))
  }

  test("comOfLoaded on the synthetic tables reproduces the registered " +
    "trajCom query (same DECIMAL-exact weighted mean)") {
    val s = spark
    val d = SparkTestBase.sf
    val generic = graft.traj.TrajQueries.comOfLoaded(
      graft.traj.TrajModel.positionsShared(s, d),
      graft.traj.TrajModel.topologyShared(s, d))
      .select("frame_id", "com_x", "com_y", "com_z", "total_mass")
      .collect().map(_.toString).toSeq
    val registered = graft.traj.TrajQueries.trajCom(s, d)
      .select("frame_id", "com_x", "com_y", "com_z", "total_mass")
      .collect().map(_.toString).toSeq
    assert(generic == registered && generic.nonEmpty)
  }

  test("binpos: top= validates EVERY named file, including a trailing " +
    "shard a pushed limit prunes from the plan") {
    def binpos(dir: java.nio.file.Path, name: String, atoms: Int,
        frames: Int): Unit = {
      val bb = ByteBuffer.allocate(4 + frames * (4 + 12 * atoms))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put("fxyz".getBytes("US-ASCII"))
      var v = 1.0f
      (0 until frames).foreach { _ =>
        bb.putInt(atoms)
        (0 until 3 * atoms).foreach { _ => bb.putFloat(v); v += 1.0f }
      }
      Files.write(dir.resolve(name), bb.array())
    }
    val dir = Files.createTempDirectory("binpos-shards")
    binpos(dir, "a00.binpos", 2, 3) // matches top=2
    binpos(dir, "a01.binpos", 3, 2) // corrupt trailing shard
    // limit(2) is satisfied entirely by the first file, but the
    // disagreeing trailing shard still fails the plan — corrupt data
    // must not hide behind a small limit
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    val e = intercept[Exception] {
      spark.read.format("binpos").option("top", pdbTop(2))
        .load(dir.toString).limit(2).collect()
    }
    assert(chain(e).exists(c => Option(c.getMessage).exists(m =>
      m.contains("disagrees") && m.contains("a01.binpos"))))
    // without top= the limit prunes the trailing file unprobed (no
    // cross-check requested, nothing to validate against)
    assert(spark.read.format("binpos").load(dir.toString)
      .limit(2).collect().length == 2)
  }
}
