package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-path and glob loads — the reference's list-of-files `load`
  * idiom (mdtraj lists, core/dask_traj.py:61) over the DSv2 sources:
  * `load(paths: _*)` and trailing-segment globs resolve to one ordered
  * file list with globally contiguous frame ids, and frame_id pushdown
  * still prunes whole files from the plan. */
class MultiPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2 frames × 3 atoms, values offset by `base` so rows are
    * distinguishable across files. */
  private def writeXyz(dir: java.io.File, name: String,
      base: Double): String = {
    val txt = (0 until 2).map { f =>
      s"3\n# Step: ${base + f} Box: 6.0 6.0 6.0\n" +
        (0 until 3).map(a => s"C ${base + f} $a.0 0.0\n").mkString
    }.mkString
    Files.writeString(dir.toPath.resolve(name), txt).toString
  }

  test("xyz load(paths: _*) list reads as one trajectory in argument " +
    "order with global frame ids") {
    val d1 = Files.createTempDirectory("mp1").toFile
    val d2 = Files.createTempDirectory("mp2").toFile
    val a = writeXyz(d1, "a.xyz", 0.0)
    val b = writeXyz(d2, "b.xyz", 10.0)
    val c = writeXyz(d1, "c.xyz", 20.0)
    // argument order (c before b) decides frame order, not name order
    val df = spark.read.format("xyz").option("chunks", 1).load(a, c, b)
    assert(df.count() == 18)
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 6L))
    // global frame 2 = second argument (c) local frame 0 → x = 20.0
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 20.0f)
    // global frame 4 = third argument (b) local frame 0 → x = 10.0
    val r2 = df.filter(col("frame_id") === 4 && col("atom_id") === 0)
      .collect()(0)
    assert(r2.getAs[Float]("x") == 10.0f)
  }

  test("xyz glob load matches in name order; frame pruning and limit " +
    "still prune files") {
    val dir = Files.createTempDirectory("mpg").toFile
    writeXyz(dir, "part-00000.xyz", 0.0)
    writeXyz(dir, "part-00001.xyz", 10.0)
    writeXyz(dir, "other.txt.xyz.bak", 99.0) // not matched by the glob
    val df = spark.read.format("xyz").option("chunks", 1)
      .load(dir.getPath + "/part-*.xyz")
    assert(df.count() == 12) // 2 matched files × 2 frames × 3 atoms
    assert(df.rdd.getNumPartitions == 4)
    // frame pruning drops the whole first file
    val pruned = df.filter(col("frame_id") >= 2)
    assert(pruned.rdd.getNumPartitions == 2)
    assert(pruned.count() == 6)
    // limit pushdown stops planning files once covered
    assert(df.limit(3).rdd.getNumPartitions == 1)
  }

  test("mixed list: file + glob + directory, contiguous in argument " +
    "order") {
    val d1 = Files.createTempDirectory("mpa").toFile
    val d2 = Files.createTempDirectory("mpb").toFile
    val d3 = Files.createTempDirectory("mpc").toFile
    val lone = writeXyz(d1, "lone.xyz", 0.0)
    writeXyz(d2, "g-00000.xyz", 10.0)
    writeXyz(d2, "g-00001.xyz", 20.0)
    writeXyz(d3, "s-00000.xyz", 30.0)
    val df = spark.read.format("xyz").option("chunks", 1)
      .load(lone, d2.getPath + "/g-*.xyz", d3.getPath)
    assert(df.count() == 24) // 4 files × 2 frames × 3 atoms
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 8L))
    // frames 0-1 lone, 2-3 g-00000, 4-5 g-00001, 6-7 directory shard
    val probes = Seq(0L -> 0.0f, 2L -> 10.0f, 4L -> 20.0f, 6L -> 30.0f)
    probes.foreach { case (fid, x) =>
      val r = df.filter(col("frame_id") === fid && col("atom_id") === 0)
        .collect()(0)
      assert(r.getAs[Float]("x") == x, s"frame $fid")
    }
  }

  test("dcd multi-file list: global frame ids and file pruning") {
    val dir = Files.createTempDirectory("mpdcd").toFile
    def mkFrames(n: Int, base: Float): Seq[graft.sources.DcdWrite.Frame] =
      (0 until n).map { f =>
        val xs = Array.tabulate(2)(a => base + f + a * 0.25f)
        graft.sources.DcdWrite.Frame(xs, xs.map(_ + 10f),
          xs.map(_ + 20f), Some((6.0, 7.0, 8.0, 90.0, 90.0, 90.0)))
      }
    val f1 = new java.io.File(dir, "t1.dcd").getPath
    val f2 = new java.io.File(dir, "t2.dcd").getPath
    graft.sources.DcdWrite.write(f1, mkFrames(2, 0f))
    graft.sources.DcdWrite.write(f2, mkFrames(3, 100f))
    val df = spark.read.format("dcd").option("chunks", 1)
      .option("unit_scale", "1.0").load(f1, f2)
    assert(df.count() == 10)
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 5L))
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 100.0f)
    assert(df.filter(col("frame_id") >= 2).rdd.getNumPartitions == 3)
  }

  test("gro glob load") {
    val dir = Files.createTempDirectory("mpgro").toFile
    def groFrame(t: Double, x: Double): String =
      s"frame t= $t\n2\n" +
        f"    1SOL     OW    1${x}%8.3f${0.5}%8.3f${1.0}%8.3f\n" +
        f"    1SOL    HW1    2${x + 0.1}%8.3f${0.5}%8.3f${1.0}%8.3f\n" +
        "   6.00000   7.00000   8.00000\n"
    Files.writeString(dir.toPath.resolve("a.gro"),
      groFrame(0.0, 1.0) + groFrame(1.0, 2.0))
    Files.writeString(dir.toPath.resolve("b.gro"),
      groFrame(2.0, 3.0))
    val df = spark.read.format("gro").load(dir.getPath + "/*.gro")
    assert(df.count() == 6) // 3 frames × 2 atoms
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 3L))
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(math.abs(r.getAs[Float]("x") - 3.0f) < 1e-4)
  }

  test("trr multi-file list: index-based planner assigns global frame " +
    "ids across files") {
    import graft.sources.TrrWrite
    val dir = Files.createTempDirectory("mptrr").toFile
    def mkFrames(n: Int, base: Float): Seq[TrrWrite.Frame] =
      (0 until n).map { fr =>
        val xyz = Array.tabulate(9)(i => base + fr * 10 + (i / 3)
          .toFloat + 0.25f * (i % 3))
        TrrWrite.Frame(xyz, box = None, v = None, f = None,
          step = fr * 5L, time = fr * 0.002, lambda = 0.0)
      }
    val f1 = new java.io.File(dir, "t1.trr").getPath
    val f2 = new java.io.File(dir, "t2.trr").getPath
    TrrWrite.write(f1, mkFrames(2, 0f))
    TrrWrite.write(f2, mkFrames(3, 1000f))
    val df = spark.read.format("trr").option("chunks", 1).load(f1, f2)
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 5L))
    // atom_id is the 0-based file-order ordinal (the shared topology
    // join key contract across all twelve sources)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 1000.0f)
  }

  test("inpcrd glob: one frame per matched restart file, zero-probe " +
    "planning") {
    val dir = Files.createTempDirectory("mpinp").toFile
    def f12(v: Double): String =
      String.format(java.util.Locale.ROOT, "%12.7f", v)
    def restart(time: Double, shift: Double): String = {
      val coords = (1 to 9).map(_ + shift)
      (Seq("amber restart", s"     3  ${time}") ++
        coords.grouped(6).map(_.map(f12).mkString))
        .mkString("", "\n", "\n")
    }
    Files.writeString(dir.toPath.resolve("a000.rst7"), restart(1.0, 0.0))
    Files.writeString(dir.toPath.resolve("a001.rst7"), restart(2.0, 10.0))
    Files.writeString(dir.toPath.resolve("skip.txt"), "not a restart\n")
    val df = spark.read.format("inpcrd")
      .load(dir.getPath + "/a*.rst7")
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 2L))
    assert(df.count() == 6) // 2 files × 3 atoms
  }

  test("TrajLoad.load(Seq) dispatches one format and rejects mixed " +
    "formats; glob dispatches on its pattern extension") {
    val dir = Files.createTempDirectory("mptl").toFile
    val a = writeXyz(dir, "a.xyz", 0.0)
    val b = writeXyz(dir, "b.xyz", 10.0)
    val df = graft.traj.TrajLoad.load(spark, Seq(a, b))
    assert(df.count() == 12)
    val e = intercept[IllegalArgumentException] {
      graft.traj.TrajLoad.load(spark, Seq(a, "other.dcd"))
    }
    assert(e.getMessage.contains("one load takes one format"))
    assert(graft.traj.TrajLoad.formatFor(dir.getPath + "/*.xyz") == "xyz")
  }

  test("errors: unmatched glob fails at plan time; multi-path write is " +
    "rejected") {
    val dir = Files.createTempDirectory("mperr").toFile
    val a = writeXyz(dir, "a.xyz", 0.0)
    val none = spark.read.format("xyz").load(dir.getPath + "/zzz-*.xyz")
    val e = intercept[Exception] { none.count() }
    assert(e.getMessage.contains("matched no files"))
    val df = spark.read.format("xyz").load(a)
    val e2 = intercept[Exception] {
      df.write.format("xyz").mode("append")
        .save(dir.getPath + "/out-*.xyz")
    }
    assert(e2.getMessage.contains("single literal path"))
  }
}
