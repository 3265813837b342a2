package graft

import java.nio.file.Files

import graft.sources.TrrWrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Variable-record binary DSv2 suite: the TRR reader against files
  * produced by the repo's own writer ([[graft.sources.TrrWrite]]).
  * Where the DCD suite proves fixed-record seek arithmetic, this one
  * proves the driver-side frame INDEX: frames here differ in size
  * (velocities/forces present on some frames only), so every partition
  * offset comes from the index walk, not from multiplication
  * (reference registry entry core/dask_traj.py:31; chunk planning
  * core/dask_traj.py:86-120). */
class TrrDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ortho(a: Float, b: Float, c: Float): Array[Float] =
    Array(a, 0f, 0f, 0f, b, 0f, 0f, 0f, c)

  /** 4 frames × 3 atoms with deliberately MIXED payloads: frame 0 has
    * x only, frame 1 adds velocities, frame 2 adds forces, frame 3 has
    * both — four distinct frame byte sizes in one file. Coordinates are
    * frame-and-atom coded (x = frame*10 + atom). */
  private def mkFrames(n: Int): Seq[TrrWrite.Frame] =
    (0 until n).map { fr =>
      val xyz = Array.tabulate(9) { i =>
        val atom = i / 3
        (fr * 10 + atom).toFloat + 0.25f * (i % 3)
      }
      TrrWrite.Frame(xyz,
        box = Some(ortho(2f, 3f, 4f)),
        v = if (fr % 2 == 1) Some(xyz.map(_ + 100f)) else None,
        f = if (fr >= 2) Some(xyz.map(_ + 200f)) else None,
        step = fr * 5L, time = fr * 0.002, lambda = 0.5)
    }

  private lazy val fixture: String = {
    val f = Files.createTempFile("traj", ".trr")
    TrrWrite.write(f.toString, mkFrames(4))
    f.toString
  }

  test("scan yields one row per (frame, atom); header time/step/lambda " +
    "ride every row; units are native nm (unit_scale 1.0)") {
    val df = spark.read.format("trr").load(fixture)
    assert(df.count() == 12)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[Float]("x") == 21.0f)
    assert(r.getAs[Float]("y") == 21.25f)
    assert(r.getAs[Float]("z") == 21.5f)
    // single-precision file: t is stored as float32
    assert(r.getAs[Double]("time") == (2 * 0.002).toFloat.toDouble)
    assert(r.getAs[Long]("step") == 10L)
    assert(r.getAs[Float]("lambda") == 0.5f)
    assert(r.getAs[Float]("bv1x") == 2.0f)
    assert(r.getAs[Float]("bv2y") == 3.0f)
    assert(r.getAs[Float]("bv3z") == 4.0f)
    assert(r.getAs[Float]("bv1y") == 0.0f)
  }

  test("per-frame optional velocity/force blocks: null where the frame " +
    "has none, values where it does") {
    val df = spark.read.format("trr").load(fixture)
    val f0 = df.filter(col("frame_id") === 0 && col("atom_id") === 0)
      .collect()(0)
    assert(f0.isNullAt(f0.fieldIndex("vx")))
    assert(f0.isNullAt(f0.fieldIndex("fx")))
    val f1 = df.filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    assert(f1.getAs[Float]("vx") == 110.0f)
    assert(f1.isNullAt(f1.fieldIndex("fx")))
    val f3 = df.filter(col("frame_id") === 3 && col("atom_id") === 2)
      .collect()(0)
    assert(f3.getAs[Float]("vx") == 132.0f)
    assert(f3.getAs[Float]("fz") == 232.5f)
  }

  test("double-precision files read identically (real width inferred " +
    "from declared block sizes)") {
    val fd = Files.createTempFile("traj-dp", ".trr")
    TrrWrite.write(fd.toString, mkFrames(4), doublePrecision = true)
    val sp = spark.read.format("trr").load(fixture)
      .select("frame_id", "atom_id", "x", "y", "z", "vx", "fx")
    val dp = spark.read.format("trr").load(fd.toString)
      .select("frame_id", "atom_id", "x", "y", "z", "vx", "fx")
    assert(sp.exceptAll(dp).count() == 0 && dp.exceptAll(sp).count() == 0)
  }

  test("variable-size frames: chunks=1 partitions carry exact indexed " +
    "byte offsets — a mid-file partition reads its own frame only") {
    val df = spark.read.format("trr").option("chunks", 1).load(fixture)
    assert(df.rdd.getNumPartitions == 4)
    // frame 3 sits after three frames of three DIFFERENT byte sizes;
    // fixed-stride arithmetic would land mid-record and fail the magic
    val r = df.filter(col("frame_id") === 3 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 30.0f)
    assert(r.getAs[Float]("vy") == 130.25f)
  }

  test("frame_id pushdown prunes partitions at plan time and bounds " +
    "the index walk") {
    val df = spark.read.format("trr").option("chunks", 1).load(fixture)
    val pruned = df.filter(col("frame_id") === 2)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 3)
    val range = df.filter(col("frame_id") >= 1 && col("frame_id") < 3)
    assert(range.rdd.getNumPartitions == 2)
    assert(range.count() == 6)
    assert(df.filter(col("frame_id") > 9).count() == 0)
  }

  test("limit pushdown plans only the needed frames") {
    val df = spark.read.format("trr").option("chunks", 1).load(fixture)
      .limit(2)
    assert(df.rdd.getNumPartitions <= 1)
    assert(df.count() == 2)
  }

  test("column pruning skips unreferenced payload blocks (x-only " +
    "projection over frames that carry v and f)") {
    val df = spark.read.format("trr").load(fixture)
      .select("frame_id", "x")
    assert(df.count() == 12)
    assert(df.filter(col("frame_id") === 3).count() == 3)
  }

  test("coordinate-less frames (energy-only checkpoints) yield no rows " +
    "but keep the cursor in sync") {
    val f = Files.createTempFile("traj-e", ".trr")
    val frames = mkFrames(2)
    val energyOnly = TrrWrite.Frame(Array.empty[Float],
      box = Some(ortho(2f, 3f, 4f)), step = 99L, time = 1.0)
    TrrWrite.write(f.toString, Seq(frames.head, energyOnly, frames(1)))
    val df = spark.read.format("trr").load(f.toString)
    assert(df.count() == 6)
    // the energy-only frame keeps its ordinal (frame ids stay aligned
    // with the file) but contributes no rows
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L))
    // frame 2 (the post-gap frame) still decodes correctly
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 10.0f)
  }

  test("directory of shards: name-ordered, globally contiguous frame " +
    "ids across files with different record sizes") {
    val dir = Files.createTempDirectory("trr-shards")
    TrrWrite.write(s"$dir/a.trr", mkFrames(2))
    TrrWrite.write(s"$dir/b.trr", mkFrames(3).map(f =>
      f.copy(xyz = f.xyz.map(_ + 1000f))))
    val df = spark.read.format("trr").load(dir.toString)
    assert(df.count() == 15)
    assert(df.agg(max("frame_id")).collect()(0).getLong(0) == 4L)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 1000.0f) // b.trr frame 0
  }

  test("truncated tail frame: FAILFAST errors with frame context; " +
    "DROPMALFORMED truncates the index with a warning") {
    val f = Files.createTempFile("traj-trunc", ".trr")
    TrrWrite.write(f.toString, mkFrames(3))
    val full = java.nio.file.Files.readAllBytes(f)
    val cut = Files.createTempFile("traj-cut", ".trr")
    java.nio.file.Files.write(cut, full.dropRight(20))
    val e = intercept[Exception] {
      spark.read.format("trr").load(cut.toString).count()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("trr parse error"))
    val dropped = spark.read.format("trr")
      .option("mode", "DROPMALFORMED").load(cut.toString)
    assert(dropped.count() == 6) // first two frames survive
  }

  test("option validation: chunks > 0, numeric unit_scale, known mode; " +
    "a user-supplied schema is rejected (fixed-schema source)") {
    def bad(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(bad(spark.read.format("trr").option("chunks", "0")
      .load(fixture).count()).contains("chunks"))
    assert(bad(spark.read.format("trr").option("unit_scale", "x")
      .load(fixture).count()).contains("unit_scale"))
    assert(bad(spark.read.format("trr").option("mode", "NOPE")
      .load(fixture).count()).contains("mode"))
    // Spark itself refuses .schema(...) for a provider without external
    // metadata support — same behavior as the other graft sources
    intercept[Exception](spark.read.format("trr").schema("a INT")
      .load(fixture).count())
  }

  test("unit_scale converts coordinates and box, not time/v/f") {
    val r = spark.read.format("trr").option("unit_scale", "10.0")
      .load(fixture)
      .filter(col("frame_id") === 1 && col("atom_id") === 0).collect()(0)
    assert(r.getAs[Float]("x") == 100.0f)
    assert(r.getAs[Float]("bv1x") == 20.0f)
    assert(r.getAs[Float]("vx") == 110.0f) // velocities untouched
    assert(r.getAs[Double]("time") == 0.002f.toDouble)
  }

  test("streaming read over a shard directory picks up new trr shards " +
    "with continuing global frame ids") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("trrstream").toString
    TrrWrite.write(s"$dir/part-00000.trr", mkFrames(2))
    val stream = spark.readStream.format("trr").load(dir)
    val q = stream.writeStream.format("memory").queryName("trr_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("trr_stream").count() == 6) // 2 frames x 3
      TrrWrite.write(s"$dir/part-00001.trr", mkFrames(1).map(fr =>
        fr.copy(xyz = fr.xyz.map(_ + 1000f))))
      q.processAllAvailable()
      assert(spark.table("trr_stream").count() == 9)
      // global frame 2 = shard 1 local frame 0 (atom ids 0-based)
      val r = spark.table("trr_stream")
        .filter(col("frame_id") === 2 && col("atom_id") === 0)
        .collect()(0)
      assert(r.getAs[Float]("x") == 1000.0f)
    } finally q.stop()
  }
}
