package graft

import java.nio.ByteOrder
import java.nio.file.Files

import graft.sources.DcdWrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary DSv2 format suite: the DCD reader against files produced by
  * the repo's own writer ([[graft.sources.DcdWrite]]) — the round-trip
  * proves the seek-addressable positioned-read design (SURVEY S3) on
  * fixed-record binary frames, which no text source exercises
  * (reference registry entry: core/dask_traj.py:28). */
class DcdDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 3 atoms × 4 frames, orthorhombic 6×7×8 Å box, little endian,
    * angles stored in degrees. Coordinates are frame-and-atom coded so
    * any mis-seek is visible: x = frame*10 + atom, y = x + 0.25,
    * z = x + 0.5. */
  private def mkFrames(n: Int, cell: Boolean): Seq[DcdWrite.Frame] =
    (0 until n).map { f =>
      val xs = Array.tabulate(3)(a => (f * 10 + a).toFloat)
      DcdWrite.Frame(xs, xs.map(_ + 0.25f), xs.map(_ + 0.5f),
        if (cell) Some((6.0, 7.0, 8.0, 90.0, 90.0, 90.0)) else None)
    }

  private lazy val fixture: String = {
    val f = Files.createTempFile("traj", ".dcd")
    DcdWrite.write(f.toString, mkFrames(4, cell = true),
      istart = 0, nsavc = 2, delta = 0.5f)
    f.toString
  }

  test("scan yields one row per (frame, atom); Å→nm applied; CHARMM " +
    "time = delta * (istart + frame * nsavc)") {
    val df = spark.read.format("dcd").load(fixture)
    assert(df.count() == 12)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 1)
      .collect()(0)
    // x = 21 Å → 2.1 nm (default unit_scale 0.1)
    assert(math.abs(r.getAs[Float]("x") - 2.1f) < 1e-5)
    assert(math.abs(r.getAs[Float]("y") - 2.125f) < 1e-5)
    assert(math.abs(r.getAs[Float]("z") - 2.15f) < 1e-5)
    assert(r.getAs[Double]("time") == 0.5 * (0 + 2 * 2))
    // box lengths scaled, angles not
    assert(math.abs(r.getAs[Float]("box_a") - 0.6f) < 1e-6)
    assert(math.abs(r.getAs[Float]("box_c") - 0.8f) < 1e-6)
    assert(r.getAs[Float]("box_alpha") == 90.0f)
  }

  test("big-endian files read identically (endianness detected from " +
    "the first record marker)") {
    val f = Files.createTempFile("traj-be", ".dcd")
    DcdWrite.write(f.toString, mkFrames(4, cell = true),
      endian = ByteOrder.BIG_ENDIAN)
    val le = spark.read.format("dcd").load(fixture)
      .select("frame_id", "atom_id", "x", "y", "z")
    val be = spark.read.format("dcd").load(f.toString)
      .select("frame_id", "atom_id", "x", "y", "z")
    assert(le.exceptAll(be).isEmpty && be.exceptAll(le).isEmpty)
  }

  test("cos-stored angles decode to degrees (CHARMM >= 22 convention)") {
    val f = Files.createTempFile("traj-cos", ".dcd")
    DcdWrite.write(f.toString,
      (0 until 2).map { fr =>
        val xs = Array.tabulate(3)(a => (fr * 10 + a).toFloat)
        DcdWrite.Frame(xs, xs, xs, Some((6.0, 7.0, 8.0, 60.0, 70.0, 80.0)))
      },
      angleAsCosine = true)
    val r = spark.read.format("dcd").load(f.toString)
      .filter(col("frame_id") === 0 && col("atom_id") === 0).collect()(0)
    assert(math.abs(r.getAs[Float]("box_alpha") - 60.0f) < 1e-4)
    assert(math.abs(r.getAs[Float]("box_beta") - 70.0f) < 1e-4)
    assert(math.abs(r.getAs[Float]("box_gamma") - 80.0f) < 1e-4)
  }

  test("no-cell (X-PLOR-shaped) files yield null box columns") {
    val f = Files.createTempFile("traj-nocell", ".dcd")
    DcdWrite.write(f.toString, mkFrames(3, cell = false))
    val df = spark.read.format("dcd").load(f.toString)
    assert(df.count() == 9)
    assert(df.filter(col("box_a").isNull).count() == 9)
  }

  test("chunked partition planning + frame_id pushdown prunes byte " +
    "ranges at plan time") {
    val df = spark.read.format("dcd").option("chunks", 1).load(fixture)
    assert(df.rdd.getNumPartitions == 4)
    val pruned = df.filter(col("frame_id") === 2)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 3)
    val range = df.filter(col("frame_id") >= 1 && col("frame_id") < 3)
    assert(range.rdd.getNumPartitions == 2)
    assert(range.count() == 6)
    assert(df.filter(col("frame_id") > 9).count() == 0)
  }

  test("limit pushdown plans only the needed frames") {
    val df = spark.read.format("dcd").option("chunks", 1).load(fixture)
      .limit(2)
    assert(df.rdd.getNumPartitions <= 1)
    assert(df.count() == 2)
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format("dcd").load(fixture).select("x")
    assert(df.queryExecution.executedPlan.toString.contains("x"))
    assert(df.count() == 12)
  }

  test("partition readers seek, not scan: values from a mid-file " +
    "partition match the writer exactly") {
    // chunks=1 → frame 3 is read by a partition whose first action is a
    // seek to dataStart + 3*frameBytes; a wrong frameBytes or a missed
    // marker would surface as garbage coordinates here
    val r = spark.read.format("dcd").option("chunks", 1)
      .option("unit_scale", "1.0").load(fixture)
      .filter(col("frame_id") === 3 && col("atom_id") === 2).collect()(0)
    assert(r.getAs[Float]("x") == 32.0f)
    assert(r.getAs[Float]("y") == 32.25f)
    assert(r.getAs[Float]("z") == 32.5f)
  }

  test("round-trip: write -> read -> same relation") {
    val frames = mkFrames(5, cell = true)
    val f = Files.createTempFile("traj-rt", ".dcd")
    DcdWrite.write(f.toString, frames)
    val back = spark.read.format("dcd").option("unit_scale", "1.0")
      .load(f.toString)
      .select("frame_id", "atom_id", "x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getFloat(2), r.getFloat(3),
        r.getFloat(4))).toSet
    val want = frames.zipWithIndex.flatMap { case (fr, fi) =>
      fr.xs.indices.map(a =>
        (fi.toLong, a, fr.xs(a), fr.ys(a), fr.zs(a)))
    }.toSet
    assert(back == want)
  }

  test("truncated tail frame is excluded by the length-derived frame " +
    "count (stale NSET tolerated)") {
    val full = Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val cut = Files.createTempFile("traj-cut", ".dcd")
    // drop the last 10 bytes: frame 3 becomes a torn record
    Files.write(cut, java.util.Arrays.copyOf(full, full.length - 10))
    val df = spark.read.format("dcd").load(cut.toString)
    assert(df.count() == 9) // 3 whole frames
    assert(df.agg(max("frame_id")).collect()(0).getLong(0) == 2L)
  }

  test("corrupt record markers FAILFAST with file/frame context; " +
    "DROPMALFORMED drops the frame and keeps the rest") {
    val full = Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val bad = Files.createTempFile("traj-bad", ".dcd")
    // zero out 4 bytes inside frame 1's record region: header is
    // 84+8 + 84+8 + 4+8 = 196 bytes; frame = 56 + 3*(8+12) = 116 bytes.
    // frame 1 starts at 196+116=312; its cell marker lives there.
    val mut = java.util.Arrays.copyOf(full, full.length)
    mut(312) = 0; mut(313) = 0; mut(314) = 0; mut(315) = 0
    Files.write(bad, mut)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("dcd").option("chunks", 10).load(bad.toString)
        .count()
    }
    assert(e.getMessage.contains("dcd parse error") ||
      Option(e.getCause).exists(_.getMessage.contains("dcd parse error")))
    val dropped = spark.read.format("dcd").option("chunks", 10)
      .option("mode", "DROPMALFORMED").load(bad.toString)
    assert(dropped.count() == 9)
    assert(dropped.select("frame_id").distinct().count() == 3)
  }

  test("option validation: chunks > 0, numeric unit_scale, known mode, " +
    "non-DCD file rejected") {
    intercept[IllegalArgumentException] {
      spark.read.format("dcd").option("chunks", "0").load(fixture).count()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("dcd").option("unit_scale", "abc").load(fixture)
        .count()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("dcd").option("mode", "PERMISSIVE").load(fixture)
        .count()
    }
    val notDcd = Files.createTempFile("not", ".dcd")
    Files.write(notDcd, Array.fill[Byte](200)(7))
    val e = intercept[Exception] {
      spark.read.format("dcd").load(notDcd.toString).count()
    }
    assert(e.getMessage.contains("not a DCD file") ||
      Option(e.getCause).exists(_.getMessage.contains("not a DCD file")))
  }

  test("streaming read over a shard directory picks up new dcd shards " +
    "with continuing global frame ids") {
    val dir = Files.createTempDirectory("dcdstream").toString
    def mkFrames(n: Int, base: Float): Seq[DcdWrite.Frame] =
      (0 until n).map { f =>
        val xs = Array.tabulate(2)(a => base + f * 10 + a)
        DcdWrite.Frame(xs, xs.map(_ + 10f), xs.map(_ + 20f),
          Some((6.0, 7.0, 8.0, 90.0, 90.0, 90.0)))
      }
    DcdWrite.write(s"$dir/part-00000.dcd", mkFrames(2, 0f))
    val stream = spark.readStream.format("dcd")
      .option("unit_scale", "1.0").load(dir)
    val q = stream.writeStream.format("memory").queryName("dcd_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dcd_stream").count() == 4) // 2 frames x 2
      DcdWrite.write(s"$dir/part-00001.dcd", mkFrames(1, 100f))
      q.processAllAvailable()
      assert(spark.table("dcd_stream").count() == 6)
      // global frame 2 = shard 1 local frame 0
      val r = spark.table("dcd_stream")
        .filter(col("frame_id") === 2 && col("atom_id") === 0)
        .collect()(0)
      assert(r.getAs[Float]("x") == 100.0f)
    } finally q.stop()
  }
}
