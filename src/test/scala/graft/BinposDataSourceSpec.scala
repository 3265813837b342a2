package graft

import java.nio.file.Files
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinposDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2 atoms × 3 frames, coords k, k+1, ... in Å. */
  private def writeBinpos(path: java.nio.file.Path, frames: Int,
      atoms: Int): Unit = {
    val bb = ByteBuffer.allocate(4 + frames * (4 + 12 * atoms))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("fxyz".getBytes("US-ASCII"))
    var v = 1.0f
    (0 until frames).foreach { _ =>
      bb.putInt(atoms)
      (0 until 3 * atoms).foreach { _ => bb.putFloat(v); v += 1.0f }
    }
    Files.write(path, bb.array())
  }

  test("seek-addressable scan with Angstrom-to-nm default scale") {
    val f = Files.createTempFile("t", ".binpos")
    writeBinpos(f, 3, 2)
    val df = spark.read.format("binpos").load(f.toString)
    assert(df.count() == 6)
    // frame 1, atom 1: coords are values 10,11,12 → 1.0,1.1,1.2 nm
    val r = df.filter(col("frame_id") === 1 && col("atom_id") === 1)
      .collect()(0)
    assert(math.abs(r.getAs[Float]("x") - 1.0f) < 1e-5)
    assert(math.abs(r.getAs[Float]("z") - 1.2f) < 1e-5)
  }

  test("frame_id pushdown prunes partitions; bad magic errors") {
    val f = Files.createTempFile("t", ".binpos")
    writeBinpos(f, 3, 2)
    val df = spark.read.format("binpos").option("chunks", 1)
      .load(f.toString)
    assert(df.rdd.getNumPartitions == 3)
    val pruned = df.filter(col("frame_id") === 2)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 2)
    val bad = Files.createTempFile("bad", ".binpos")
    Files.write(bad, "nope-not-binpos".getBytes)
    val e = intercept[Exception] {
      spark.read.format("binpos").load(bad.toString).collect()
    }
    assert(e.getMessage.contains("magic"))
  }

  test("write -> read round-trip through a shard directory; " +
    "TrajLoad dispatches .binpos") {
    val f = Files.createTempFile("t", ".binpos")
    writeBinpos(f, 3, 2)
    val src = spark.read.format("binpos").load(f.toString)
    val dir = Files.createTempDirectory("bp_out").toString
    src.repartitionByRange(2, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
      .write.format("binpos").mode("overwrite").save(dir)
    val back = graft.traj.TrajLoad.load(spark, dir)
    val a = src.orderBy("frame_id", "atom_id")
      .collect().map(_.toString).toSeq
    val b = back.orderBy("frame_id", "atom_id")
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
