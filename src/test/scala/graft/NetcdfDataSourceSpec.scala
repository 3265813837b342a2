package graft

import java.nio.file.{Files, Paths}

import graft.sources.NetcdfWrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AMBER NetCDF (classic CDF-2 container) DSv2 suite: the reader
  * against files produced by the repo's own writer, covering the
  * trajectory profile (record-dimension float coordinates + per-frame
  * time/cells), the `.ncrst` restart profile (no record dimension,
  * double coordinates, scalar time), header-driven slab addressing
  * across chunked partitions, pushdown, shards + streaming, and the
  * format-level rejections (HDF5 magic, CDF-5). Reference registry
  * rows `.nc/.ncdf/.netcdf/.ncrst` (core/dask_traj.py:34-37,45). */
class NetcdfDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** frame/atom-coded coordinates: x = fr*10 + atom + 0.25*axis. */
  private def mkFrames(n: Int, atoms: Int = 3,
      withCell: Boolean = true): Seq[NetcdfWrite.Frame] =
    (0 until n).map { fr =>
      val xyz = Array.tabulate(3 * atoms) { i =>
        (fr * 10 + i / 3).toFloat + 0.25f * (i % 3)
      }
      NetcdfWrite.Frame(xyz,
        cellLengths = if (withCell) Some(Array(20.0, 30.0, 40.0))
                      else None,
        cellAngles = if (withCell) Some(Array(90.0, 90.0, 60.0))
                     else None,
        time = fr * 0.5)
    }

  private lazy val fixture: String = {
    val f = Files.createTempFile("traj", ".nc")
    NetcdfWrite.write(f.toString, mkFrames(4))
    f.toString
  }

  test("trajectory profile: one row per (frame, atom); per-frame time " +
    "and unitcell ride every row; values exact") {
    val df = spark.read.format("netcdf").load(fixture)
    assert(df.count() == 12)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[Float]("x") == 21.0f)
    assert(r.getAs[Float]("y") == 21.25f)
    assert(r.getAs[Float]("z") == 21.5f)
    assert(r.getAs[Double]("time") == 1.0f.toDouble) // float32 in file
    assert(r.getAs[Float]("box_a") == 20.0f)
    assert(r.getAs[Float]("box_c") == 40.0f)
    assert(r.getAs[Float]("box_gamma") == 60.0f)
  }

  test("no-cell files read null box columns; time falls back to the " +
    "frame ordinal when the variable is absent") {
    val f = Files.createTempFile("nocell", ".nc")
    NetcdfWrite.write(f.toString, mkFrames(2, withCell = false))
    val r = spark.read.format("netcdf").load(f.toString)
      .filter(col("frame_id") === 1 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Any]("box_a") == null)
    assert(r.getAs[Double]("time") == 0.5f.toDouble)
  }

  test(".ncrst restart profile: one frame, double coordinates, scalar " +
    "time, cells present") {
    val f = Files.createTempFile("min", ".ncrst")
    val xyz = Array(1.125, 2.25, 3.5, -4.75, 5.0, 6.625)
    NetcdfWrite.writeRestart(f.toString, xyz, time = 123.25,
      cellLengths = Some(Array(10.0, 11.0, 12.0)),
      cellAngles = Some(Array(90.0, 90.0, 90.0)))
    val rows = spark.read.format("netcdf").load(f.toString)
      .orderBy("atom_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("frame_id") == 0L)
    assert(rows(0).getAs[Float]("x") == 1.125f)
    assert(rows(1).getAs[Float]("z") == 6.625f)
    assert(rows(0).getAs[Double]("time") == 123.25)
    assert(rows(0).getAs[Float]("box_b") == 11.0f)
  }

  test("chunked reads are row-identical to a whole-file read; pruned " +
    "x/y/z skip the coordinate slab (header-only count)") {
    val whole = spark.read.format("netcdf").option("chunks", 1000)
      .load(fixture).orderBy("frame_id", "atom_id").collect()
    val chunked = spark.read.format("netcdf").option("chunks", 1)
      .load(fixture).orderBy("frame_id", "atom_id").collect()
    assert(whole.length == chunked.length)
    whole.zip(chunked).foreach { case (a, b) => assert(a == b) }
    assert(spark.read.format("netcdf").load(fixture)
      .select("frame_id", "time").count() == 12)
  }

  test("frame_id pushdown prunes; limit bounds shard planning; " +
    "unit_scale converts coordinates and cell lengths, not angles") {
    val mid = spark.read.format("netcdf").load(fixture)
      .filter(col("frame_id") >= 1L && col("frame_id") < 3L)
    assert(mid.count() == 6)
    assert(spark.read.format("netcdf").load(fixture).limit(4)
      .count() == 4)
    val r = spark.read.format("netcdf").option("unit_scale", "0.1")
      .load(fixture)
      .filter(col("frame_id") === 2 && col("atom_id") === 1)
      .collect()(0)
    assert(r.getAs[Float]("x") == 2.1f)
    assert(r.getAs[Float]("box_a") == 2.0f)
    assert(r.getAs[Float]("box_gamma") == 60.0f) // angles untouched
  }

  test("TrajLoad dispatches all four extensions; top= cross-checks " +
    "the atom count on every named file") {
    Seq(".nc", ".ncdf", ".netcdf", ".ncrst").foreach(e =>
      assert(graft.traj.TrajLoad.formatFor(s"/tmp/a$e") == "netcdf"))
    val pdb = Files.createTempFile("top3", ".pdb")
    Files.writeString(pdb, (1 to 3).map(i =>
      f"ATOM  $i%5d  CA  ALA A$i%4d      1.000   2.000   3.000  " +
        "1.00  0.00           C").mkString("", "\n", "\nEND\n"))
    assert(spark.read.format("netcdf").option("top", pdb.toString)
      .load(fixture).count() == 12)
    val bad = Files.createTempFile("top1", ".pdb")
    Files.writeString(bad,
      "ATOM      1  CA  ALA A   1       1.000   2.000   3.000  1.00  " +
        "0.00           C\nEND\n")
    val e = intercept[Exception] {
      spark.read.format("netcdf").option("top", bad.toString)
        .load(fixture).limit(1).collect()
    }
    assert(e.getMessage.contains("topology"), e.getMessage)
  }

  test("directory of shards reads with globally contiguous frame ids; " +
    "a directory of .ncrst checkpoints scans like the inpcrd family") {
    val dir = Files.createTempDirectory("ncshards")
    NetcdfWrite.write(dir.resolve("part-00000.nc").toString, mkFrames(2))
    NetcdfWrite.write(dir.resolve("part-00001.nc").toString,
      mkFrames(3).map(f => f.copy(xyz = f.xyz.map(_ + 1000f))))
    val df = spark.read.format("netcdf").load(dir.toString)
    assert(df.count() == 15)
    assert(df.agg(max("frame_id")).collect()(0).getLong(0) == 4L)
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 1000.0f)

    val rdir = Files.createTempDirectory("ncrsts")
    (0 until 3).foreach { i =>
      NetcdfWrite.writeRestart(
        rdir.resolve(f"ckpt-$i%03d.ncrst").toString,
        Array(i * 1.0, 2.0, 3.0), time = i * 10.0)
    }
    val rs = spark.read.format("netcdf").load(rdir.toString)
      .orderBy("frame_id").collect()
    assert(rs.length == 3)
    assert(rs.map(_.getAs[Long]("frame_id")).toSeq == Seq(0L, 1L, 2L))
    assert(rs(2).getAs[Float]("x") == 2.0f)
    assert(rs(2).getAs[Double]("time") == 20.0)
  }

  test("micro-batch streaming over a shard directory matches the " +
    "batch read") {
    val dir = Files.createTempDirectory("ncstream").toString
    NetcdfWrite.write(s"$dir/part-00000.nc", mkFrames(2))
    val q = spark.readStream.format("netcdf").load(dir)
      .writeStream.format("memory").queryName("nc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("nc_stream").count() == 6)
      NetcdfWrite.write(s"$dir/part-00001.nc",
        mkFrames(1).map(f => f.copy(xyz = f.xyz.map(_ + 1000f))))
      q.processAllAvailable()
      val got = spark.table("nc_stream")
      assert(got.count() == 9)
      val batch = spark.read.format("netcdf").load(dir)
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("a torn tail clamps to the whole records present instead of " +
    "failing mid-slab") {
    val f = Files.createTempFile("torn", ".nc")
    NetcdfWrite.write(f.toString, mkFrames(4))
    val bytes = Files.readAllBytes(f)
    val cut = Files.createTempFile("tornc", ".nc")
    // cut into the last record: 3 complete frames remain
    Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length - 17))
    val df = spark.read.format("netcdf").load(cut.toString)
    assert(df.count() == 9)
    assert(df.select(countDistinct("frame_id")).collect()(0)
      .getLong(0) == 3)
    // the surviving frames decode identically to the intact file
    val whole = spark.read.format("netcdf").load(f.toString)
      .filter(col("frame_id") < 3).orderBy("frame_id", "atom_id")
      .collect()
    val torn = df.orderBy("frame_id", "atom_id").collect()
    whole.zip(torn).foreach { case (a, b) => assert(a == b) }
  }

  test("a 0-atom file plans zero rows — no phantom row, no " +
    "divide-by-zero under a pushed limit") {
    val f = Files.createTempFile("zeroatom", ".nc")
    NetcdfWrite.write(f.toString, (0 until 3).map(i =>
      NetcdfWrite.Frame(Array.empty[Float], time = i * 1.0)))
    val df = spark.read.format("netcdf").load(f.toString)
    assert(df.count() == 0)
    assert(df.limit(5).count() == 0)
  }

  test("HDF5 containers and CDF-5 are rejected with clear messages; " +
    "junk magic errors") {
    val h5 = Files.createTempFile("fake", ".nc")
    Files.write(h5, Array[Byte](0x89.toByte, 'H', 'D', 'F', 13, 10, 26,
      10) ++ new Array[Byte](64))
    val e1 = intercept[Exception] {
      spark.read.format("netcdf").load(h5.toString).count()
    }
    assert(e1.getMessage.contains("HDF5") ||
      e1.getCause.getMessage.contains("HDF5"))
    val cdf5 = Files.createTempFile("fake5", ".nc")
    Files.write(cdf5, "CDF".getBytes ++ Array[Byte](5) ++
      new Array[Byte](64))
    val e2 = intercept[Exception] {
      spark.read.format("netcdf").load(cdf5.toString).count()
    }
    assert(e2.getMessage.contains("CDF-5") ||
      e2.getCause.getMessage.contains("CDF-5"))
    val junk = Files.createTempFile("junk", ".nc")
    Files.write(junk, "not a netcdf file at all".getBytes)
    intercept[Exception] {
      spark.read.format("netcdf").load(junk.toString).count()
    }
  }

  test("scale_factor attribute round-trips: stored values × attribute " +
    "reproduce the original coordinates") {
    val f = Files.createTempFile("scaled", ".nc")
    // writer stores xyz/scale with a scale_factor=4.0 attribute (a
    // power of two, so float division and re-multiplication are exact)
    NetcdfWrite.write(f.toString, mkFrames(2), coordScale = 4.0)
    val plain = Files.createTempFile("plain", ".nc")
    NetcdfWrite.write(plain.toString, mkFrames(2))
    val a = spark.read.format("netcdf").load(f.toString)
      .orderBy("frame_id", "atom_id").collect()
    val b = spark.read.format("netcdf").load(plain.toString)
      .orderBy("frame_id", "atom_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
