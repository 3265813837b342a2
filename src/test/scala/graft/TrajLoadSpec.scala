package graft

import java.nio.file.Files

import graft.sources.{DcdWrite, TrrWrite}
import graft.traj.TrajLoad
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The extension-dispatch front door must route every registered
  * extension to its format, keep reads lazy/pushdown-capable, and fail
  * informatively on extensions the reference registry knows but this
  * library scopes out (core/dask_traj.py:26-56). */
class TrajLoadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("registry resolves every implemented extension, longest match " +
    "first (.xyz.gz is xyz, not gz)") {
    assert(TrajLoad.formatFor("/tmp/a.xyz") == "xyz")
    assert(TrajLoad.formatFor("/tmp/a.xyz.gz") == "xyz")
    assert(TrajLoad.formatFor("/tmp/a.GRO") == "gro")
    assert(TrajLoad.formatFor("/tmp/a.pdb.gz") == "pdb")
    assert(TrajLoad.formatFor("/tmp/a.dcd") == "dcd")
    assert(TrajLoad.formatFor("/tmp/a.trr") == "trr")
  }

  test("load dispatches to a real reader and chunk_size reaches the " +
    "partition planner") {
    val f = Files.createTempFile("disp", ".trr")
    TrrWrite.write(f.toString, (0 until 4).map { fr =>
      TrrWrite.Frame(Array.tabulate(9)(i => (fr * 10 + i).toFloat))
    })
    val df = TrajLoad.load(spark, f.toString, chunkSize = Some(1))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 12)
    val dcd = Files.createTempFile("disp", ".dcd")
    DcdWrite.write(dcd.toString, Seq(DcdWrite.Frame(
      Array(1f, 2f, 3f), Array(1f, 2f, 3f), Array(1f, 2f, 3f), None)))
    assert(TrajLoad.load(spark, dcd.toString).count() == 3)
  }

  test("a directory of shards dispatches on its first file's extension") {
    val dir = Files.createTempDirectory("disp-shards")
    TrrWrite.write(s"$dir/a.trr", Seq(
      TrrWrite.Frame(Array.tabulate(6)(_.toFloat))))
    TrrWrite.write(s"$dir/b.trr", Seq(
      TrrWrite.Frame(Array.tabulate(6)(_.toFloat))))
    assert(TrajLoad.formatFor(dir.toString) == "trr")
    assert(TrajLoad.load(spark, dir.toString).count() == 4)
    assert(TrajLoad.load(spark, dir.toString)
      .agg(max("frame_id")).collect()(0).getLong(0) == 1L)
  }

  test("unknown extensions error with the supported list; reference-" +
    "registry scope-outs explain WHY they are unsupported") {
    val e1 = intercept[IllegalArgumentException](
      TrajLoad.formatFor("/tmp/a.unknownext"))
    assert(e1.getMessage.contains("Supported extensions"))
    // .dtr/.stk are implemented as of round 6 (the frameset source)
    assert(TrajLoad.formatFor("/tmp/a.stk") == "dtr")
    // .xtc is implemented as of round 11 (clean-room codec)
    assert(TrajLoad.formatFor("/tmp/a.xtc") == "xtc")
    // .h5/.hdf5/.lh5 are implemented as of round 12 (clean-room
    // container parser); only .tng remains adjudicated-out
    assert(TrajLoad.formatFor("/tmp/a.h5") == "hdf5")
    assert(TrajLoad.formatFor("/tmp/a.lh5") == "hdf5")
    // .tng is ADJUDICATED fail-fast (r12): the error must carry the
    // full rationale — what blocks it (the TNG-MF1 codec) and why it
    // is not shipped (no independent oracle to validate against) —
    // so a porting user learns the status and the reasoning in one
    // message, the dtr adjudication contract
    val e3 = intercept[IllegalArgumentException](
      TrajLoad.formatFor("/tmp/a.tng"))
    assert(e3.getMessage.contains("TNG-MF1"))
    assert(e3.getMessage.contains("validate against itself"))
    assert(TrajLoad.KnownUnsupported.keySet == Set(".tng"),
      "KnownUnsupported should be down to exactly .tng after the " +
        "round-12 HDF5 family landed")
  }
}
