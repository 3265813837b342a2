package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the TRR/XTC frame-index sidecar (VERDICT r19 next #3):
  *  - a second plan of the same immutable file does ZERO header walks
  *    (hard-counted via FsIO.randomOpens — the index walk is the only
  *    positioned-open planning does),
  *  - the sidecar-served scan output is byte-identical to the
  *    walk-served scan output,
  *  - the invalidation rule is the (length, mtime) stat pair: a
  *    changed file is re-walked and re-indexed,
  *  - bounded walks (pushed limits) never write sidecars; a complete
  *    sidecar serves bounded requests by slicing. */
class FrameIndexCacheSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def withIndexDir[T](body: String => T): T = {
    val dir = Files.createTempDirectory("graft-idx").toString
    val key = "spark.graft.index.dir"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, dir)
    try body(dir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def freshXtc(): String = {
    val dir = Files.createTempDirectory("graft-idx-xtc")
    val p = dir.resolve("t.xtc")
    Files.copy(Paths.get("fixtures/traj_xtc/traj.xtc"), p,
      StandardCopyOption.REPLACE_EXISTING)
    p.toString
  }

  test("xtc: second plan serves the sidecar — zero header walks, " +
    "byte-identical scan output") {
    withIndexDir { dir =>
      val path = freshXtc()
      FrameIndexCache.clearMemo()
      val first = spark.read.format("xtc").load(path)
        .orderBy("frame_id", "atom_id").collect()
      assert(first.nonEmpty)
      // the complete walk wrote exactly one sidecar
      val sidecars = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".xtc.idx"))
      assert(sidecars.length == 1,
        s"expected one sidecar, found ${sidecars.length}")
      // simulate a new JVM: drop the memo, leave the sidecar
      FrameIndexCache.clearMemo()
      val opens0 = FsIO.randomOpens
      val idx = XtcFormat.indexCached(path, ParseMode.FailFast,
        Long.MaxValue)
      assert(idx.nonEmpty)
      assert(FsIO.randomOpens == opens0,
        "sidecar-served planning must not open the trajectory file")
      // end-to-end: the sidecar-planned scan is byte-identical
      val second = spark.read.format("xtc").load(path)
        .orderBy("frame_id", "atom_id").collect()
      assert(second.sameElements(first),
        "sidecar-served scan diverged from the walk-served scan")
    }
  }

  test("xtc: (length, mtime) invalidation — a changed file is " +
    "re-walked, not served stale") {
    withIndexDir { _ =>
      val path = freshXtc()
      FrameIndexCache.clearMemo()
      val idx1 = XtcFormat.indexCached(path, ParseMode.FailFast,
        Long.MaxValue)
      // rewrite the file with one MORE frame: length and content move
      val bytes = Files.readAllBytes(Paths.get(path))
      Files.write(Paths.get(path), bytes ++ bytes.take(92))
      FrameIndexCache.clearMemo()
      val opens0 = FsIO.randomOpens
      // DROPMALFORMED: the appended prefix is a torn frame — the walk
      // must RUN (stat mismatch kills both memo and sidecar) and
      // truncate there instead of serving the stale index
      val idx2 = XtcFormat.indexCached(path, ParseMode.DropMalformed,
        Long.MaxValue)
      assert(FsIO.randomOpens > opens0,
        "changed file must force a re-walk")
      assert(idx2.length == idx1.length,
        "torn appended frame should truncate at the old frame count")
    }
  }

  test("trr: bounded walks never write sidecars; a complete sidecar " +
    "serves bounded requests by slicing") {
    withIndexDir { dir =>
      val p = Files.createTempDirectory("graft-idx-trr")
        .resolve("t.trr").toString
      val frames = (0 until 4).map { fr =>
        TrrWrite.Frame(Array.tabulate(9)(i => (fr * 10 + i).toFloat),
          box = None, v = None, f = None,
          step = fr.toLong, time = fr * 0.5, lambda = 0.0)
      }
      TrrWrite.write(p, frames)
      FrameIndexCache.clearMemo()
      // bounded walk first: no sidecar may appear
      val bounded = TrrFormat.indexCached(
        p, ParseMode.FailFast, maxFrames = 2)
      assert(bounded.length == 2)
      assert(!new java.io.File(dir).listFiles()
        .exists(_.getName.endsWith(".trr.idx")),
        "a bounded (incomplete) walk must not be persisted")
      // complete walk: sidecar appears
      val full = TrrFormat.indexCached(
        p, ParseMode.FailFast, Long.MaxValue)
      assert(full.length == 4)
      assert(new java.io.File(dir).listFiles()
        .exists(_.getName.endsWith(".trr.idx")))
      // new JVM: the bounded request is served by SLICING the sidecar
      FrameIndexCache.clearMemo()
      val opens0 = FsIO.randomOpens
      val sliced = TrrFormat.indexCached(
        p, ParseMode.FailFast, maxFrames = 3)
      assert(FsIO.randomOpens == opens0,
        "bounded request over a complete sidecar must not re-walk")
      assert(sliced == full.take(3))
    }
  }

  test("without spark.graft.index.dir the in-session memo still " +
    "plans the second load walk-free") {
    val path = freshXtc()
    FrameIndexCache.clearMemo()
    val idx1 = XtcFormat.indexCached(path, ParseMode.FailFast,
      Long.MaxValue)
    val opens0 = FsIO.randomOpens
    val idx2 = XtcFormat.indexCached(path, ParseMode.FailFast,
      Long.MaxValue)
    assert(FsIO.randomOpens == opens0,
      "memo-served planning must not reopen the file")
    assert(idx2 == idx1)
  }
}
