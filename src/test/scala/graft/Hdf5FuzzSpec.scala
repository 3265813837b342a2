package graft

import java.nio.file.Files

import graft.sources.{FsIO, Hdf5Format, Hdf5Write}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded-random corruption fuzz for the HDF5 container parser,
  * complementing the golden-byte suite: arbitrary single- and
  * multi-byte flips over a real writer-produced file must NEVER hang,
  * recurse forever, or allocate unboundedly — every trial either
  * still parses (flips in data regions or slack space yield garbage
  * VALUES, which is the data's problem, not the parser's) or fails
  * with the parse-error contract (IllegalArgumentException carrying
  * the path) or a plain I/O truncation error. The cycle guards on the
  * group/chunk B-tree walks and continuation chains, plus the
  * chunk-size allocation bounds, exist precisely for what this spec
  * throws at them. Deterministic seeds: every failure is a
  * reproducible byte position. */
class Hdf5FuzzSpec extends AnyFunSuite {

  private def fixtureBytes: Array[Byte] = {
    val f = Files.createTempFile("fuzzbase", ".h5")
    val frames = (0 until 6).map { fr =>
      Hdf5Write.Frame(
        Array.tabulate(3 * 17)(i => fr * 10f + i * 0.25f),
        cellLengths = Some(Array(2f, 3f, 4f)),
        cellAngles = Some(Array(90f, 90f, 60f)),
        time = fr * 0.5f)
    }
    Hdf5Write.write(f.toString, frames, chunkFrames = 2,
      topologyJson = Some("""{"chains": []}"""))
    val b = Files.readAllBytes(f)
    Files.delete(f)
    b
  }

  private def readEverything(path: String): Unit = {
    val raf = FsIO.openRandom(path)
    try {
      val parsed = Hdf5Format.parse(raf, path)
      parsed.datasets.values.foreach { ds =>
        // opaque datasets (e.g. the topology string) have no slab
        // semantics; numeric ones read end to end
        ds.dtype match {
          case _: Hdf5Format.Opaque => ()
          case _ if ds.rank >= 1 && ds.dims(0) > 0 &&
              ds.dims(0) < 10000 && ds.rowElems < 100000 =>
            new Hdf5Format.SlabReader(raf, path, ds)
              .readSlab(0, ds.dims(0))
          case _ => ()
        }
      }
    } finally raf.close()
  }

  test("500 seeded single/multi-byte corruptions: parse+read always " +
    "terminates — success (data-region flip) or the clean error " +
    "contract, never a hang, overflow crash, or unbounded allocation") {
    val base = fixtureBytes
    var succeeded = 0
    var failedClean = 0
    (0 until 500).foreach { trial =>
      val rnd = new Random(7000 + trial)
      val bytes = base.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        val pos = rnd.nextInt(bytes.length)
        bytes(pos) = (bytes(pos) ^ (1 << rnd.nextInt(8))).toByte
      }
      val f = Files.createTempFile("fuzz", ".h5")
      Files.write(f, bytes)
      try {
        readEverything(f.toString)
        succeeded += 1
      } catch {
        case _: IllegalArgumentException => failedClean += 1 // contract
        case _: java.io.IOException => failedClean += 1 // truncation
        case e: Throwable =>
          fail(s"trial $trial: non-contract failure ${e.getClass}: " +
            s"${e.getMessage}")
      } finally Files.delete(f)
    }
    // both outcomes must actually occur, or the fuzz isn't exercising
    // the parser (all-success would mean flips never hit metadata)
    assert(succeeded > 0 && failedClean > 0,
      s"degenerate fuzz distribution: $succeeded ok / $failedClean err")
  }

  test("truncations at every 97th byte fail cleanly or parse the " +
    "surviving prefix") {
    val base = fixtureBytes
    var p = 8
    while (p < base.length) {
      val f = Files.createTempFile("trunc", ".h5")
      Files.write(f, java.util.Arrays.copyOf(base, p))
      try readEverything(f.toString)
      catch {
        case _: IllegalArgumentException | _: java.io.IOException => ()
        case e: Throwable =>
          fail(s"truncation at $p: non-contract ${e.getClass}: " +
            s"${e.getMessage}")
      } finally Files.delete(f)
      p += 97
    }
  }
}
