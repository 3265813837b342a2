package graft

import graft.sources.{XtcFormat, XtcWrite}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded-random fuzz for the XTC codec, complementing the
  * deterministic suite: arbitrary coordinate clouds (mixed delta
  * magnitudes and signs, so runs, full triples and smallidx shifts
  * all occur) and precisions must round-trip encode→decode to exactly
  * quantize(input) — the format's decode contract — and the
  * mixed-radix primitives must round-trip any in-range triple. 60
  * frame trials × 4 precisions, deterministic seeds: every failure is
  * a reproducible bit-stream the two codec halves disagree on. */
class XtcFuzzSpec extends AnyFunSuite {

  private def quant(v: Float, prec: Float): Float = {
    val lf = v * prec
    val lint = if (lf >= 0) (lf + 0.5f).toInt else (lf - 0.5f).toInt
    lint * (1.0f / prec)
  }

  /** Random-walk cloud with three delta regimes. */
  private def cloud(rnd: Random): Array[Float] = {
    val n = 10 + rnd.nextInt(111)
    val out = new Array[Float](3 * n)
    var x = 0f; var y = 0f; var z = 0f
    var i = 0
    while (i < 3 * n) {
      def delta(): Float = rnd.nextInt(3) match {
        case 0 => rnd.between(-0.015f, 0.015f)
        case 1 => rnd.between(-0.4f, 0.4f)
        case _ => rnd.between(-8f, 8f)
      }
      x += delta(); y += delta(); z += delta()
      out(i) = x; out(i + 1) = y; out(i + 2) = z
      i += 3
    }
    out
  }

  test("encode→decode == quantize(input) over random clouds and " +
    "precisions (60 seeded trials)") {
    val precs = Array(10f, 100f, 1000f, 10000f)
    (0 until 60).foreach { trial =>
      val rnd = new Random(1000 + trial)
      val xyz = cloud(rnd)
      val prec = precs(trial % precs.length)
      val bytes = XtcWrite.encodeFrame(XtcWrite.Frame(xyz,
        precision = prec), trial)
      val tmp = java.nio.file.Files.createTempFile("fuzz", ".xtc")
      java.nio.file.Files.write(tmp, bytes)
      val raf = graft.sources.FsIO.openRandom(tmp.toString)
      try {
        val meta = XtcFormat.readFrameMeta(raf, tmp.toString, 0).get
        assert(meta.nAtoms == xyz.length / 3)
        val out = new Array[Float](xyz.length)
        val blob = new Array[Byte](meta.nBytes)
        raf.seek(meta.dataStart)
        raf.readFully(blob)
        XtcFormat.decompress(meta, blob, out, tmp.toString, 0)
        var i = 0
        while (i < xyz.length) {
          assert(out(i) == quant(xyz(i), prec),
            s"trial $trial coord $i: ${out(i)} != " +
              s"quant(${xyz(i)}, $prec)")
          i += 1
        }
      } finally {
        raf.close()
        java.nio.file.Files.delete(tmp)
      }
    }
  }

  test("mixed-radix sendInts/receiveInts round-trip arbitrary " +
    "in-range triples (60 seeded radix sets)") {
    (0 until 60).foreach { trial =>
      val rnd = new Random(2000 + trial)
      val sizes = Array.fill(3)(2 + rnd.nextInt(0xfffffe))
      val width = XtcFormat.sizeOfInts(sizes)
      val triples = Array.fill(20)((rnd.nextInt(sizes(0)),
        rnd.nextInt(sizes(1)), rnd.nextInt(sizes(2))))
      val w = new XtcFormat.BitWriter(64)
      triples.foreach { case (a, b, c) =>
        w.sendInts(width, sizes, a, b, c)
      }
      val r = new XtcFormat.BitReader(w.finish())
      val out = new Array[Int](3)
      triples.foreach { case (a, b, c) =>
        r.receiveInts(width, sizes, out, 0)
        assert(out(0) == a && out(1) == b && out(2) == c,
          s"trial $trial sizes ${sizes.toSeq}")
      }
    }
  }
}
