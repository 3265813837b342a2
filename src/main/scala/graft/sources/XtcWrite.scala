package graft.sources

import java.io.DataOutputStream
import java.nio.ByteBuffer

/** XTC file writer — the write half of the compressed-trajectory
  * round-trip (reader in [[XtcDataSource]]; SURVEY §2.1 S6 per-format
  * parity). Emits the public XDR layout with the standard coordinate
  * compression: magnitude-sorted integer quantization against a
  * per-frame precision, full-width triples for isolated atoms and
  * small-delta runs (with the water-swap head and the persistent
  * run-length elision) for consecutive close atoms, the `magicints`
  * ladder adapting the small width as the stream goes. The run
  * heuristics mirror the format's reference behavior closely enough
  * to compress real data well, but ANY grammar-valid choice decodes
  * identically everywhere — the round-trip spec pins
  * encode→decode == quantize(input) exactly.
  *
  * Tiny systems (natoms <= 9) take the format's plain-float path. */
object XtcWrite {

  /** xyz is 3×natoms row-major (x0,y0,z0,x1,...), nm. box is the 3×3
    * unitcell vector matrix row-major, nm (all zeros = no box). */
  final case class Frame(
      xyz: Array[Float],
      box: Array[Float] = new Array[Float](9),
      step: Long = 0L, time: Double = 0.0, precision: Float = 1000f)

  def write(path: String, frames: Seq[Frame]): Unit = {
    require(frames.nonEmpty, "xtc write requires at least one frame")
    val out = new DataOutputStream(FsIO.createStream(path))
    // index via a counter, not zipWithIndex: callers stream frames
    // through virtual IndexedSeqs (RefWorkloadBench generates 340 MB
    // of frames lazily) and zipWithIndex would materialize them all
    try {
      var i = 0
      frames.foreach { fr => out.write(encodeFrame(fr, i)); i += 1 }
    } finally out.close()
  }

  /** One whole frame as bytes (header + box + coordinate block). */
  def encodeFrame(fr: Frame, i: Int): Array[Byte] = {
    val n = fr.xyz.length / 3
    require(fr.xyz.length == 3 * n, s"frame $i: xyz length not 3*n")
    require(fr.box.length == 9, s"frame $i: box must be 9 floats")
    require(fr.precision > 0f, s"frame $i: precision must be positive")
    val head = ByteBuffer.allocate(56)
    head.putInt(XtcFormat.Magic)
    head.putInt(n)
    head.putInt(fr.step.toInt)
    head.putFloat(fr.time.toFloat)
    fr.box.foreach(head.putFloat)
    head.putInt(n) // the coordinate block's own size field
    if (n <= 9) {
      val bb = ByteBuffer.allocate(56 + 12 * n)
      bb.put(head.array())
      fr.xyz.foreach(bb.putFloat)
      return bb.array()
    }
    val blob = compress(fr.xyz, n, fr.precision, i)
    val padded = (blob.data.length + 3) / 4 * 4
    val bb = ByteBuffer.allocate(56 + 36 + padded)
    bb.put(head.array())
    bb.putFloat(fr.precision)
    blob.minInt.foreach(bb.putInt)
    blob.maxInt.foreach(bb.putInt)
    bb.putInt(blob.smallIdx)
    bb.putInt(blob.data.length)
    bb.put(blob.data) // ByteBuffer zero-fill supplies the XDR pad
    bb.array()
  }

  private final case class Blob(minInt: Array[Int], maxInt: Array[Int],
      smallIdx: Int, data: Array[Byte])

  /** Quantizes to ints (round half away from zero, the format's
    * convention) and encodes the bit-stream. */
  private def compress(xyz: Array[Float], n: Int, precision: Float,
      frame: Int): Blob = {
    import XtcFormat.{MagicInts, FirstIdx}
    val lastIdx = MagicInts.length - 1
    val ip = new Array[Int](3 * n)
    val minInt = Array(Int.MaxValue, Int.MaxValue, Int.MaxValue)
    val maxInt = Array(Int.MinValue, Int.MinValue, Int.MinValue)
    var minDiff = Int.MaxValue
    var i = 0
    while (i < 3 * n) {
      var d = 0
      var j = 0
      while (j < 3) {
        val lf = xyz(i + j) * precision
        require(math.abs(lf) < (1 << 30),
          s"frame $frame: |coordinate × precision| $lf overflows")
        val v = if (lf >= 0) (lf + 0.5f).toInt else (lf - 0.5f).toInt
        ip(i + j) = v
        if (v < minInt(j)) minInt(j) = v
        if (v > maxInt(j)) maxInt(j) = v
        if (i > 0) d += math.abs(ip(i + j - 3) - v)
        j += 1
      }
      if (i > 0 && d < minDiff) minDiff = d
      i += 3
    }
    val sizeInt = new Array[Int](3)
    val bitSizeInt = new Array[Int](3)
    var oversize = false
    var j = 0
    while (j < 3) {
      val s = maxInt(j) - minInt(j) + 1
      require(s > 0, s"frame $frame: integer range overflows")
      sizeInt(j) = s
      if (s > 0xffffff) oversize = true
      j += 1
    }
    var bitSize = 0
    if (oversize) {
      j = 0
      while (j < 3) { bitSizeInt(j) = XtcFormat.sizeOfInt(sizeInt(j)); j += 1 }
    } else bitSize = XtcFormat.sizeOfInts(sizeInt)

    var smallIdx = FirstIdx
    while (smallIdx < lastIdx && MagicInts(smallIdx) < minDiff)
      smallIdx += 1
    val smallIdx0 = smallIdx
    val maxIdx = math.min(lastIdx, smallIdx + 8)
    val minIdx = maxIdx - 8
    // the (small, smaller, sizesmall) state machine must start exactly
    // where the decoder starts from the written smallidx — minidx/maxidx
    // only bound this encoder's grow/shrink DECISIONS, never the state
    var smaller = MagicInts(math.max(FirstIdx, smallIdx - 1)) / 2
    var small = MagicInts(smallIdx) / 2
    val larger = MagicInts(maxIdx) / 2
    val sizeSmall = new Array[Int](3)
    sizeSmall(0) = MagicInts(smallIdx)
    sizeSmall(1) = sizeSmall(0); sizeSmall(2) = sizeSmall(0)

    val w = new XtcFormat.BitWriter(3 * n + 64)
    val tmpRun = new Array[Int](8 * 3 + 3)
    val prev = new Array[Int](3)
    var prevRun = -1
    var atom = 0
    while (atom < n) {
      var isSmaller = 0
      val base = 3 * atom
      if (smallIdx < maxIdx && atom >= 1 &&
          math.abs(ip(base) - prev(0)) < larger &&
          math.abs(ip(base + 1) - prev(1)) < larger &&
          math.abs(ip(base + 2) - prev(2)) < larger) isSmaller = 1
      else if (smallIdx > minIdx) isSmaller = -1
      var isSmall = atom + 1 < n &&
        math.abs(ip(base) - ip(base + 3)) < small &&
        math.abs(ip(base + 1) - ip(base + 4)) < small &&
        math.abs(ip(base + 2) - ip(base + 5)) < small
      if (isSmall) {
        // water-swap: store the SECOND of the close pair as the full
        // triple; the first heads the small-delta run (the decoder
        // un-swaps)
        var t = ip(base); ip(base) = ip(base + 3); ip(base + 3) = t
        t = ip(base + 1); ip(base + 1) = ip(base + 4); ip(base + 4) = t
        t = ip(base + 2); ip(base + 2) = ip(base + 5); ip(base + 5) = t
      }
      if (bitSize == 0) {
        w.sendBits(bitSizeInt(0), ip(base) - minInt(0))
        w.sendBits(bitSizeInt(1), ip(base + 1) - minInt(1))
        w.sendBits(bitSizeInt(2), ip(base + 2) - minInt(2))
      } else w.sendInts(bitSize, sizeInt, ip(base) - minInt(0),
        ip(base + 1) - minInt(1), ip(base + 2) - minInt(2))
      prev(0) = ip(base); prev(1) = ip(base + 1); prev(2) = ip(base + 2)
      atom += 1

      var run = 0
      if (!isSmall && isSmaller == -1) isSmaller = 0
      while (isSmall && run < 8 * 3) {
        val b = 3 * atom
        if (isSmaller == -1) {
          val dx = ip(b) - prev(0); val dy = ip(b + 1) - prev(1)
          val dz = ip(b + 2) - prev(2)
          if (dx.toLong * dx + dy.toLong * dy + dz.toLong * dz >=
              smaller.toLong * smaller) isSmaller = 0
        }
        tmpRun(run) = ip(b) - prev(0) + small
        tmpRun(run + 1) = ip(b + 1) - prev(1) + small
        tmpRun(run + 2) = ip(b + 2) - prev(2) + small
        run += 3
        prev(0) = ip(b); prev(1) = ip(b + 1); prev(2) = ip(b + 2)
        atom += 1
        isSmall = atom < n &&
          math.abs(ip(3 * atom) - prev(0)) < small &&
          math.abs(ip(3 * atom + 1) - prev(1)) < small &&
          math.abs(ip(3 * atom + 2) - prev(2)) < small
      }
      if (run != prevRun || isSmaller != 0) {
        prevRun = run
        w.sendBits(1, 1)
        w.sendBits(5, run + isSmaller + 1)
      } else w.sendBits(1, 0)
      var k = 0
      while (k < run) {
        w.sendInts(smallIdx, sizeSmall, tmpRun(k), tmpRun(k + 1),
          tmpRun(k + 2))
        k += 3
      }
      if (isSmaller != 0) {
        smallIdx += isSmaller
        if (isSmaller < 0) {
          small = smaller
          smaller = if (smallIdx > FirstIdx) MagicInts(smallIdx - 1) / 2
                    else 0
        } else {
          smaller = small
          small = MagicInts(smallIdx) / 2
        }
        sizeSmall(0) = MagicInts(smallIdx)
        sizeSmall(1) = sizeSmall(0); sizeSmall(2) = sizeSmall(0)
      }
    }
    Blob(minInt, maxInt, smallIdx0, w.finish())
  }
}
