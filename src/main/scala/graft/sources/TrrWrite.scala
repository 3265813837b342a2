package graft.sources

import java.io.DataOutputStream
import java.nio.ByteBuffer

/** TRR file writer — the write half of the variable-record binary
  * round-trip (reader in [[TrrDataSource]]; SURVEY §2.1 S6 per-format
  * parity). Emits the public GROMACS layout: per frame an XDR
  * big-endian header (magic 1993, "GMX_trn_file" tag, 13 size ints,
  * time + lambda) and the declared payload blocks. Velocities and
  * forces are optional PER FRAME — that is what makes real TRR files
  * variable-record and is exactly what the reader's index walk must
  * handle, so the writer deliberately supports mixed frames. Single- or
  * double-precision output per file. */
object TrrWrite {

  /** xyz is 3×natoms row-major (x0,y0,z0,x1,...), nm. box is the 3×3
    * unitcell vector matrix row-major, nm. */
  final case class Frame(
      xyz: Array[Float],
      box: Option[Array[Float]] = None,
      v: Option[Array[Float]] = None,
      f: Option[Array[Float]] = None,
      step: Long = 0L, time: Double = 0.0, lambda: Double = 0.0)

  def write(path: String, frames: Seq[Frame],
      doublePrecision: Boolean = false): Unit = {
    require(frames.nonEmpty, "trr write requires at least one frame")
    val out = new DataOutputStream(FsIO.createStream(path))
    val realSize = if (doublePrecision) 8 else 4
    try {
      frames.zipWithIndex.foreach { case (fr, i) =>
        val n = fr.xyz.length / 3
        require(fr.xyz.length == 3 * n, s"frame $i: xyz length not 3*n")
        fr.box.foreach(b => require(b.length == 9,
          s"frame $i: box must be 9 floats"))
        Seq(fr.v, fr.f).foreach(_.foreach(a =>
          require(a.length == 3 * n, s"frame $i: v/f length != xyz")))
        val boxSize = fr.box.map(_ => 9 * realSize).getOrElse(0)
        val xSize = 3 * n * realSize
        val vSize = fr.v.map(_ => xSize).getOrElse(0)
        val fSize = fr.f.map(_ => xSize).getOrElse(0)
        // 12 (magic + 2 length ints) + 12 (tag) + 52 (13 ints) + t/lambda
        val total = 24 + 52 + 2 * realSize + boxSize + xSize +
          vSize + fSize
        val bb = ByteBuffer.allocate(total) // XDR: big-endian default
        bb.putInt(TrrFormat.Magic)
        bb.putInt(TrrFormat.MagicTag.length + 1) // GROMACS strlen+1 field
        bb.putInt(TrrFormat.MagicTag.length)
        bb.put(TrrFormat.MagicTag.getBytes("US-ASCII")) // 12 bytes, no pad
        // ir, e, box, vir, pres, top, sym, x, v, f sizes, natoms, step, nre
        Seq(0, 0, boxSize, 0, 0, 0, 0, xSize, vSize, fSize,
          n, fr.step.toInt, 0).foreach(bb.putInt)
        def real(d: Double): Unit =
          if (doublePrecision) bb.putDouble(d) else bb.putFloat(d.toFloat)
        real(fr.time); real(fr.lambda)
        fr.box.foreach(_.foreach(v => real(v.toDouble)))
        fr.xyz.foreach(v => real(v.toDouble))
        fr.v.foreach(_.foreach(x => real(x.toDouble)))
        fr.f.foreach(_.foreach(x => real(x.toDouble)))
        require(bb.position() == total,
          s"frame $i: wrote ${bb.position()} bytes, declared $total")
        out.write(bb.array())
      }
    } finally out.close()
  }
}
