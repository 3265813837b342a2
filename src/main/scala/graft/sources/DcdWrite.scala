package graft.sources

import java.io.DataOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** DCD file writer — the write half of the binary round-trip
  * (SURVEY §2.1 S6 per-format parity; reader in [[DcdDataSource]]).
  * Emits the CHARMM variant of the public format: "CORD" header with a
  * 20-int icntrl block, one title record, the natoms record, then one
  * fixed-size record group per frame (optional 48-byte unitcell + the
  * three coordinate records), every record framed by Fortran length
  * markers. Both byte orders can be produced — the reader's endianness
  * detection is testable against real files of either sex.
  *
  * One frame: coordinates in the file's native unit (Å by convention —
  * the reader converts on scan), box as (a, b, c, alpha, beta, gamma)
  * degrees. `angleAsCosine` selects the modern CHARMM representation
  * (cos(angle) stored in the angle slots) vs the legacy degrees form;
  * the reader accepts both.
  */
object DcdWrite {

  final case class Frame(
      xs: Array[Float], ys: Array[Float], zs: Array[Float],
      box: Option[(Double, Double, Double, Double, Double, Double)])

  def write(path: String, frames: Seq[Frame],
      istart: Int = 0, nsavc: Int = 1, delta: Float = 1.0f,
      endian: ByteOrder = ByteOrder.LITTLE_ENDIAN,
      angleAsCosine: Boolean = false,
      title: String = "graft dcd writer"): Unit = {
    require(frames.nonEmpty, "dcd write requires at least one frame")
    val nAtoms = frames.head.xs.length
    require(frames.forall(f => f.xs.length == nAtoms &&
      f.ys.length == nAtoms && f.zs.length == nAtoms),
      "all frames must have the same atom count")
    val hasCell = frames.head.box.isDefined
    require(frames.forall(_.box.isDefined == hasCell),
      "unitcell presence must be uniform across frames (the record " +
        "layout is fixed per file)")

    val out = new DataOutputStream(FsIO.createStream(path))
    try {
      def record(body: ByteBuffer => Unit, size: Int): Unit = {
        val bb = ByteBuffer.allocate(size + 8).order(endian)
        bb.putInt(size)
        body(bb)
        require(bb.position() == size + 4,
          s"record body wrote ${bb.position() - 4} bytes, declared $size")
        bb.putInt(size)
        out.write(bb.array())
      }

      // header record: CORD + icntrl[20]
      record({ bb =>
        bb.put("CORD".getBytes("US-ASCII"))
        val icntrl = new Array[Int](20)
        icntrl(0) = frames.length // NSET
        icntrl(1) = istart
        icntrl(2) = nsavc
        icntrl(9) = java.lang.Float.floatToIntBits(delta)
        icntrl(10) = if (hasCell) 1 else 0
        icntrl(19) = 24 // CHARMM version — nonzero marks the CHARMM variant
        icntrl.foreach(bb.putInt)
      }, 84)

      // title record: NTITLE + NTITLE×80 chars
      val t80 = title.padTo(80, ' ').take(80).getBytes("US-ASCII")
      record({ bb => bb.putInt(1); bb.put(t80) }, 84)

      // natoms record
      record(_.putInt(nAtoms), 4)

      frames.foreach { f =>
        f.box.foreach { case (a, b, c, alpha, beta, gamma) =>
          def slot(deg: Double): Double =
            if (angleAsCosine) math.cos(math.toRadians(deg)) else deg
          // CHARMM XTL slot order: A, gamma, B, beta, alpha, C
          record({ bb =>
            bb.putDouble(a); bb.putDouble(slot(gamma))
            bb.putDouble(b); bb.putDouble(slot(beta))
            bb.putDouble(slot(alpha)); bb.putDouble(c)
          }, 48)
        }
        def coords(v: Array[Float]): Unit =
          record({ bb => v.foreach(bb.putFloat) }, 4 * nAtoms)
        coords(f.xs); coords(f.ys); coords(f.zs)
      }
    } finally out.close()
  }
}
