package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Frameset writer for the dtr payload profile [[DtrDataSource]]
  * documents: `metadata` + `timekeys` + `frame%09d` files each holding
  * `framesPerFile` fixed-size frames. Used by the round-trip specs and
  * as the materializing sink for frameset output. Coordinates are
  * written as given (the read side applies `unit_scale`). */
object DtrWrite {
  /** One frame: positions (float32 triples) + optional box
    * (a, b, c, alpha, beta, gamma) + its time stamp. */
  case class Frame(xs: Array[Float], ys: Array[Float], zs: Array[Float],
      box: Option[(Double, Double, Double, Double, Double, Double)],
      time: Double)

  def write(dir: String, frames: Seq[Frame],
      framesPerFile: Int = 256): Unit = {
    require(frames.nonEmpty, "dtr write: no frames")
    require(framesPerFile > 0, "dtr write: framesPerFile must be > 0")
    val nAtoms = frames.head.xs.length
    require(nAtoms <= 100_000_000,
      s"dtr write: $nAtoms atoms exceeds the 1e8 frame-record bound")
    val hasBox = frames.head.box.isDefined
    frames.foreach { f =>
      require(f.xs.length == nAtoms && f.ys.length == nAtoms &&
        f.zs.length == nAtoms, "dtr write: ragged atom counts")
      require(f.box.isDefined == hasBox,
        "dtr write: all frames must agree on box presence")
    }
    FsIO.mkdirs(dir)
    if (!FsIO.isDirectory(dir)) throw new java.io.IOException(
      s"dtr write: cannot create frameset directory $dir")

    val meta = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    meta.putInt(DtrFormat.MetaMagic).putInt(1).putInt(nAtoms)
      .putInt(if (hasBox) 1 else 0)
    FsIO.writeBytes(FsIO.child(dir, "metadata"), meta.array())

    val keys = ByteBuffer.allocate(16 + 8 * frames.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    keys.putInt(DtrFormat.KeysMagic).putInt(framesPerFile)
      .putLong(frames.length.toLong)
    frames.foreach(f => keys.putDouble(f.time))
    FsIO.writeBytes(FsIO.child(dir, "timekeys"), keys.array())

    frames.grouped(framesPerFile).zipWithIndex.foreach {
      case (group, fileIdx) =>
        val out = FsIO.createStream(
          FsIO.child(dir, DtrFormat.frameFileName(fileIdx.toLong)))
        try group.foreach { f =>
          val bb = ByteBuffer.allocate(
            DtrFormat.frameBytes(DtrFormat.Meta(nAtoms, hasBox)).toInt)
            .order(ByteOrder.LITTLE_ENDIAN)
          f.box.foreach { case (a, b, c, al, be, ga) =>
            bb.putDouble(a).putDouble(b).putDouble(c)
              .putDouble(al).putDouble(be).putDouble(ga)
          }
          var i = 0
          while (i < nAtoms) {
            bb.putFloat(f.xs(i)).putFloat(f.ys(i)).putFloat(f.zs(i))
            i += 1
          }
          out.write(bb.array())
        } finally out.close()
    }
  }
}
