package graft.tools

import graft.sources.{FsIO, XtcFormat}

/** Diagnostic: walks the reference test.xtc, prints per-frame header
  * fields and box diagonals, and diffs selected frames' decoded
  * coordinates against the mdtraj-written test.pdb (Å). Driver-side
  * only — no Spark session needed. */
object XtcProbe {
  def main(args: Array[String]): Unit = {
    val xtc = args.headOption.getOrElse(
      "/root/reference/dask_traj/tests/test.xtc")
    val pdb = args.lift(1).getOrElse(
      "/root/reference/dask_traj/tests/test.pdb")
    val src = scala.io.Source.fromFile(pdb)
    val expected =
      try src.getLines().filter(_.startsWith("ATOM")).map { l =>
        Array(l.substring(30, 38).trim.toDouble,
          l.substring(38, 46).trim.toDouble,
          l.substring(46, 54).trim.toDouble)
      }.toArray
      finally src.close()
    println(s"pdb atoms: ${expected.length}")
    val idx = XtcFormat.index(xtc, "FAILFAST", Long.MaxValue)
    println(s"frames: ${idx.length}")
    val raf = FsIO.openRandom(xtc)
    try {
      idx.take(5).foreach { case (_, _, m) =>
        println(f"step=${m.step} time=${m.time}%.3f prec=${m.precision} " +
          f"box=(${m.box(0)}%.4f,${m.box(4)}%.4f,${m.box(8)}%.4f) " +
          s"nbytes=${m.nBytes}")
      }
      // diff every frame's decode against the PDB; report the best match
      var bestFrame = -1
      var bestWorst = Double.MaxValue
      idx.zipWithIndex.foreach { case ((_, _, m), fi) =>
        val xs = new Array[Float](3 * m.nAtoms)
        val blob = new Array[Byte](m.nBytes)
        raf.seek(m.dataStart)
        raf.readFully(blob)
        XtcFormat.decompress(m, blob, xs, xtc, fi)
        var worst = 0.0
        var i = 0
        while (i < math.min(m.nAtoms, expected.length)) {
          var j = 0
          while (j < 3) {
            val d = math.abs(xs(3 * i + j) * 10.0 - expected(i)(j))
            if (d > worst) worst = d
            j += 1
          }
          i += 1
        }
        if (worst < bestWorst) { bestWorst = worst; bestFrame = fi }
        if (fi < 3 || worst < 0.01)
          println(f"frame $fi: worst |xtc-pdb| = $worst%.5f A " +
            f"(atom0 xtc=(${xs(0) * 10}%.3f,${xs(1) * 10}%.3f," +
            f"${xs(2) * 10}%.3f) pdb=(${expected(0)(0)},${expected(0)(1)}," +
            f"${expected(0)(2)}))")
      }
      println(f"best frame: $bestFrame worst=$bestWorst%.5f A")
    } finally raf.close()
  }
}
