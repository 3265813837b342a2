package graft.sources

import java.io.DataOutputStream
import java.nio.ByteBuffer

/** netCDF-classic writer for the AMBER trajectory and restart
  * conventions — the write half of the [[NetcdfDataSource]] round-trip
  * (SURVEY §2.1 S6 per-format parity). Emits CDF-2 (64-bit offsets):
  * the header's dimension/attribute/variable lists followed by
  * fixed-layout big-endian data, record variables interleaved per
  * record in declaration order with slabs padded to 4 bytes — the
  * public classic-format layout, written directly with no codec
  * library.
  *
  * Trajectory profile: `coordinates(frame, atom, spatial) float`,
  * `time(frame) float`, optional `cell_lengths`/`cell_angles
  * (frame, 3) double`. Restart profile: no record dimension,
  * `coordinates(atom, spatial) double`, scalar `time double`,
  * optional cells. */
object NetcdfWrite {

  final case class Frame(
      xyz: Array[Float], // x0,y0,z0,x1,... (Å)
      cellLengths: Option[Array[Double]] = None,
      cellAngles: Option[Array[Double]] = None,
      time: Double = 0.0)

  private val TypeChar = 2
  private val TypeInt = 4
  private val TypeFloat = 5
  private val TypeDouble = 6

  private final case class VarSpec(name: String, ncType: Int,
      dimIds: Seq[Int], attrs: Seq[(String, String)],
      numAttrs: Seq[(String, Double)] = Nil)

  /** Serializes one header; `begins` supplies each variable's data
    * offset (same order as `vars`). Layout is identical for any begin
    * values (fixed-width v2 offsets), so the caller measures with
    * zeros then re-serializes. */
  private def header(numRecs: Int, dims: Seq[(String, Int)],
      globalAttrs: Seq[(String, String)], vars: Seq[VarSpec],
      slabs: Seq[Long], begins: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    def name(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      d.writeInt(b.length)
      d.write(b)
      d.write(new Array[Byte]((4 - b.length % 4) % 4))
    }
    def attrs(as: Seq[(String, String)],
        nums: Seq[(String, Double)] = Nil): Unit =
      if (as.isEmpty && nums.isEmpty) { d.writeInt(0); d.writeInt(0) }
      else {
        d.writeInt(NetcdfFormat.TagAttribute)
        d.writeInt(as.size + nums.size)
        as.foreach { case (k, v) =>
          name(k)
          d.writeInt(TypeChar)
          val b = v.getBytes("UTF-8")
          d.writeInt(b.length)
          d.write(b)
          d.write(new Array[Byte]((4 - b.length % 4) % 4))
        }
        nums.foreach { case (k, v) =>
          name(k)
          d.writeInt(TypeDouble)
          d.writeInt(1)
          d.writeDouble(v)
        }
      }
    d.write('C'); d.write('D'); d.write('F'); d.write(2)
    d.writeInt(numRecs)
    d.writeInt(NetcdfFormat.TagDimension); d.writeInt(dims.size)
    dims.foreach { case (n, len) => name(n); d.writeInt(len) }
    attrs(globalAttrs)
    d.writeInt(NetcdfFormat.TagVariable); d.writeInt(vars.size)
    vars.zipWithIndex.foreach { case (v, i) =>
      name(v.name)
      d.writeInt(v.dimIds.size)
      v.dimIds.foreach(d.writeInt)
      attrs(v.attrs, v.numAttrs)
      d.writeInt(v.ncType)
      val padded = (slabs(i) + 3) / 4 * 4
      d.writeInt(math.min(padded, Int.MaxValue.toLong).toInt)
      d.writeLong(begins(i)) // CDF-2: 64-bit offset
    }
    d.flush()
    out.toByteArray
  }

  def write(path: String, frames: Seq[Frame],
      coordScale: Double = 1.0): Unit = {
    require(frames.nonEmpty, "netcdf write requires at least one frame")
    val n = frames.head.xyz.length / 3
    require(frames.forall(_.xyz.length == 3 * n),
      "all frames must have the same atom count")
    val withCell = frames.head.cellLengths.isDefined
    require(frames.forall(f => f.cellLengths.isDefined == withCell &&
      f.cellAngles.isDefined == withCell),
      "cell blocks must be all-present or all-absent")

    // dims: frame(record), spatial, atom [, cell_spatial, cell_angular]
    val dims = Seq(("frame", 0), ("spatial", 3), ("atom", n)) ++
      (if (withCell) Seq(("cell_spatial", 3), ("cell_angular", 3))
       else Nil)
    val vars = Seq(
      VarSpec("time", TypeFloat, Seq(0),
        Seq("units" -> "picosecond")),
      VarSpec("coordinates", TypeFloat, Seq(0, 2, 1),
        Seq("units" -> "angstrom"),
        if (coordScale != 1.0) Seq("scale_factor" -> coordScale)
        else Nil)) ++
      (if (withCell) Seq(
        VarSpec("cell_lengths", TypeDouble, Seq(0, 3),
          Seq("units" -> "angstrom")),
        VarSpec("cell_angles", TypeDouble, Seq(0, 4),
          Seq("units" -> "degree")))
       else Nil)
    val slabs: Seq[Long] =
      Seq(4L, 3L * n * 4) ++ (if (withCell) Seq(24L, 24L) else Nil)
    val padded = slabs.map(s => (s + 3) / 4 * 4)
    val globals = Seq("Conventions" -> "AMBER",
      "ConventionVersion" -> "1.0")
    val headLen = header(frames.size, dims, globals, vars, slabs,
      Seq.fill(vars.size)(0L)).length.toLong
    val begins = padded.scanLeft(headLen)(_ + _).init
    val out = new DataOutputStream(FsIO.createStream(path))
    try {
      out.write(header(frames.size, dims, globals, vars, slabs, begins))
      frames.foreach { fr =>
        val bb = ByteBuffer.allocate(padded.sum.toInt)
        bb.putFloat(fr.time.toFloat)
        // stored × scale_factor = real value, so store value/scale
        fr.xyz.foreach(v => bb.putFloat((v / coordScale).toFloat))
        if (withCell) {
          fr.cellLengths.get.foreach(bb.putDouble)
          fr.cellAngles.get.foreach(bb.putDouble)
        }
        out.write(bb.array()) // allocate() zero-fills the padding
      }
    } finally out.close()
  }

  /** One-frame AMBER restart: double coordinates, scalar time. */
  def writeRestart(path: String, xyz: Array[Double], time: Double,
      cellLengths: Option[Array[Double]] = None,
      cellAngles: Option[Array[Double]] = None): Unit = {
    val n = xyz.length / 3
    require(xyz.length == 3 * n, "xyz length must be 3*natoms")
    val withCell = cellLengths.isDefined && cellAngles.isDefined
    val dims = Seq(("atom", n), ("spatial", 3)) ++
      (if (withCell) Seq(("cell_spatial", 3), ("cell_angular", 3))
       else Nil)
    val vars = Seq(
      VarSpec("time", TypeDouble, Nil, Seq("units" -> "picosecond")),
      VarSpec("coordinates", TypeDouble, Seq(0, 1),
        Seq("units" -> "angstrom"))) ++
      (if (withCell) Seq(
        VarSpec("cell_lengths", TypeDouble, Seq(2),
          Seq("units" -> "angstrom")),
        VarSpec("cell_angles", TypeDouble, Seq(3),
          Seq("units" -> "degree")))
       else Nil)
    val slabs: Seq[Long] =
      Seq(8L, 3L * n * 8) ++ (if (withCell) Seq(24L, 24L) else Nil)
    val padded = slabs.map(s => (s + 3) / 4 * 4)
    val globals = Seq("Conventions" -> "AMBERRESTART",
      "ConventionVersion" -> "1.0")
    val headLen = header(0, dims, globals, vars, slabs,
      Seq.fill(vars.size)(0L)).length.toLong
    val begins = padded.scanLeft(headLen)(_ + _).init
    val out = new DataOutputStream(FsIO.createStream(path))
    try {
      out.write(header(0, dims, globals, vars, slabs, begins))
      val bb = ByteBuffer.allocate(padded.sum.toInt)
      bb.putDouble(time)
      xyz.foreach(bb.putDouble)
      if (withCell) {
        cellLengths.get.foreach(bb.putDouble)
        cellAngles.get.foreach(bb.putDouble)
      }
      out.write(bb.array())
    } finally out.close()
  }
}
