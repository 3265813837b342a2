package graft.sources

import java.io.BufferedWriter

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 write path for the gro format — same frame-grouped shard
  * contract as the xyz writer (XyzWrite.scala): rows of one frame
  * consecutive within a partition, one self-contained `part-NNNNN.gro`
  * file per task. Fixed-width atom lines per the GROMACS spec; the box
  * line carries the full nine vector components when any off-diagonal
  * is non-zero, else the three diagonal terms. */
class GroWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new GroWrite(path, info.schema(), doTruncate)
}

class GroWrite(path: String, schema: StructType, truncate: Boolean)
    extends Write {
  override def toBatch: BatchWrite = new GroBatchWrite(path, schema, truncate)
}

class GroBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    if (truncate && FsIO.exists(path))
      FsIO.list(path).filter { e => // all extensions the scan accepts
        e.name.endsWith(".gro") || e.name.endsWith(".gro.gz")
      }.foreach(e => FsIO.delete(e.path))
    FsIO.mkdirs(path)
    new GroWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GroWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GroDataWriter(path, schema, partitionId)
}

private case class GroCommit(partitionId: Int, frames: Long)
    extends WriterCommitMessage

class GroDataWriter(path: String, schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val iFrame = idx("frame_id")
  private val iTime = idx("time")
  private val iResId = idx("res_id")
  private val iResName = idx("res_name")
  private val iAtomName = idx("atom_name")
  private val iX = idx("x"); private val iY = idx("y")
  private val iZ = idx("z")
  private val iB = Array("bv1x", "bv1y", "bv1z", "bv2x", "bv2y", "bv2z",
    "bv3x", "bv3y", "bv3z").map(idx)
  require(iFrame >= 0 && iResName >= 0 && iAtomName >= 0 &&
    iX >= 0 && iY >= 0 && iZ >= 0,
    s"gro write needs columns frame_id, res_name, atom_name, x, y, z; got " +
      schema.fieldNames.mkString(", "))

  /** Locale-pinned formatting: the reader (and GROMACS) expect '.'
    * decimal separators regardless of JVM default locale. */
  private def fmt(pattern: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, pattern,
      args.map(_.asInstanceOf[AnyRef]): _*)

  private val file = FsIO.child(path, f"part-$partitionId%05d.gro")
  private val out: BufferedWriter = FsIO.createWriter(file)
  private var curFrame = Long.MinValue
  private var curTime = 0.0
  private val box = new Array[Float](9)
  private val atoms = new java.lang.StringBuilder()
  private var atomNum = 0
  private var frames = 0L

  private def flushFrame(): Unit = {
    if (atomNum == 0) return
    out.write(s"graft t= $curTime"); out.newLine()
    out.write(atomNum.toString); out.newLine()
    out.write(atoms.toString)
    val offDiag = box(1) != 0f || box(2) != 0f || box(3) != 0f ||
      box(5) != 0f || box(6) != 0f || box(7) != 0f
    val terms =
      if (offDiag) Seq(box(0), box(4), box(8), box(1), box(2), box(3),
        box(5), box(6), box(7))
      else Seq(box(0), box(4), box(8))
    out.write(terms.map(v => fmt("%10.5f", v)).mkString)
    out.newLine()
    atoms.setLength(0)
    atomNum = 0
    frames += 1
  }

  override def write(row: InternalRow): Unit = {
    val f = row.getLong(iFrame)
    if (f != curFrame) {
      flushFrame()
      curFrame = f
      curTime = if (iTime >= 0 && !row.isNullAt(iTime)) row.getDouble(iTime)
        else f.toDouble
      var i = 0
      while (i < 9) {
        box(i) = if (iB(i) >= 0 && !row.isNullAt(iB(i)))
          row.getFloat(iB(i)) else 0f
        i += 1
      }
    }
    atomNum += 1
    val resId = if (iResId >= 0 && !row.isNullAt(iResId))
      row.getInt(iResId) else 1
    atoms.append(fmt("%5d", resId))
      .append(fmt("%-5s", row.getUTF8String(iResName).toString.take(5)))
      .append(fmt("%-5s", row.getUTF8String(iAtomName).toString.take(5)))
      .append(fmt("%5d", atomNum))
      .append(fmt("%8.3f", row.getFloat(iX)))
      .append(fmt("%8.3f", row.getFloat(iY)))
      .append(fmt("%8.3f", row.getFloat(iZ)))
      .append('\n')
  }

  override def commit(): WriterCommitMessage = {
    flushFrame()
    out.close()
    GroCommit(partitionId, frames)
  }

  override def abort(): Unit = {
    out.close()
    FsIO.delete(file)
  }

  override def close(): Unit = ()
}
