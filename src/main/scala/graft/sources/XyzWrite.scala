package graft.sources

import java.io.BufferedWriter

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 write path for the xyz text format — the inverse of the scan
  * (SURVEY §2.1 S6: the reference only materializes via `to_mdtraj`;
  * a real engine needs the sink too, cf. the `traj[::-1]` reorder test
  * at tests/test_dask_traj.py:143 whose natural output is a rewritten
  * file).
  *
  * Contract: input rows carry the canonical XyzTable schema; rows of
  * one frame must be consecutive within a partition and a frame must
  * not straddle partitions (`repartitionByRange(frame_id)` +
  * `sortWithinPartitions(frame_id, atom_id)` provides both). Each task
  * writes an independent `part-NNNNN.xyz` file — every output file is
  * itself a valid xyz file, so a 1000-task write is 1000 valid shards
  * with no coordination; commit is append-only file placement.
  */
class XyzWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new XyzWrite(path, info.schema(), doTruncate)
}

class XyzWrite(path: String, schema: StructType, truncate: Boolean)
    extends Write {
  override def toBatch: BatchWrite = new XyzBatchWrite(path, schema, truncate)
}

class XyzBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    if (truncate && FsIO.exists(path))
      FsIO.list(path).filter { e => // all extensions the scan accepts
        e.name.endsWith(".xyz") || e.name.endsWith(".xyz.gz")
      }.foreach(e => FsIO.delete(e.path))
    FsIO.mkdirs(path)
    new XyzWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class XyzWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new XyzDataWriter(path, schema, partitionId)
}

private case class XyzCommit(partitionId: Int, frames: Long)
    extends WriterCommitMessage

/** Streams rows into frame blocks: buffers one frame's atom lines (the
  * same natoms bound as the reader), flushes the block when frame_id
  * advances. */
class XyzDataWriter(path: String, schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val iFrame = idx("frame_id")
  private val iTime = idx("time")
  private val iElement = idx("element")
  private val iX = idx("x"); private val iY = idx("y")
  private val iZ = idx("z")
  private val iBx = idx("box_x"); private val iBy = idx("box_y")
  private val iBz = idx("box_z")
  require(iFrame >= 0 && iElement >= 0 && iX >= 0 && iY >= 0 && iZ >= 0,
    s"xyz write needs columns frame_id, element, x, y, z; got " +
      schema.fieldNames.mkString(", "))

  private val file = FsIO.child(path, f"part-$partitionId%05d.xyz")
  private val out: BufferedWriter = FsIO.createWriter(file)
  private var curFrame = Long.MinValue
  private var curTime = 0.0
  private var curBox: Option[(Float, Float, Float)] = None
  private val atoms = new java.lang.StringBuilder()
  private var atomCount = 0
  private var frames = 0L

  private def flushFrame(): Unit = {
    if (atomCount == 0) return
    out.write(atomCount.toString); out.newLine()
    val boxStr = curBox
      .map { case (bx, by, bz) => s" Box: $bx $by $bz" }.getOrElse("")
    out.write(s"# Step: $curTime$boxStr"); out.newLine()
    out.write(atoms.toString)
    atoms.setLength(0)
    atomCount = 0
    frames += 1
  }

  override def write(row: InternalRow): Unit = {
    val f = row.getLong(iFrame)
    if (f != curFrame) {
      flushFrame()
      curFrame = f
      curTime = if (iTime >= 0 && !row.isNullAt(iTime)) row.getDouble(iTime)
        else f.toDouble
      curBox =
        if (iBx >= 0 && !row.isNullAt(iBx) && iBy >= 0 && !row.isNullAt(iBy)
          && iBz >= 0 && !row.isNullAt(iBz))
          Some((row.getFloat(iBx), row.getFloat(iBy), row.getFloat(iBz)))
        else None
    }
    atoms.append(row.getUTF8String(iElement).toString)
      .append(' ').append(row.getFloat(iX))
      .append(' ').append(row.getFloat(iY))
      .append(' ').append(row.getFloat(iZ)).append('\n')
    atomCount += 1
  }

  override def commit(): WriterCommitMessage = {
    flushFrame()
    out.close()
    XyzCommit(partitionId, frames)
  }

  override def abort(): Unit = {
    out.close()
    FsIO.delete(file)
  }

  override def close(): Unit = ()
}
