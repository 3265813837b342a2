package graft.sources

import java.io.OutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 write path for binpos — magic + `[natoms][coords]` records,
  * little-endian, coordinates divided by `unit_scale` (nm back to Å).
  * Same sharding contract as the other writers; every task's
  * `part-NNNNN.binpos` is itself a valid binpos file. */
class BinposWriteBuilder(path: String, unitScale: Double,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new BinposWrite(path, unitScale, info.schema(), doTruncate)
}

class BinposWrite(path: String, unitScale: Double, schema: StructType,
    truncate: Boolean) extends Write {
  override def toBatch: BatchWrite =
    new BinposBatchWrite(path, unitScale, schema, truncate)
}

class BinposBatchWrite(path: String, unitScale: Double,
    schema: StructType, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    if (truncate && FsIO.exists(path))
      FsIO.list(path).filter(_.name.endsWith(".binpos"))
        .foreach(e => FsIO.delete(e.path))
    FsIO.mkdirs(path)
    new BinposWriterFactory(path, unitScale, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class BinposWriterFactory(path: String, unitScale: Double,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new BinposDataWriter(path, unitScale, schema, partitionId)
}

private case class BinposCommit(partitionId: Int, frames: Long)
    extends WriterCommitMessage

class BinposDataWriter(path: String, unitScale: Double,
    schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val iFrame = idx("frame_id")
  private val iX = idx("x"); private val iY = idx("y")
  private val iZ = idx("z")
  require(iFrame >= 0 && iX >= 0 && iY >= 0 && iZ >= 0,
    s"binpos write needs columns frame_id, x, y, z; got " +
      schema.fieldNames.mkString(", "))

  private val file = FsIO.child(path, f"part-$partitionId%05d.binpos")
  private val out: OutputStream = FsIO.createStream(file)
  out.write(BinposTable.Magic)

  private var curFrame = Long.MinValue
  private val vals = scala.collection.mutable.ArrayBuffer.empty[Float]
  private var frames = 0L

  private def flushFrame(): Unit = {
    if (vals.isEmpty) return
    val bb = ByteBuffer.allocate(4 + 4 * vals.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(vals.length / 3)
    vals.foreach(bb.putFloat)
    out.write(bb.array())
    vals.clear()
    frames += 1
  }

  override def write(row: InternalRow): Unit = {
    val f = row.getLong(iFrame)
    if (f != curFrame) { flushFrame(); curFrame = f }
    vals += (row.getFloat(iX) / unitScale).toFloat
    vals += (row.getFloat(iY) / unitScale).toFloat
    vals += (row.getFloat(iZ) / unitScale).toFloat
  }

  override def commit(): WriterCommitMessage = {
    flushFrame()
    out.close()
    BinposCommit(partitionId, frames)
  }

  override def abort(): Unit = {
    out.close()
    FsIO.delete(file)
  }

  override def close(): Unit = ()
}
