package graft.sources

import java.io.BufferedWriter

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 write path for the LAMMPS dump format — the inverse of the
  * scan, same sharding contract as the other trajectory writers: one
  * frame's rows consecutive within a partition, each task emits an
  * independent `part-NNNNN.lammpstrj` shard that is itself a valid
  * dump file. The writer emits orthogonal `BOX BOUNDS` from the
  * lengths columns (0..box_a etc.); tilted boxes would need the
  * inverse of the reader's bound-adjustment and are out of the write
  * path's scope (read-side triclinic support is full).
  *
  * Boxless frames: the dump spec's frame layout is a FIXED 9-line
  * header — `ITEM: BOX BOUNDS` cannot be omitted without breaking the
  * line arithmetic every LAMMPS consumer (including our reader) relies
  * on — so null box columns write the documented `0.0 0.0` placeholder
  * bounds (a zero-size box). A round-trip therefore reads a boxless
  * frame back as box_a=box_b=box_c=0, not null; callers that need the
  * distinction must keep it out of band.
  *
  * `unit_scale` is inverted on write like the mdcrd/arc/binpos
  * writers: coords and box lengths are divided by the scan's scale so
  * data loaded with unit_scale=0.1 (Å→nm) writes back in Å. */
class LammpstrjWriteBuilder(path: String, unitScale: Double,
    info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new LammpstrjWrite(path, unitScale, info.schema(), doTruncate)
}

class LammpstrjWrite(path: String, unitScale: Double, schema: StructType,
    truncate: Boolean) extends Write {
  override def toBatch: BatchWrite =
    new LammpstrjBatchWrite(path, unitScale, schema, truncate)
}

class LammpstrjBatchWrite(path: String, unitScale: Double,
    schema: StructType, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    // truncate must delete every extension the SCAN accepts (plain and
    // .gz) or stale shards survive an overwrite and merge into reads
    if (truncate && FsIO.exists(path))
      FsIO.list(path).filter { e =>
        val n = e.name
        n.endsWith(".lammpstrj") || n.endsWith(".lammpstrj.gz")
      }.foreach(e => FsIO.delete(e.path))
    FsIO.mkdirs(path)
    new LammpstrjWriterFactory(path, unitScale, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class LammpstrjWriterFactory(path: String, unitScale: Double,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new LammpstrjDataWriter(path, unitScale, schema, partitionId)
}

private case class LammpstrjCommit(partitionId: Int, frames: Long)
    extends WriterCommitMessage

class LammpstrjDataWriter(path: String, unitScale: Double,
    schema: StructType, partitionId: Int) extends DataWriter[InternalRow] {

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val iFrame = idx("frame_id")
  private val iTime = idx("time")
  private val iAtom = idx("atom_id")
  private val iElement = idx("element")
  private val iX = idx("x"); private val iY = idx("y")
  private val iZ = idx("z")
  private val iA = idx("box_a"); private val iB = idx("box_b")
  private val iC = idx("box_c")
  require(iFrame >= 0 && iAtom >= 0 && iX >= 0 && iY >= 0 && iZ >= 0,
    s"lammpstrj write needs columns frame_id, atom_id, x, y, z; got " +
      schema.fieldNames.mkString(", "))

  private val file = FsIO.child(path, f"part-$partitionId%05d.lammpstrj")
  private val out: BufferedWriter = FsIO.createWriter(file)
  private var curFrame = Long.MinValue
  private var curTime = 0.0
  private var curBox: Option[(Float, Float, Float)] = None
  private val atoms = new java.lang.StringBuilder()
  private var atomCount = 0
  private var frames = 0L

  private def flushFrame(): Unit = {
    if (atomCount == 0) return
    out.write("ITEM: TIMESTEP\n")
    // real dumps carry an integer step; keep a round-trippable token
    out.write(
      if (curTime == curTime.toLong.toDouble) curTime.toLong.toString
      else curTime.toString)
    out.write("\nITEM: NUMBER OF ATOMS\n")
    out.write(atomCount.toString)
    out.write("\nITEM: BOX BOUNDS pp pp pp\n")
    // null box -> documented 0.0-bounds placeholder (see class doc)
    val (ba, bb, bc) = curBox.getOrElse((0.0f, 0.0f, 0.0f))
    out.write(s"0.0 ${(ba / unitScale).toFloat}\n" +
      s"0.0 ${(bb / unitScale).toFloat}\n" +
      s"0.0 ${(bc / unitScale).toFloat}\n")
    out.write("ITEM: ATOMS id element x y z\n")
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
        if (iA >= 0 && !row.isNullAt(iA) && iB >= 0 && !row.isNullAt(iB)
          && iC >= 0 && !row.isNullAt(iC))
          Some((row.getFloat(iA), row.getFloat(iB), row.getFloat(iC)))
        else None
    }
    atoms.append(row.getInt(iAtom))
      .append(' ')
      .append(if (iElement >= 0 && !row.isNullAt(iElement))
        row.getUTF8String(iElement).toString else "X")
      .append(' ').append((row.getFloat(iX) / unitScale).toFloat)
      .append(' ').append((row.getFloat(iY) / unitScale).toFloat)
      .append(' ').append((row.getFloat(iZ) / unitScale).toFloat)
      .append('\n')
    atomCount += 1
  }

  override def commit(): WriterCommitMessage = {
    flushFrame()
    out.close()
    LammpstrjCommit(partitionId, frames)
  }

  override def abort(): Unit = {
    out.close()
    FsIO.delete(file)
  }

  override def close(): Unit = ()
}
