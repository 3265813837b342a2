package graft.sources

import java.io.OutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 write path for the Desmond frame-set format (S6 per-format
  * parity; reader in [[DtrDataSource]], payload profile documented
  * there). Each task writes an INDEPENDENT `part-NNNNN.dtr` frameset
  * directory — a complete, valid frameset on its own — and the driver
  * commit writes an `all.stk` list naming the non-empty shards in
  * partition order, so the sharded output reads straight back as ONE
  * trajectory (`spark.read.format("dtr").load(outDir)`). That commit
  * protocol is append-only file placement plus one tiny text file: no
  * cross-task coordination, which is what lets a 1000-task write scale.
  *
  * Contract (as the other trajectory writers): rows carry the
  * canonical DtrTable schema; one frame's rows are consecutive within
  * a partition and frames do not straddle partitions
  * (`repartitionByRange(frame_id)` + `sortWithinPartitions(frame_id,
  * atom_id)`). Frames stream to the fixed-size payload files as they
  * complete — writer memory is O(natoms + frames-per-task × 8 B time
  * stamps), never the whole partition. Coordinates divide by
  * `unit_scale` on the way out (nm → file units), inverting the scan.
  */
class DtrWriteBuilder(path: String, unitScale: Double,
    info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new DtrWrite2(path, unitScale, info.schema(), doTruncate)
}

class DtrWrite2(path: String, unitScale: Double, schema: StructType,
    truncate: Boolean) extends Write {
  override def toBatch: BatchWrite =
    new DtrBatchWrite(path, unitScale, schema, truncate)
}

class DtrBatchWrite(path: String, unitScale: Double, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    if (truncate && FsIO.exists(path)) {
      FsIO.list(path).foreach { e =>
        if (!e.isFile && e.name.endsWith(".dtr")) FsIO.delete(e.path,
          recursive = true)
        else if (e.name == "all.stk") FsIO.delete(e.path)
      }
    }
    // append is NOT supported: a second write would reuse part-NNNNN
    // shard names (overwriting committed framesets) and commit() would
    // rewrite all.stk with only the new shards, silently dropping the
    // prior data from reads. Failing beats silent loss.
    if (!truncate && FsIO.exists(path) &&
      (FsIO.isFile(FsIO.child(path, "all.stk")) ||
        FsIO.list(path).exists(e =>
          !e.isFile && e.name.endsWith(".dtr"))))
      throw new IllegalArgumentException(
        s"dtr write: $path already contains a frameset collection and " +
          "append mode is not supported (shard names and all.stk would " +
          "silently overwrite it) — use mode(\"overwrite\")")
    FsIO.mkdirs(path)
    new DtrWriterFactory(path, unitScale, schema)
  }

  /** Driver-side: one stk line per non-empty shard, partition order —
    * the same global frame order the readers assign. An empty write
    * commits a header-only stk, which reads back as 0 rows. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val names = messages.collect {
      case DtrCommit(pid, name, frames) if frames > 0 => (pid, name)
    }.sortBy(_._1).map(_._2)
    FsIO.writeString(FsIO.child(path, "all.stk"),
      ("# graft dtr frameset list" +: names).mkString("", "\n", "\n"))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class DtrWriterFactory(path: String, unitScale: Double,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new DtrDataWriter(path, unitScale, schema, partitionId, taskId)
}

private case class DtrCommit(partitionId: Int, name: String,
    frames: Long) extends WriterCommitMessage

class DtrDataWriter(path: String, unitScale: Double, schema: StructType,
    partitionId: Int, taskId: Long, framesPerFile: Int = 256)
    extends DataWriter[InternalRow] {

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val iFrame = idx("frame_id")
  private val iTime = idx("time")
  private val iX = idx("x"); private val iY = idx("y")
  private val iZ = idx("z")
  private val iBa = idx("box_a"); private val iBb = idx("box_b")
  private val iBc = idx("box_c"); private val iBal = idx("box_alpha")
  private val iBbe = idx("box_beta"); private val iBga = idx("box_gamma")
  require(iFrame >= 0 && iX >= 0 && iY >= 0 && iZ >= 0,
    s"dtr write needs columns frame_id, x, y, z; got " +
      schema.fieldNames.mkString(", "))

  private val setName = f"part-$partitionId%05d.dtr"
  // task-attempt isolation: stream into an attempt-private directory,
  // atomically rename to the final shard name at task commit. Without
  // this, a speculative or zombie attempt of the same partition would
  // interleave writes into one directory and its abort() would delete
  // the committed attempt's files.
  private val setDir = FsIO.child(path, s"$setName.attempt-$taskId")

  // one frame's buffers; flushed to the payload stream when frame_id
  // advances (contract: frame rows are consecutive)
  private var curFrame = Long.MinValue
  private var curTime = 0.0
  private var curBox: Option[(Double, Double, Double, Double, Double,
    Double)] = None
  private val xs = scala.collection.mutable.ArrayBuffer.empty[Float]
  private val ys = scala.collection.mutable.ArrayBuffer.empty[Float]
  private val zs = scala.collection.mutable.ArrayBuffer.empty[Float]

  private val times = scala.collection.mutable.ArrayBuffer.empty[Double]
  private var nAtoms = -1
  private var hasBox = false
  private var out: OutputStream = _
  private var framesInFile = 0

  private def openNextFile(): Unit = {
    if (out != null) out.close()
    val fileIdx = times.length.toLong / framesPerFile
    out = FsIO.createStream(
      FsIO.child(setDir, DtrFormat.frameFileName(fileIdx)))
    framesInFile = 0
  }

  private def flushFrame(): Unit = {
    if (xs.isEmpty) return
    if (nAtoms < 0) {
      // first frame fixes the frameset shape
      nAtoms = xs.length
      hasBox = curBox.isDefined
      FsIO.mkdirs(setDir)
      openNextFile()
    }
    require(xs.length == nAtoms,
      s"dtr write: frame $curFrame has ${xs.length} atoms, frameset " +
        s"$setName fixed $nAtoms (ragged frames cannot be fixed-layout)")
    require(curBox.isDefined == hasBox,
      s"dtr write: frame $curFrame box presence differs from the " +
        "frameset's first frame (the record layout is fixed per set)")
    if (framesInFile == framesPerFile) openNextFile()
    val bb = ByteBuffer.allocate(
      DtrFormat.frameBytes(DtrFormat.Meta(nAtoms, hasBox)).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    curBox.foreach { case (a, b, c, al, be, ga) =>
      bb.putDouble(a / unitScale).putDouble(b / unitScale)
        .putDouble(c / unitScale)
        .putDouble(al).putDouble(be).putDouble(ga)
    }
    var i = 0
    while (i < nAtoms) {
      bb.putFloat((xs(i) / unitScale).toFloat)
        .putFloat((ys(i) / unitScale).toFloat)
        .putFloat((zs(i) / unitScale).toFloat)
      i += 1
    }
    out.write(bb.array())
    framesInFile += 1
    times += curTime
    xs.clear(); ys.clear(); zs.clear()
  }

  override def write(row: InternalRow): Unit = {
    val f = row.getLong(iFrame)
    if (f != curFrame) {
      flushFrame()
      curFrame = f
      curTime = if (iTime >= 0 && !row.isNullAt(iTime))
        row.getDouble(iTime) else f.toDouble
      curBox =
        if (iBa >= 0 && !row.isNullAt(iBa) && iBb >= 0 &&
          !row.isNullAt(iBb) && iBc >= 0 && !row.isNullAt(iBc))
          Some((row.getFloat(iBa).toDouble, row.getFloat(iBb).toDouble,
            row.getFloat(iBc).toDouble,
            if (iBal >= 0 && !row.isNullAt(iBal))
              row.getFloat(iBal).toDouble else 90.0,
            if (iBbe >= 0 && !row.isNullAt(iBbe))
              row.getFloat(iBbe).toDouble else 90.0,
            if (iBga >= 0 && !row.isNullAt(iBga))
              row.getFloat(iBga).toDouble else 90.0))
        else None
    }
    xs += row.getFloat(iX); ys += row.getFloat(iY); zs += row.getFloat(iZ)
  }

  override def commit(): WriterCommitMessage = {
    flushFrame()
    if (out != null) out.close()
    if (times.nonEmpty) {
      val meta = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      meta.putInt(DtrFormat.MetaMagic).putInt(1).putInt(nAtoms)
        .putInt(if (hasBox) 1 else 0)
      FsIO.writeBytes(FsIO.child(setDir, "metadata"), meta.array())
      val keys = ByteBuffer.allocate(16 + 8 * times.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      keys.putInt(DtrFormat.KeysMagic).putInt(framesPerFile)
        .putLong(times.length.toLong)
      times.foreach(keys.putDouble)
      FsIO.writeBytes(FsIO.child(setDir, "timekeys"), keys.array())
      // publish: attempt dir → final shard name. Spark's commit
      // coordinator admits ONE attempt per partition to commit(), so
      // the target never exists (append into existing output is
      // rejected at build time). Atomic on HDFS/local; copy+delete on
      // object stores (the standard committer tradeoff).
      FsIO.rename(setDir, FsIO.child(path, setName))
    }
    DtrCommit(partitionId, setName, times.length.toLong)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (FsIO.isDirectory(setDir)) FsIO.delete(setDir, recursive = true)
  }

  override def close(): Unit = ()
}
