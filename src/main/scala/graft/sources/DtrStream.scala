package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a COLLECTION directory of dtr
  * framesets — the streaming twin of the batch scan, and the natural
  * consumer of both the DSv2 write path's `part-NNNNN.dtr` shards and
  * a running simulation publishing framesets (Desmond's own production
  * shape: finished framesets appear one by one).
  *
  * Offsets are counts of COMPLETED framesets in name order. A
  * frameset is complete exactly when its `timekeys` file exists: the
  * write path publishes by atomic rename (timekeys is written before
  * the rename), and a foreign producer following the layout writes
  * the index last — so a half-written frameset is simply not listed
  * yet. Frame ids continue globally across framesets and across
  * micro-batches (the cumulative prior frame count comes from one
  * 16-byte header read per predecessor — no index bodies re-read).
  * As with the other file streams, names must arrive in ascending
  * sort order (true for zero-padded part names).
  *
  * Usage: `spark.readStream.format("dtr").load(collectionDir)`.
  */
case class DtrSetOffset(setCount: Int) extends Offset {
  override def json(): String = setCount.toString
}

class DtrMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Frameset-granularity admission (see [[ShardStreams]] — the same
    * backlog knob, counting completed framesets instead of files). */
  private val maxSets: Int = ShardStreams.maxShardsPerTrigger()

  override def getDefaultReadLimit: ReadLimit =
    if (maxSets > 0) ReadLimit.maxFiles(maxSets)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    DtrSetOffset(ShardStreams.admit(
      start.asInstanceOf[DtrSetOffset].setCount,
      listSets().length, limit))

  override def reportLatestOffset(): Offset =
    DtrSetOffset(listSets().length)

  private def listSets(): Seq[String] = {
    if (!FsIO.isDirectory(dir)) Nil
    else FsIO.list(dir)
      .filter(e => !e.isFile && e.name.endsWith(".dtr") &&
        FsIO.isFile(FsIO.child(e.path, "timekeys")))
      .map(_.path)
  }

  /** Frame count from the timekeys HEADER only (16 bytes). */
  private def frameCount(set: String): Long = {
    val raf = FsIO.openRandom(FsIO.child(set, "timekeys"))
    try {
      val head = new Array[Byte](16)
      raf.readFully(head)
      ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getLong(8)
    } finally raf.close()
  }

  override def initialOffset(): Offset = DtrSetOffset(0)

  override def latestOffset(): Offset = DtrSetOffset(listSets().length)

  override def deserializeOffset(json: String): Offset =
    DtrSetOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DtrSetOffset].setCount
    val e = end.asInstanceOf[DtrSetOffset].setCount
    val sets = listSets()
    // global frame base for the batch's first set = frames in all
    // prior sets (header reads only)
    var base = (0 until math.min(s, sets.length))
      .map(i => frameCount(sets(i))).sum
    (s until math.min(e, sets.length)).flatMap { i =>
      val parts = new DtrScan(Seq(sets(i)), chunks, unitScale,
        schema, 0L, Long.MaxValue, -1)
        .planInputPartitions()
        .map { p =>
          val r = p.asInstanceOf[DtrFrameRange]
          r.copy(frameOffset = base + r.frameOffset): InputPartition
        }
      base += frameCount(sets(i))
      parts
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DtrReaderFactory(unitScale, schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
