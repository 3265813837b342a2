package graft.sources

import java.io.File

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of DCD shard files —
  * the binary member of the file-stream family (xyz/gro text shards,
  * dtr frameset collections): a simulation appending `*.dcd` shards
  * streams through the same header parse and positioned reads as the
  * batch scan.
  *
  * Offsets are file counts over the name-sorted listing (files
  * immutable once placed, ascending names — the log-structured
  * contract of every file stream here). Global frame ids continue
  * across shards and micro-batches; the cumulative base costs one
  * ~200-byte header parse per predecessor shard.
  *
  * Usage: `spark.readStream.format("dcd").load(dir)`.
  */
case class DcdFileOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}

class DcdMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType, mode: String) extends MicroBatchStream {

  private def listShards(): Array[File] = {
    val d = new File(dir)
    if (!d.isDirectory) Array.empty
    else d.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".dcd"))
      .sortBy(_.getName)
  }

  override def initialOffset(): Offset = DcdFileOffset(0)

  override def latestOffset(): Offset = DcdFileOffset(listShards().length)

  override def deserializeOffset(json: String): Offset =
    DcdFileOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DcdFileOffset].fileCount
    val e = end.asInstanceOf[DcdFileOffset].fileCount
    val shards = listShards()
    var base = (0 until math.min(s, shards.length))
      .map(i => DcdHeader.parse(shards(i).getPath).nFrames).sum
    (s until math.min(e, shards.length)).flatMap { i =>
      val parts = new DcdScan(Seq(shards(i).getPath), chunks, unitScale,
        schema, 0L, Long.MaxValue, -1, mode)
        .planInputPartitions()
        .map { p =>
          val r = p.asInstanceOf[DcdFrameRange]
          r.copy(frameOffset = base + r.frameOffset): InputPartition
        }
      base += DcdHeader.parse(shards(i).getPath).nFrames
      parts
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DcdReaderFactory(dir, unitScale, schema, mode)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
