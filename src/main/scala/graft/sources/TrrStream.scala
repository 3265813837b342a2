package graft.sources

import java.io.File

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of TRR shard files —
  * the variable-record binary member of the file-stream family.
  * Offsets are file counts over the name-sorted listing (immutable
  * files, ascending names). TRR frames are variable-size, so each
  * shard's frame count comes from the driver-side header-index walk
  * the batch scan already does; counts are CACHED per path (files are
  * immutable), so the cumulative frame base for a new micro-batch
  * costs no re-walk of already-consumed shards.
  *
  * Usage: `spark.readStream.format("trr").load(dir)`.
  */
case class TrrFileOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}

class TrrMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType, mode: String) extends MicroBatchStream {

  private def listShards(): Array[File] = {
    val d = new File(dir)
    if (!d.isDirectory) Array.empty
    else d.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".trr"))
      .sortBy(_.getName)
  }

  // immutable files → the index walk result is stable per path
  private val frameCountCache =
    scala.collection.mutable.HashMap.empty[String, Long]

  private def frameCount(path: String): Long =
    frameCountCache.getOrElseUpdate(path,
      TrrFormat.index(path, mode, Long.MaxValue).length.toLong)

  override def initialOffset(): Offset = TrrFileOffset(0)

  override def latestOffset(): Offset = TrrFileOffset(listShards().length)

  override def deserializeOffset(json: String): Offset =
    TrrFileOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TrrFileOffset].fileCount
    val e = end.asInstanceOf[TrrFileOffset].fileCount
    val shards = listShards()
    var base = (0 until math.min(s, shards.length))
      .map(i => frameCount(shards(i).getPath)).sum
    (s until math.min(e, shards.length)).flatMap { i =>
      val parts = new TrrScan(Seq(shards(i).getPath), chunks, unitScale,
        schema, 0L, Long.MaxValue, -1, mode)
        .planInputPartitions()
        .map { p =>
          val r = p.asInstanceOf[TrrFrameRange]
          r.copy(frameOffset = base + r.frameOffset): InputPartition
        }
      base += frameCount(shards(i).getPath)
      parts
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TrrReaderFactory(unitScale, schema, mode)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
