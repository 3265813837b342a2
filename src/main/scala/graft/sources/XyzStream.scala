package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a DIRECTORY of xyz shard files — the
  * streaming twin of the batch scan, and the natural consumer of the
  * xyz WRITE path's `part-NNNNN.xyz` shards: a trajectory that is still
  * being produced (e.g. a running simulation appending shard files)
  * streams through the same schema and parser as the batch source.
  *
  * Offsets are file counts over the lexicographically-sorted listing:
  * files are immutable once placed (the write path creates them
  * atomically per task), so `(start, end]` identifies an exact shard
  * range. This requires shard names to arrive in ascending name order
  * (true for the write path's zero-padded `part-NNNNN.xyz`); a producer
  * inserting a name that sorts before already-consumed files would
  * shift the mapping — use monotonic names, like every log-structured
  * file stream. Each micro-batch plans the same chunked frame-range
  * partitions the batch scan plans per file (core/dask_traj.py:87-100
  * analog), so one new shard fans out across tasks, not one task.
  *
  * Usage:
  *   spark.readStream.format("xyz").option("streamDir", dir).load()
  */
case class XyzFileOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}

class XyzMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType) extends MicroBatchStream {

  private def listShards(): Seq[String] = {
    if (!FsIO.isDirectory(dir)) Nil
    else FsIO.list(dir)
      .filter(e => e.isFile &&
        (e.name.endsWith(".xyz") || e.name.endsWith(".xyz.gz")))
      .map(_.path)
  }

  override def initialOffset(): Offset = XyzFileOffset(0)

  override def latestOffset(): Offset = XyzFileOffset(listShards().length)

  override def deserializeOffset(json: String): Offset =
    XyzFileOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[XyzFileOffset].fileCount
    val e = end.asInstanceOf[XyzFileOffset].fileCount
    val shards = listShards()
    (s until math.min(e, shards.length)).flatMap { i =>
      val path = shards(i)
      // per-file frame probe + chunked ranges, same as the batch scan
      new XyzScan(Seq(path), chunks, unitScale, schema)
        .planInputPartitions()
        .map(p => XyzShardPartition(path,
          p.asInstanceOf[XyzFrameRange]): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XyzShardReaderFactory(unitScale, schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class XyzShardPartition(path: String, range: XyzFrameRange)
    extends InputPartition

class XyzShardReaderFactory(unitScale: Double, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XyzShardPartition]
    new XyzPartitionReader(p.path, unitScale, schema, p.range)
  }
}
