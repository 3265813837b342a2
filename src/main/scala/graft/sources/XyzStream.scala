package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.Offset
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
  * Built on [[ShardDirMicroBatchStream]], so global frame ids continue
  * across shards AND micro-batches (the original stand-alone version
  * of this class planned each shard from local frame 0 — every shard's
  * frames collided at id 0; caught by the 1000-shard row-accounting
  * spec, StreamingFormatsSpec).
  *
  * Usage: `spark.readStream.format("xyz").load(dir)`.
  */
case class XyzFileOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}

class XyzMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType)
    extends ShardDirMicroBatchStream(dir, Seq(".xyz", ".xyz.gz")) {

  private def scanFor(path: String) =
    new XyzScan(Seq(path), chunks, unitScale, schema)

  override protected def probeFrames(path: String): Long = {
    val parts = scanFor(path).planInputPartitions()
    if (parts.isEmpty) 0L
    else parts.map(_.asInstanceOf[XyzFrameRange].endFrame).max
  }

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    scanFor(path).planInputPartitions().map { p =>
      val r = p.asInstanceOf[XyzFrameRange]
      XyzShardPartition(path,
        r.copy(frameOffset = base + r.frameOffset)): InputPartition
    }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[XyzShardPartition].range.endFrame

  override def createReaderFactory(): PartitionReaderFactory =
    new XyzShardReaderFactory(unitScale, schema)
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
