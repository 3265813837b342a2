package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of DCD shard files —
  * the binary member of the file-stream family, on the shared
  * [[ShardDirMicroBatchStream]] skeleton: file-count offsets, cached
  * per-shard frame counts (one ~200-byte header parse per shard,
  * once), global frame ids continuing across shards and micro-batches.
  *
  * Usage: `spark.readStream.format("dcd").load(dir)`.
  */
class DcdMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType, mode: String)
    extends ShardDirMicroBatchStream(dir, Seq(".dcd")) {

  override protected def probeFrames(path: String): Long =
    DcdHeader.parse(path).nFrames

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    new DcdScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, mode)
      .planInputPartitions().map { p =>
        val r = p.asInstanceOf[DcdFrameRange]
        r.copy(frameOffset = base + r.frameOffset): InputPartition
      }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[DcdFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new DcdReaderFactory(dir, unitScale, schema, mode)
}
