package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a DIRECTORY of gro shard files —
  * gro's twin of [[XyzMicroBatchStream]] (see that class for the
  * offset/immutability contract: offsets are file counts over the
  * lexicographically-sorted listing; shards must arrive in ascending
  * name order, as the write path's zero-padded `part-NNNNN.gro` names
  * do). Each micro-batch plans the same chunked frame-range partitions
  * the batch scan plans per file, re-based so global frame ids
  * continue across shards and micro-batches
  * ([[ShardDirMicroBatchStream]]).
  *
  * Usage: `spark.readStream.format("gro").load(dir)`.
  */
class GroMicroBatchStream(dir: String, chunks: Int, schema: StructType)
    extends ShardDirMicroBatchStream(dir, Seq(".gro", ".gro.gz")) {

  private def scanFor(path: String) =
    new GroScan(Seq(path), chunks, schema)

  override protected def probeFrames(path: String): Long = {
    val parts = scanFor(path).planInputPartitions()
    if (parts.isEmpty) 0L
    else parts.map(_.asInstanceOf[GroFrameRange].endFrame).max
  }

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    scanFor(path).planInputPartitions().map { p =>
      val r = p.asInstanceOf[GroFrameRange]
      GroShardPartition(path,
        r.copy(frameOffset = base + r.frameOffset)): InputPartition
    }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[GroShardPartition].range.endFrame

  override def createReaderFactory(): PartitionReaderFactory =
    new GroShardReaderFactory(schema)
}

case class GroShardPartition(path: String, range: GroFrameRange)
    extends InputPartition

class GroShardReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GroShardPartition]
    new GroPartitionReader(p.path, schema, p.range)
  }
}
