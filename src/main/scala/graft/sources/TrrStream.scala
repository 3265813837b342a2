package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of TRR shard files —
  * the variable-record binary member of the file-stream family, on the
  * shared [[ShardDirMicroBatchStream]] skeleton. TRR frames are
  * variable-size, so the per-shard probe is the driver-side
  * header-index walk the batch scan already does; the skeleton's cache
  * (plus the plan-derived counts for freshly planned shards) means no
  * shard is ever walked twice.
  *
  * Usage: `spark.readStream.format("trr").load(dir)`.
  */
class TrrMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType, mode: String)
    extends ShardDirMicroBatchStream(dir, Seq(".trr")) {

  override protected def probeFrames(path: String): Long =
    TrrFormat.indexCached(path, mode, Long.MaxValue).length.toLong

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    new TrrScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, mode)
      .planInputPartitions().map { p =>
        val r = p.asInstanceOf[TrrFrameRange]
        r.copy(frameOffset = base + r.frameOffset): InputPartition
      }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[TrrFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new TrrReaderFactory(unitScale, schema, mode)
}
