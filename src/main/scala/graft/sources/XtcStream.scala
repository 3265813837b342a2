package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of XTC shard files —
  * the compressed-binary member of the file-stream family, on the
  * shared [[ShardDirMicroBatchStream]] skeleton. Frames are
  * variable-size (per-frame compressed payloads), so the per-shard
  * probe is the same driver-side index walk the batch scan does.
  *
  * Usage: `spark.readStream.format("xtc").load(dir)`.
  */
class XtcMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType, mode: String)
    extends ShardDirMicroBatchStream(dir, Seq(".xtc")) {

  override protected def probeFrames(path: String): Long =
    XtcFormat.indexCached(path, mode, Long.MaxValue).length.toLong

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    new XtcScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, mode)
      .planInputPartitions().map { p =>
        val r = p.asInstanceOf[XtcFrameRange]
        r.copy(frameOffset = base + r.frameOffset): InputPartition
      }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[XtcFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new XtcReaderFactory(unitScale, schema, mode)
}
