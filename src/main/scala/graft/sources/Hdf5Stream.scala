package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of HDF5 trajectory
  * shard files, on the shared [[ShardDirMicroBatchStream]] skeleton.
  * The per-shard probe is one metadata parse — frames come from the
  * `coordinates` (or `XYZList`) dataspace.
  *
  * Usage: `spark.readStream.format("hdf5").load(dir)`.
  */
class Hdf5MicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType)
    extends ShardDirMicroBatchStream(dir, Hdf5Table.Extensions) {

  override protected def probeFrames(path: String): Long =
    H5Profile.parse(path).frames

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    new Hdf5Scan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, -1)
      .planInputPartitions().map { p =>
        val r = p.asInstanceOf[Hdf5FrameRange]
        r.copy(frameOffset = base + r.frameOffset): InputPartition
      }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[Hdf5FrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new Hdf5ReaderFactory(unitScale, schema)
}
