package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of AMBER NetCDF shard
  * files (trajectory chunks or `.ncrst` checkpoints), on the shared
  * [[ShardDirMicroBatchStream]] skeleton. The per-shard probe is one
  * header read — frames come straight from `numrecs` (or 1 for a
  * restart), the cheapest probe in the file-stream family.
  *
  * Usage: `spark.readStream.format("netcdf").load(dir)`.
  */
class NetcdfMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType)
    extends ShardDirMicroBatchStream(dir, NetcdfTable.Extensions) {

  override protected def probeFrames(path: String): Long = {
    val raf = FsIO.openRandom(path)
    try AmberProfile.of(NetcdfFormat.readHeader(raf, path), path).frames
    finally raf.close()
  }

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    new NetcdfScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, -1)
      .planInputPartitions().map { p =>
        val r = p.asInstanceOf[NetcdfFrameRange]
        r.copy(frameOffset = base + r.frameOffset): InputPartition
      }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[NetcdfFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new NetcdfReaderFactory(unitScale, schema)
}
