package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a DIRECTORY of gro shard files —
  * gro's twin of [[XyzMicroBatchStream]] (see that class for the
  * offset/immutability contract: offsets are file counts over the
  * lexicographically-sorted listing; shards must arrive in ascending
  * name order, as the write path's zero-padded `part-NNNNN.gro` names
  * do). Each micro-batch plans the same chunked frame-range partitions
  * the batch scan plans per file.
  *
  * Usage: `spark.readStream.format("gro").load(dir)`.
  */
class GroMicroBatchStream(dir: String, chunks: Int, schema: StructType)
    extends MicroBatchStream {

  private def listShards(): Seq[String] = {
    if (!FsIO.isDirectory(dir)) Nil
    else FsIO.list(dir)
      .filter(e => e.isFile &&
        (e.name.endsWith(".gro") || e.name.endsWith(".gro.gz")))
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
      new GroScan(Seq(path), chunks, schema)
        .planInputPartitions()
        .map(p => GroShardPartition(path,
          p.asInstanceOf[GroFrameRange]): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GroShardReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
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
