package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over a directory of AMBER restart files —
  * the most literal member of the file-stream family: ONE FRAME PER
  * FILE means a running simulation dropping restart files IS a frame
  * stream, offsets are frame counts, and planning needs zero I/O (the
  * frame axis is the file listing, exactly as in the batch scan).
  *
  * Usage: `spark.readStream.format("inpcrd").load(dir)`.
  */
case class InpcrdFileOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}

class InpcrdMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: StructType, vel: String, expectAtoms: Int = -1)
    extends MicroBatchStream {

  private def listShards(): Seq[String] = {
    if (!FsIO.isDirectory(dir)) Nil
    else FsIO.list(dir)
      .filter(e => e.isFile &&
        InpcrdTable.Extensions.exists(e.name.endsWith))
      .map(_.path)
  }

  override def initialOffset(): Offset = InpcrdFileOffset(0)

  override def latestOffset(): Offset =
    InpcrdFileOffset(listShards().length)

  override def deserializeOffset(json: String): Offset =
    InpcrdFileOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[InpcrdFileOffset].fileCount
    val e = end.asInstanceOf[InpcrdFileOffset].fileCount
    val shards = listShards()
    val batch = (s until math.min(e, shards.length))
      .map(i => shards(i))
    batch.grouped(chunks).zipWithIndex.map { case (group, gi) =>
      // global frame id = position in the full listing (file i IS
      // frame i), continuing across micro-batches by construction
      InpcrdFileRange(group, s.toLong + gi.toLong * chunks)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new InpcrdReaderFactory(unitScale, vel, schema, expectAtoms)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
