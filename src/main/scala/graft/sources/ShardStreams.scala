package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}

/** Session-conf plumbing shared by the shard-directory streams
  * (public: the conf key is user-facing surface, and the bench/spec
  * reference it by name). */
object ShardStreams {
  val MaxShardsKey = "spark.graft.stream.maxShardsPerTrigger"

  /** Backlog admission knob (VERDICT r15 next #4): the number of new
    * shards (framesets for dtr) one micro-batch may admit; 0 =
    * unbounded (the r15 behavior). Without it, a restart against a
    * large backlog — the 100 TB shard directories will not arrive
    * empty — plans ONE batch over every outstanding shard: no
    * checkpoint progress until the whole backlog commits, and a
    * mid-drain failure re-reads all of it. Read from the session conf
    * at stream construction (the options map is not threaded through
    * the 14 format scans; a session-wide knob is how a deployment
    * would set it anyway), validated fail-fast. */
  def maxShardsPerTrigger(): Int = {
    val v = org.apache.spark.sql.SparkSession.active.conf
      .get(MaxShardsKey, "0")
    val n = try v.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$MaxShardsKey must be a non-negative integer, got '$v'")
    }
    require(n >= 0,
      s"$MaxShardsKey must be >= 0 (0 = unbounded), got $n")
    n
  }

  /** The admission arithmetic shared by both offset shapes. Honors
    * the ENGINE-passed limit only (ADVICE r16): the configured knob
    * already reaches the engine via `getDefaultReadLimit`, and the
    * engine deliberately overrides it — `Trigger.Once` passes
    * `ReadLimit.allAvailable()` to mean "one batch containing
    * everything". Capping that batch at the configured size would
    * make a Trigger.Once run terminate "successfully" with most of
    * the backlog silently unread. */
  def admit(start: Int, total: Int, limit: ReadLimit): Int =
    limit match {
      case mf: ReadMaxFiles => math.min(total, start + mf.maxFiles())
      case _ => total
    }
}

/** Shared skeleton for the micro-batch shard-directory streams
  * (SURVEY §2.8): offsets are file counts over the name-sorted listing
  * of a directory of immutable shard files; each micro-batch plans the
  * new shards with the format's own batch planner, re-based so global
  * frame ids continue across shards and micro-batches. Per-shard frame
  * counts are cached per path (files are immutable), so consumed
  * shards are never re-probed. Formats supply the extension filter,
  * the frame-count probe, and the per-shard partition planner. */
case class ShardFileOffset(fileCount: Int) extends Offset {
  override def json(): String = fileCount.toString
}

private[sources] abstract class ShardDirMicroBatchStream(
    dir: String, exts: Seq[String])
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Captured at construction (driver-side, active session present). */
  private val maxShards: Int = ShardStreams.maxShardsPerTrigger()

  override def getDefaultReadLimit: ReadLimit =
    if (maxShards > 0) ReadLimit.maxFiles(maxShards)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    ShardFileOffset(ShardStreams.admit(
      start.asInstanceOf[ShardFileOffset].fileCount,
      listShards().length, limit))

  override def reportLatestOffset(): Offset =
    ShardFileOffset(listShards().length)

  /** Frames in one shard (driver-side probe; cached). Only consulted
    * for PREDECESSOR shards whose count is not yet cached — i.e. after
    * an offset-recovery restart; freshly planned shards derive their
    * count from the partitions the scan just planned (one probe per
    * new shard, not two). */
  protected def probeFrames(path: String): Long

  /** Batch partitions for one shard whose frame 0 has global id
    * `base`. */
  protected def planShard(path: String, base: Long): Array[InputPartition]

  /** Shard-LOCAL end frame of one planned partition (streams plan the
    * full shard — no pushdown — so the max over partitions IS the
    * shard's frame count). */
  protected def partitionLocalEnd(p: InputPartition): Long

  private def listShards(): Seq[String] = {
    if (!FsIO.isDirectory(dir)) Nil
    else FsIO.list(dir)
      .filter(e => e.isFile && exts.exists(e.name.endsWith))
      .map(_.path)
  }

  private val frameCache =
    scala.collection.mutable.HashMap.empty[String, Long]
  private def frames(p: String): Long =
    frameCache.getOrElseUpdate(p, probeFrames(p))

  override def initialOffset(): Offset = ShardFileOffset(0)
  override def latestOffset(): Offset =
    ShardFileOffset(listShards().length)
  override def deserializeOffset(json: String): Offset =
    ShardFileOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardFileOffset].fileCount
    val e = end.asInstanceOf[ShardFileOffset].fileCount
    val shards = listShards()
    var base = (0 until math.min(s, shards.length))
      .map(i => frames(shards(i))).sum
    (s until math.min(e, shards.length)).flatMap { i =>
      val p = shards(i)
      val parts = planShard(p, base)
      val n = if (parts.isEmpty) 0L else parts.map(partitionLocalEnd).max
      frameCache.put(p, n)
      base += n
      parts
    }.toArray
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** pdb: delimited MODEL/ENDMDL frames — the probe is the batch scan's
  * per-file pass (line offsets of every MODEL record). */
class PdbMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: org.apache.spark.sql.types.StructType, mode: String)
    extends ShardDirMicroBatchStream(dir, Seq(".pdb", ".pdb.gz")) {

  private def scanFor(path: String) =
    new PdbScan(Seq(path), chunks, unitScale, schema, mode)

  override protected def probeFrames(path: String): Long =
    scanFor(path).planFrameCount(path)

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    scanFor(path).planInputPartitions().map { p =>
      val r = p.asInstanceOf[PdbFrameRange]
      r.copy(frameOffset = base + r.frameOffset): InputPartition
    }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[PdbFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new PdbReaderFactory(dir, unitScale, schema, mode)
}

/** lammpstrj: self-describing dump — probe reads the first-frame
  * header and line-counts. */
class LammpstrjMicroBatchStream(dir: String, chunks: Int,
    unitScale: Double, schema: org.apache.spark.sql.types.StructType,
    mode: String)
    extends ShardDirMicroBatchStream(dir,
      Seq(".lammpstrj", ".lammpstrj.gz")) {

  private def scanFor(path: String) =
    new LammpstrjScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, mode)

  override protected def probeFrames(path: String): Long =
    scanFor(path).planFrameCount(path)

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    scanFor(path).planInputPartitions().map { p =>
      val r = p.asInstanceOf[LammpstrjFrameRange]
      r.copy(frameOffset = base + r.frameOffset): InputPartition
    }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[LammpstrjFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new LammpstrjReaderFactory(dir, unitScale, schema, mode)
}

/** arc: Tinker archive — probe is the batch header+line-count pass. */
class ArcMicroBatchStream(dir: String, chunks: Int, unitScale: Double,
    schema: org.apache.spark.sql.types.StructType, mode: String)
    extends ShardDirMicroBatchStream(dir, Seq(".arc", ".arc.gz")) {

  private def scanFor(path: String) =
    new ArcScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1, mode)

  override protected def probeFrames(path: String): Long =
    scanFor(path).planFrameCount(path)

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    scanFor(path).planInputPartitions().map { p =>
      val r = p.asInstanceOf[ArcFrameRange]
      r.copy(frameOffset = base + r.frameOffset): InputPartition
    }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[ArcFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new ArcReaderFactory(unitScale, schema, mode)
}

/** mdcrd: AMBER fixed-width text — the natoms/box shape options ride
  * the stream exactly as they ride the batch scan. */
class MdcrdMicroBatchStream(dir: String, natoms: Int, box: Boolean,
    chunks: Int, unitScale: Double,
    schema: org.apache.spark.sql.types.StructType, mode: String)
    extends ShardDirMicroBatchStream(dir,
      Seq(".crd", ".mdcrd", ".crd.gz", ".mdcrd.gz")) {

  private def scanFor(path: String) =
    new MdcrdScan(Seq(path), natoms, box, chunks, unitScale, schema,
      0L, Long.MaxValue, -1, mode)

  override protected def probeFrames(path: String): Long =
    scanFor(path).planFrameCount(path)

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    scanFor(path).planInputPartitions().map { p =>
      val r = p.asInstanceOf[MdcrdFrameRange]
      r.copy(frameOffset = base + r.frameOffset): InputPartition
    }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[MdcrdFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new MdcrdReaderFactory(dir, natoms, box, unitScale, schema, mode)
}

/** binpos: fixed-stride binary — the probe is a header read + length
  * arithmetic. */
class BinposMicroBatchStream(dir: String, chunks: Int,
    unitScale: Double, schema: org.apache.spark.sql.types.StructType)
    extends ShardDirMicroBatchStream(dir, Seq(".binpos")) {

  override protected def probeFrames(path: String): Long =
    BinposTable.probe(path)._2

  override protected def planShard(path: String, base: Long)
      : Array[InputPartition] =
    new BinposScan(Seq(path), chunks, unitScale, schema, 0L,
      Long.MaxValue, -1)
      .planInputPartitions().map { p =>
        val r = p.asInstanceOf[BinposFrameRange]
        r.copy(frameOffset = base + r.frameOffset): InputPartition
      }

  override protected def partitionLocalEnd(p: InputPartition): Long =
    p.asInstanceOf[BinposFrameRange].endFrame

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new BinposReaderFactory(unitScale, schema)
}
