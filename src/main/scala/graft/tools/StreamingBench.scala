package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming throughput + state-bound evidence (VERDICT r13 ask #5):
  * the 1000-shard row-accounting spec proves IDENTITY; this main
  * produces the committed BENCH artifact so streaming has bench
  * numbers like batch. Three measurements, one JSON line:
  *
  *  1. xyz 1000-shard drain — a fresh directory of 1000 text shards
  *     (50 atoms each) streamed to a noop-equivalent foreachBatch
  *     count; reports rows, wall seconds, rows/s, and the EXACT
  *     row-accounting fields (progress rows == expected rows) that
  *     make the artifact self-checking rather than timing-trusting.
  *  2. dtr 1000-frameset drain — same protocol over the binary
  *     Desmond frameset layout (DtrWrite, 2 frames × 50 atoms per
  *     frameset).
  *  3. interval-join state bound — the EventStreamsSpec scenario as
  *     numbers: peak buffered rows, then the post-watermark retained
  *     rows (the non-flaky bound: retained ≤ 6 of 38 added — state is
  *     evicted, not accumulated).
  *
  * Timing is informational (co-tenant noise exists); the PINNED
  * claims are the integer fields. Usage:
  * `runMain graft.tools.StreamingBench [outJson]`.
  */
object StreamingBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.schemaInference", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- 1. xyz 1000-shard drain ------------------------------------
    val xyzDir = Files.createTempDirectory("xyz1k_bench").toString
    val shards = 1000
    val atoms = 50
    val xyzBody = (0 until atoms)
      .map(a => s"C $a.0 1.0 2.0").mkString("\n")
    (0 until shards).foreach { i =>
      Files.writeString(Paths.get(xyzDir, f"part-$i%05d.xyz"),
        s"$atoms\n# Step: $i\n$xyzBody\n")
    }
    val (xyzRows, xyzProgressRows, xyzSec) = drain(
      spark.readStream.format("xyz").load(xyzDir), "xyz1k")
    val xyzExpected = shards.toLong * atoms

    // ---- 1b. the same backlog under admission control (VERDICT r15
    // #4): maxShardsPerTrigger=100 must drain the identical corpus in
    // >= 10 bounded batches with the same exact row accounting — the
    // restart-against-a-backlog shape a 100 TB shard directory has
    val sAdm = spark.newSession()
    sAdm.conf.set(graft.sources.ShardStreams.MaxShardsKey, "100")
    sAdm.conf.set("spark.sql.streaming.numRecentProgressUpdates", "200")
    val (admRows, admBatches, admMaxBatchRows, admSec) = drainBatches(
      sAdm.readStream.format("xyz").load(xyzDir), "xyz1kAdm")

    // ---- 2. dtr 1000-frameset drain ---------------------------------
    val dtrDir = Files.createTempDirectory("dtr1k_bench").toString
    val framesPerSet = 2
    (0 until shards).foreach { i =>
      val frames = (0 until framesPerSet).map { fr =>
        val xs = Array.tabulate(atoms)(a => (i * 10 + fr + a).toFloat)
        graft.sources.DtrWrite.Frame(xs, xs.map(_ + 0.25f),
          xs.map(_ + 0.5f), Some((20.0, 30.0, 40.0, 90.0, 90.0, 90.0)),
          time = fr * 0.004)
      }
      graft.sources.DtrWrite.write(f"$dtrDir/part-$i%05d.dtr", frames)
    }
    val (dtrRows, dtrProgressRows, dtrSec) = drain(
      spark.readStream.format("dtr").load(dtrDir), "dtr1k")
    val dtrExpected = shards.toLong * framesPerSet * atoms

    // ---- 3. interval-join state bound -------------------------------
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import spark.implicits._
    def ts(hour: Double) =
      new java.sql.Timestamp((1700000000L + (hour * 3600).toLong) * 1000L)
    val pm = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val vm = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def df(ms: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      ms.toDF().toDF("event_id", "user_id", "ts")
    val q = graft.streaming.EventStreams
      .attributionJoin(df(pm), df(vm), streaming = true)
      .writeStream.format("memory").queryName("attr_bench")
      .outputMode("append").start()
    var statePeak = -1L
    var stateLate = -1L
    try {
      def stateRows: Long =
        q.recentProgress.reverse.collectFirst {
          case p if p.stateOperators.nonEmpty =>
            p.stateOperators(0).numRowsTotal
        }.getOrElse(-1L)
      vm.addData((1 to 30).map(i => (100L + i, i.toLong % 5, ts(0.25))): _*)
      pm.addData((1 to 5).map(i => (200L + i, i.toLong, ts(0.5))): _*)
      q.processAllAvailable()
      statePeak = stateRows
      pm.addData((301L, 1L, ts(20.0))); vm.addData((302L, 1L, ts(20.0)))
      q.processAllAvailable()
      vm.addData((303L, 2L, ts(21.0)))
      q.processAllAvailable()
      stateLate = stateRows
    } finally q.stop()

    def f2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    def f0(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.0f", Double.box(x))
    val ok = xyzRows == xyzExpected && xyzProgressRows == xyzExpected &&
      dtrRows == dtrExpected && dtrProgressRows == dtrExpected &&
      admRows == xyzExpected && admBatches >= 10 &&
      admMaxBatchRows <= 100L * atoms &&
      statePeak >= 35 && stateLate >= 0 && stateLate <= 6
    val line =
      s"""{"metric":"streaming","ok":$ok,""" +
        s""""xyz_shards":$shards,"xyz_rows":$xyzRows,""" +
        s""""xyz_rows_expected":$xyzExpected,""" +
        s""""xyz_progress_rows":$xyzProgressRows,""" +
        s""""xyz_sec":${f2(xyzSec)},"xyz_rows_per_sec":${f0(xyzRows / xyzSec)},""" +
        s""""adm_max_shards_per_trigger":100,"adm_rows":$admRows,""" +
        s""""adm_batches":$admBatches,"adm_max_batch_rows":$admMaxBatchRows,""" +
        s""""adm_sec":${f2(admSec)},""" +
        s""""dtr_framesets":$shards,"dtr_rows":$dtrRows,""" +
        s""""dtr_rows_expected":$dtrExpected,""" +
        s""""dtr_progress_rows":$dtrProgressRows,""" +
        s""""dtr_sec":${f2(dtrSec)},"dtr_rows_per_sec":${f0(dtrRows / dtrSec)},""" +
        s""""attr_state_peak":$statePeak,"attr_state_after_watermark":$stateLate,""" +
        s""""state_bound_rule":"peak >= 35 buffered, <= 6 retained after watermark advance"}"""
    args.headOption.foreach(p =>
      java.nio.file.Files.writeString(Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
    if (!ok) sys.exit(1)
  }

  /** [[drain]] plus per-batch accounting for the admission-control
    * line: (sink rows, non-empty batches, max batch rows, seconds). */
  private def drainBatches(stream: DataFrame, name: String)
      : (Long, Long, Long, Double) = {
    val counter = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        counter.addAndGet(b.count()); ()
      }
      .queryName(name).start()
    try {
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      (counter.get(), batches.length.toLong,
        if (batches.isEmpty) 0L else batches.map(_.numInputRows).max,
        sec)
    } finally q.stop()
  }

  /** Drain a bounded shard-directory stream through a counting
    * foreachBatch sink; returns (sink rows, progress rows, seconds). */
  private def drain(stream: DataFrame, name: String): (Long, Long, Double) = {
    val counter = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        counter.addAndGet(b.count()); ()
      }
      .queryName(name).start()
    try {
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val progressRows = q.recentProgress.map(_.numInputRows).sum
      (counter.get(), progressRows, sec)
    } finally q.stop()
  }
}
