package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming plan produces the same rows as the batch plan when fed
  * the same parquet as a bounded stream (memory sink, complete mode). */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Stage events.parquet into a fresh directory (the file source
    * requires one) and open it as a stream with `ts` normalized to a
    * real timestamp the SAME way the batch loader (`rel.Tables.events`)
    * does: the driver's generator has shipped `ts` both as
    * TIMESTAMP(NANOS) (arriving as LONG nanos under the session's
    * nanosAsLong flag) and as TIMESTAMP(MICROS)/NTZ across rounds —
    * hard-coding either shape breaks on the other, so the stream
    * schema is taken from a batch read of the staged file under the
    * live session flags and normalized exactly like the batch side. */
  private def stagedEventsStream(prefix: String)
      : org.apache.spark.sql.DataFrame = {
    val src = java.nio.file.Paths.get(s"${SparkTestBase.sf}/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.copy(src, tmp.resolve("events.parquet"))
    val schema = spark.read.parquet(tmp.toString).schema
    rel.Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(tmp.toString))
  }

  test("streaming tumbling counts == batch tumbling counts") {
    val stream = stagedEventsStream("events_stream")
    val q = EventStreams.tumblingCounts(stream, streaming = true)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .orderBy("hour_epoch", "event_type")
        .collect().map(_.toString).toSeq
      val want = rel.RelQueries.eventsTumbling(spark, SparkTestBase.sf)
        .collect().map(_.toString).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming sliding counts == batch sliding counts") {
    val stream = stagedEventsStream("events_stream2")
    val q = EventStreams.slidingCounts(stream, streaming = true)
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sliding_out")
        .orderBy("win_epoch", "event_type")
        .collect().map(_.toString).toSeq
      val want = rel.RelQueries.eventsSliding(spark, SparkTestBase.sf)
        .collect().map(_.toString).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming windowed top-k == batch windowed top-k (bounded " +
    "O(k) heap state per window+key)") {
    val stream = stagedEventsStream("events_topk")
    val q = EventStreams.windowTopK(stream, streaming = true)
      .writeStream.format("memory").queryName("topk_stream_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("topk_stream_out")
        .orderBy("hour_epoch", "event_type", "rn")
        .collect().map(_.toString).toSeq
      val want = rel.RelQueries.eventsWindowTopk(spark, SparkTestBase.sf)
        .collect().map(_.toString).toSeq
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events within the watermark") {
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)](spark)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    ms.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(0))) // in-batch replay
    val df = ms.toDS().toDF("event_id", "ts")
    val q = EventStreams.dedupEvents(df, streaming = true)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
      ms.addData((2L, ts(1)), (3L, ts(2))) // cross-batch replay
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join == batch attribution join") {
    def side(tpe: String) = stagedEventsStream("events_stream3")
      .filter(col("event_type") === tpe)
    val q = EventStreams.attributionJoin(
      side("purchase"), side("view"), streaming = true)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .orderBy("purchase_id", "view_id")
        .collect().map(_.toString).toSeq
      val want = rel.RelQueries.eventsAttribution(spark, SparkTestBase.sf)
        .collect().map(_.toString).toSeq
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("interval-join state is BOUNDED: watermark advance evicts " +
    "expired rows from the state store (VERDICT r12 #8 — state-store " +
    "row counts pinned, never wall time)") {
    import spark.implicits._
    def ts(hour: Double) =
      new java.sql.Timestamp((1700000000L + (hour * 3600).toLong) * 1000L)
    case class Row3(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
    val pm = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val vm = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    def df(ms: org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      ms.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.attributionJoin(df(pm), df(vm),
      streaming = true)
      .writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        q.recentProgress.reverse.collectFirst {
          case p if p.stateOperators.nonEmpty =>
            p.stateOperators(0).numRowsTotal
        }.getOrElse(-1L)
      // batch 1: 30 views + 5 purchases in hour 0-1 — all buffered
      // (watermark still before the epoch, nothing evictable)
      vm.addData((1 to 30).map(i => (100L + i, i.toLong % 5, ts(0.25))): _*)
      pm.addData((1 to 5).map(i => (200L + i, i.toLong, ts(0.5))): _*)
      q.processAllAvailable()
      val early = stateRows
      assert(early >= 35, s"expected all 35 rows buffered, state=$early")
      // batch 2 advances event time to hour 20 → watermark (2 h delay)
      // lands at hour 18, far past batch 1 + the 30-min interval
      pm.addData((301L, 1L, ts(20.0))); vm.addData((302L, 1L, ts(20.0)))
      q.processAllAvailable()
      // batch 3 runs UNDER the advanced watermark — eviction applies
      vm.addData((303L, 2L, ts(21.0)))
      q.processAllAvailable()
      val late = stateRows
      assert(late >= 0, "no stateOperators progress recorded")
      assert(late < 35,
        s"state never shrank: $late rows retained of ${35 + 3} added — " +
          "interval-join state is unbounded")
      assert(late <= 6,
        s"state holds $late rows; only the ~3 post-watermark rows " +
          "should remain")
    } finally q.stop()
  }

  test("stateful streaming sessionization matches batch islands " +
    "on closed sessions") {
    import spark.implicits._
    // bounded memory stream: two users, sessions split by >30min gaps
    val events = Seq(
      EventStreams.SessionInput(1L, 1000L),
      EventStreams.SessionInput(1L, 1600L),
      EventStreams.SessionInput(1L, 1000L + 4000L), // new session (gap 3400s)
      EventStreams.SessionInput(2L, 500L))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.SessionInput](spark)
    ms.addData(events: _*)
    val q = EventStreams.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only sessions closed by a later event are emitted (open state
      // waits for its timeout): user 1's first session
      val got = spark.table("sessions_out")
        .as[EventStreams.SessionOut].collect().toSet
      assert(got == Set(EventStreams.SessionOut(1L, 1000L, 2L, 600L)))
    } finally q.stop()
  }
}
