package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface (SURVEY §2.8). The reference is batch
  * only; the new engine runs the same event-time aggregations under
  * `readStream` — the transformation below is shared verbatim by the
  * batch query `q_events_tumbling` (graft.rel.RelQueries.eventsTumbling
  * uses the same window+agg shape) and the streaming test
  * (EventStreamsSpec), which drives it through a memory sink.
  */
object EventStreams {

  /** Tumbling 1-hour window counts per event type. Works on both batch
    * and streaming DataFrames; on a stream, the 2h watermark bounds
    * state and admits late data within the window horizon. */
  def tumblingCounts(events: DataFrame, streaming: Boolean): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("total_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Sliding 1-hour/15-minute window counts per event type — each event
    * lands in 4 overlapping windows. Shared verbatim by the batch query
    * (q_events_sliding) and the streaming drive in EventStreamsSpec;
    * on a stream the watermark bounds the 4-window state. */
  def slidingCounts(events: DataFrame, streaming: Boolean): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)
          .as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_epoch"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming exact dedup: drop replayed events by event_id within the
    * watermark horizon — the streaming face of the dedup family
    * (at-least-once upstream delivery → exactly-once downstream). On a
    * batch frame it degenerates to dropDuplicates; on a stream the
    * watermark bounds the dedup state. */
  def dedupEvents(events: DataFrame, streaming: Boolean): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", "2 hours") else events
    src.dropDuplicates("event_id")
  }

  /** Stream-stream interval join (SURVEY §2.8): attribute each purchase
    * to the same user's views in the preceding 30 minutes. On streams,
    * BOTH sides carry watermarks and the join condition carries the
    * time-range — exactly what Structured Streaming needs to bound join
    * state (each side keeps only rows inside watermark + interval; no
    * unbounded buffering). On batch frames the same plan is a plain
    * shuffle join keyed on user_id. Output timestamps are epoch seconds
    * (raw TIMESTAMP columns break the cross-engine parquet compare).
    *
    * Scale shape: the shuffle keys on user_id, so a 100 TB event log
    * partitions by user; a production deployment pre-buckets both
    * sides on user_id to make this join shuffle-free. */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
      streaming: Boolean): DataFrame = {
    val p0 = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("p_ts"))
    val v0 = views.select(col("event_id").as("view_id"),
      col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = if (streaming) p0.withWatermark("p_ts", "2 hours") else p0
    val v = if (streaming) v0.withWatermark("v_ts", "2 hours") else v0
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"),
        unix_timestamp(col("p_ts")).as("p_epoch"),
        col("view_id"), unix_timestamp(col("v_ts")).as("v_epoch"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("v_ts")))
          .as("gap_sec"))
  }

  /** Windowed streaming per-key top-k (SURVEY §2.9 aggregate tier,
    * streaming face): the bounded-heap TypedImperativeAggregate
    * ([[graft.functions.TopKPairs]]) rides a streaming window
    * aggregation UNCHANGED — partial heaps merge across micro-batches
    * in the state store exactly as they merge across shuffle
    * partitions in batch, so per-(window, key) streaming state stays
    * O(k) instead of buffering every event until the window closes.
    * That state bound is the whole point at scale: a top-3-per-hour
    * over a firehose keeps 3 entries per key per window, not the
    * firehose. Shared verbatim by the batch query
    * (q_events_window_topk) and the streaming drive in
    * EventStreamsSpec; ordering (value DESC, event_id ASC) is total,
    * so batch, stream, and oracle agree exactly. */
  def windowTopK(events: DataFrame, streaming: Boolean,
      k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    val src = if (streaming) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(expr(s"topk_pairs(value, event_id, $k)").as("top"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), posexplode(col("top")))
      .select(col("hour_epoch"), col("event_type"),
        (col("pos") + 1).cast("long").as("rn"),
        col("col.v").as("v"), col("col.id").as("event_id"))
  }

  final case class SessionInput(user_id: Long, e: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long,
      n_events: Long, duration_sec: Long)

  /** Stateful streaming sessionization (SURVEY §2.8): custom per-key
    * state via flatMapGroupsWithState — the streaming counterpart of the
    * batch islands query (RelQueries.eventsSessionize). A session
    * closes when a later event for the key exceeds the gap; the open
    * tail session stays in (bounded per-key) state. Production would
    * layer an EventTimeTimeout + watermark to flush idle tails; the
    * event-driven core below is the semantics the batch oracle checks. */
  def sessionize(events: Dataset[SessionInput],
      gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionInput],
         state: GroupState[SessionState]) =>
          val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var cur = state.getOption
          rows.toSeq.sortBy(e => e.e).foreach { ev =>
            cur match {
              case Some(st) if ev.e - st.last <= gapSec =>
                cur = Some(st.copy(last = ev.e, n = st.n + 1))
              case Some(st) =>
                closed += SessionOut(user, st.start, st.n,
                  st.last - st.start)
                cur = Some(SessionState(ev.e, ev.e, 1))
              case None =>
                cur = Some(SessionState(ev.e, ev.e, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }
}
