package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
}
