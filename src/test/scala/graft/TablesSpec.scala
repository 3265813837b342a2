package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `rel.Tables.normalizeEventsTs` — the one adapter between the
  * driver-generated events table and every ts consumer. The driver's
  * generator has shipped `ts` as TIMESTAMP(NANOS) (read as LONG nanos
  * under the session's nanosAsLong flag, rounds ≤9) and as
  * TIMESTAMP(MICROS) NTZ (r10+); the live testdata only exercises ONE
  * shape per round, so this spec pins all three normalization paths
  * against the same wall-clock instant to keep back-compat from
  * rotting silently. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // 2024-01-01 00:00:00 UTC plus 1.5 s, in each physical shape
  private val epochMicros = 1704067200000000L + 1500000L

  test("LONG nanos, TIMESTAMP_NTZ and TIMESTAMP inputs all normalize " +
    "to the same TIMESTAMP instant (UTC session)") {
    import spark.implicits._
    val asLong = Seq(epochMicros * 1000L).toDF("ts") // nanos
    val asTs = Seq(epochMicros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val asNtz = asTs.select(col("ts").cast(TimestampNTZType).as("ts"))

    val outs = Seq(asLong, asTs, asNtz).map(rel.Tables.normalizeEventsTs)
    outs.foreach(df =>
      assert(df.schema("ts").dataType == TimestampType,
        s"expected TIMESTAMP, got ${df.schema("ts").dataType}"))
    val micros = outs.map(
      _.select(unix_micros(col("ts"))).head.getLong(0))
    assert(micros == Seq(epochMicros, epochMicros, epochMicros))
  }

  test("NTZ normalization is session-timezone-independent (ADVICE " +
    "r10: cast(ntz as timestamp) would shift instants off-UTC)") {
    import spark.implicits._
    val asNtz = Seq(epochMicros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      for (tz <- Seq("America/New_York", "Asia/Tokyo", "UTC")) {
        spark.conf.set(tzKey, tz)
        val got = rel.Tables.normalizeEventsTs(asNtz)
          .select(unix_micros(col("ts"))).head.getLong(0)
        assert(got == epochMicros, s"instant shifted under $tz")
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("the live events table normalizes to TIMESTAMP and survives " +
    "an hour-window aggregation") {
    val ev = rel.Tables.events(spark, SparkTestBase.sf)
    assert(ev.schema("ts").dataType == TimestampType)
    val n = ev.groupBy(window(col("ts"), "1 hour")).count().count()
    assert(n > 0)
  }
}
