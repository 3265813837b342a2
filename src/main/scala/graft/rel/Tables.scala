package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the harness star-schema parquet tables (FIXTURES.md §B).
  *
  * Plain `spark.read.parquet` so Catalyst gets the native vectorized
  * parquet source: predicate pushdown, column pruning and partition
  * planning all apply. At 100 TB these would be the same calls over a
  * partitioned table root; nothing here materializes on the driver.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The driver's generator has shipped events.ts as both parquet
    * TIMESTAMP(NANOS) (early rounds; Spark's vectorized reader rejects
    * it, so sessions set spark.sql.legacy.parquet.nanosAsLong=true and
    * ts arrives as a LONG of epoch nanoseconds) and TIMESTAMP(MICROS)
    * (r10+; isAdjustedToUTC=false, so it arrives as TIMESTAMP_NTZ).
    * Normalize both here — the LONG shape via integer div (no double
    * round-trip, 2^63 ns >> any test value), the NTZ shape by
    * assembling epoch micros arithmetically from the NTZ fields
    * (unix_date + HOUR/MINUTE/SECOND extracts are all timezone-free),
    * so the instant equals the wall-clock read as UTC REGARDLESS of
    * spark.sql.session.timeZone — `cast(ntz as timestamp)` would
    * silently shift every instant under a non-UTC session. Every
    * consumer (including streaming watermarks, which reject NTZ) sees
    * one contract: ts is a TIMESTAMP. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(table(s, d, "events"))

  /** See [[events]]; shared with the streaming specs, which stage the
    * same file behind a file-source stream. */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr(
          "timestamp_micros(unix_date(cast(ts as date)) * 86400000000L" +
            " + extract(HOUR from ts) * 3600000000L" +
            " + extract(MINUTE from ts) * 60000000L" +
            " + cast(extract(SECOND from ts) * 1000000 as long))"))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
