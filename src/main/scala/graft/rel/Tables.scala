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
    * round-trip, 2^63 ns >> any test value), the NTZ shape via a cast
    * that is value-preserving under the UTC session timezone every
    * entry point sets — so every consumer (including streaming
    * watermarks, which reject NTZ) sees one contract: ts is a
    * TIMESTAMP. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(table(s, d, "events"))

  /** See [[events]]; shared with the streaming specs, which stage the
    * same file behind a file-source stream. */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
