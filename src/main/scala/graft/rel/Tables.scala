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
  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true, so ts arrives as a LONG
    * of epoch nanoseconds; convert to a microsecond timestamp here
    * (integer div — no double round-trip, 2^63 ns >> any test value). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
