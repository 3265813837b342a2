package graft

import graft.util.Fanout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Fanout.spreadScan]]'s scale gate: the repartition-after-read
  * fires ONLY when the parquet input's total row-group count is below
  * the session's shuffle parallelism (the serial-scan fixture regime);
  * at production row-group counts it is the identity, so the extra
  * exchange that would defeat map-side partial aggregation can never
  * appear on a well-laid-out table. */
class FanoutSpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeTmp(nFiles: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-spread-spec").toString
    val out = s"$dir/t.parquet"
    (1L to 1000L).toDF("id").repartition(nFiles)
      .write.mode("overwrite").parquet(out)
    out
  }

  test("single-row-group input spreads to the configured parallelism") {
    val path = writeTmp(1)
    val df = spark.read.parquet(path)
    val parts = spark.sessionState.conf.numShufflePartitions
    assert(Fanout.rowGroups(spark, path) == 1)
    val spread = Fanout.spreadScan(df, col("id"), path)
    assert(spread ne df) // the gate fired
    assert(spread.rdd.getNumPartitions == parts)
    // row-identical, only partitioning changed
    assert(spread.count() == 1000L)
  }

  test("many-row-group input is the identity (production regime)") {
    val parts = spark.sessionState.conf.numShufflePartitions
    val path = writeTmp(parts + 3) // one row group per file, >= parallelism
    val df = spark.read.parquet(path)
    assert(Fanout.rowGroups(spark, path) >= parts)
    val same = Fanout.spreadScan(df, col("id"), path)
    assert(same eq df) // no exchange added
  }
}
