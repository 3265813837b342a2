package graft

import graft.traj.{TrajDataset, TrajModel, TrajQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The wide (per-frame map/array) layout must agree with the long
  * (exploded relational) layout operator-for-operator — the two
  * physical strategies of SURVEY §2.3 J2: pair-expansion broadcast
  * join vs array-gather on the wide layout. */
class WideLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("wide-gather distances == long-join distances, bit for bit") {
    val long = TrajQueries.trajDistances(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val wide = TrajQueries.trajDistancesWide(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(long.nonEmpty)
    assert(wide.toSeq == long.toSeq)
  }

  test("wide-fold COM == long-path COM, bit for bit") {
    val long = TrajQueries.trajCom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val wide = TrajQueries.trajComWide(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(long.nonEmpty)
    assert(wide.toSeq == long.toSeq)
  }

  test("wide-fold COG (shared atom-map kernel) == long-path COG, " +
    "bit for bit") {
    val long = TrajQueries.trajCog(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    val wide = TrajQueries.trajCogWide(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(long.nonEmpty)
    assert(wide.toSeq == long.toSeq)
  }

  test("com_wide and cog_wide share ONE wide-frames build (the memo " +
    "returns the same instance)") {
    val a = TrajModel.atomMapShared(spark, sf)
    val b = TrajModel.atomMapShared(spark, sf)
    assert(a eq b, "atomMapShared rebuilt the wide frames")
  }

  test("wide round-trip: long -> Dataset[TrajFrame] -> long preserves " +
    "coordinates") {
    val pos = TrajModel.positionsShared(spark, sf)
      .filter(col("atom_id") <= 20)
    val back = TrajDataset.long(TrajDataset.wide(pos))
    // same per-frame atom counts and coordinate multisets
    val a = pos.groupBy("frame_id")
      .agg(count(lit(1)).as("n"), round(sum("x"), 6).as("sx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val b = back.groupBy("frame_id")
      .agg(count(lit(1)).as("n"), round(sum("x"), 6).as("sx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
