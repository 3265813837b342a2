package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PairDistStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("pair_dist_stats == HOF-composed all-pairs form (sum/min/max/" +
    "count) on hand-size frames") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val frames = Seq(
      (Array(0f, 3f, 0f), Array(0f, 0f, 4f), Array(0f, 0f, 0f)),
      (Array(1f, 1f, 2f, 5f), Array(1f, 1f, 2f, 5f),
        Array(1f, 1f, 2f, 5f)))
    val df = frames.toDF("xs", "ys", "zs")
    val k = df.select(expr("pair_dist_stats(xs, ys, zs)").as("st"))
      .select("st.sum", "st.mn", "st.mx", "st.cnt")
      .collect().map(r => (r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3)))
    // frame 1: atoms (0,0,0),(3,0,0),(0,4,0): dists 3,4,5
    assert(math.abs(k(0)._1 - 12.0) < 1e-12)
    assert(k(0)._2 == 3.0 && k(0)._3 == 5.0 && k(0)._4 == 3L)
    // frame 2: duplicate atoms give a 0 min; C(4,2) = 6 pairs
    assert(k(1)._2 == 0.0 && k(1)._4 == 6L)
    // differential twin: explode-based SQL form
    val sql = df.select(posexplode(col("xs")).as(Seq("i", "xi")),
      col("xs"), col("ys"), col("zs"))
      .select(col("i"), col("xs"), col("ys"), col("zs"))
      .withColumn("j", explode(expr(
        "CASE WHEN i + 1 <= size(xs) - 1 " +
          "THEN sequence(i + 1, size(xs) - 1) " +
          "ELSE array() END")))
      .select(sqrt(
        pow(expr("xs[j]") - expr("xs[i]"), 2) +
          pow(expr("ys[j]") - expr("ys[i]"), 2) +
          pow(expr("zs[j]") - expr("zs[i]"), 2)).as("d"))
      .agg(sum("d"), min("d"), max("d"), count(lit(1)))
      .collect()(0)
    val totalSum = k.map(_._1).sum
    assert(math.abs(sql.getDouble(0) - totalSum) < 1e-9)
    assert(sql.getDouble(1) == k.map(_._2).min)
    assert(sql.getDouble(2) == k.map(_._3).max)
    assert(sql.getLong(3) == k.map(_._4).sum)
  }
}
