package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("topk_pairs == window row_number form across many partitions " +
    "(merge + serialize path)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // adversarial spread: every group's rows land in many partitions,
    // with ties on value broken by id
    val df = (1L to 2000L).map { i =>
      (i % 7, (i % 13).toDouble, i)
    }.toDF("key", "v", "id").repartition(16)
    val got = df.groupBy("key")
      .agg(expr("topk_pairs(v, id, 5)").as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(col("key"), (col("pos") + 1).as("rn"),
        col("col.v").as("v"), col("col.id").as("id"))
      .orderBy("key", "rn")
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("key"), col("rn"), col("v"), col("id"))
      .orderBy("key", "rn")
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("plan is ObjectHashAggregate with a map-side partial (no full " +
    "shuffle of input rows)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 3, i.toDouble, i))
      .toDF("key", "v", "id")
    val agg = df.groupBy("key").agg(expr("topk_pairs(v, id, 3)"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    // partial + final pair: the aggregate appears on both sides of the
    // exchange, proving the map-side combine that bounds shuffle bytes
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2)
  }

  test("NaN ranks greatest regardless of arrival order (matches the " +
    "window form, where NaN is greatest in ORDER BY DESC)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // NaN arrives LAST in each partition after the heap is full — the
    // arrival-order hazard: a primitive `>` comparison would discard it
    val rows = (1L to 50L).map(i => (0L, i.toDouble, i)) :+
      ((0L, Double.NaN, 999L))
    val df = rows.toDF("key", "v", "id").repartition(1)
    val got = df.groupBy("key")
      .agg(expr("topk_pairs(v, id, 3)").as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id").as("id"))
      .collect().map(_.getLong(0)).toSeq
    // NaN (id 999) first, then 50.0, 49.0
    assert(got == Seq(999L, 50L, 49L))
  }

  test("-0.0 and 0.0 tie (Spark ORDER BY semantics): smaller id wins " +
    "regardless of zero sign or arrival order") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((0L, -0.0, 1L), (0L, 0.0, 5L), (0L, -1.0, 9L))
      .toDF("key", "v", "id").repartition(1)
    val got = df.groupBy("key")
      .agg(expr("topk_pairs(v, id, 1)").as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id")).collect().map(_.getLong(0)).toSeq
    // window form: -0.0 == 0.0, tie broken by id asc → id 1
    assert(got == Seq(1L))
  }

  test("non-integral id types are rejected at build time (no silent " +
    "double->bigint truncation)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, 1.0, 1.5)).toDF("key", "v", "id")
    val e = intercept[Exception] {
      df.groupBy("key").agg(expr("topk_pairs(v, id, 3)")).collect()
    }
    assert(e.getMessage.contains("integral"))
  }

  test("k must be a positive literal") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, 1.0, 1L)).toDF("key", "v", "id")
    assertThrows[Exception] {
      df.groupBy("key").agg(expr("topk_pairs(v, id, 0)")).collect()
    }
  }
}
