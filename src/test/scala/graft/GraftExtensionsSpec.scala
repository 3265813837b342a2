package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session in SparkTestBase is built with
  * spark.sql.extensions=graft.GraftExtensions and no explicit
  * GraftFunctions.register call — these queries only resolve if the
  * extensions injection worked. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("extension-injected functions resolve without manual registration") {
    val r = spark.sql(
      """SELECT min_fingerprint('hello world hello') AS fp,
        |  ngram5_count('hello world') AS ng,
        |  dot_scaled(array(CAST(1.0 AS DOUBLE), 2.0),
        |             array(CAST(3.0 AS DOUBLE), 4.0)) AS dot,
        |  lsh16_code(array(CAST(0.5 AS DOUBLE), -0.25)) AS code,
        |  simhash64('a b c').sim_lo AS slo""".stripMargin).collect()(0)
    assert(r.getAs[String]("fp").length == 32)
    assert(r.getAs[Int]("ng") == 7)
    assert(r.getAs[Long]("dot") == 11L * 1000000000000L)
    assert(r.getAs[Long]("code") >= 0L)
  }

  test("round-4 injections resolve: rep_stats, topk_pairs, " +
    "pair_dist_stats") {
    val r = spark.sql(
      """SELECT rep_stats('a b a').topw AS topw,
        |  pair_dist_stats(CAST(array(0.0, 3.0) AS ARRAY<FLOAT>),
        |                  CAST(array(0.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(0.0, 4.0) AS ARRAY<FLOAT>)).mx AS mx
        |""".stripMargin).collect()(0)
    assert(r.getAs[Long]("topw") == 2L)
    assert(r.getAs[Double]("mx") == 5.0)
    val agg = spark.sql(
      """SELECT k, topk_pairs(v, id, 2) AS top FROM VALUES
        |  (1, CAST(3.0 AS DOUBLE), CAST(10 AS BIGINT)),
        |  (1, 1.0, 11), (1, 2.0, 12) AS t(k, v, id)
        |GROUP BY k""".stripMargin).collect()(0)
    val top = agg.getSeq[org.apache.spark.sql.Row](1)
    assert(top.map(_.getLong(1)) == Seq(10L, 12L))
  }

  test("injected and registry forms are the same expressions") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT min_fingerprint('abcdefghij') AS a").collect()(0)
    assert(r.getAs[String]("a") ==
      graft.functions.HashKernels.fingerprint("abcdefghij"))
  }
}
