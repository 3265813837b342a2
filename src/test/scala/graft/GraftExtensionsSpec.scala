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

  test("injected and registry forms are the same expressions") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT min_fingerprint('abcdefghij') AS a").collect()(0)
    assert(r.getAs[String]("a") ==
      graft.functions.HashKernels.fingerprint("abcdefghij"))
  }
}
