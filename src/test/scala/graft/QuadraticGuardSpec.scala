package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixed-fit quadratic guardrail (VERDICT r19 next #2):
  * above the ivfK floor the fixed K = 16 SemDeDup fit refuses to plan
  * without an explicit `spark.graft.allowQuadratic=true` opt-in,
  * pointing at the scaled twin; below the floor — the sf0.01
  * driver-gate regime, where the tiers are bit-identical — the guard
  * never engages, so the oracle gate is unaffected. */
class QuadraticGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** A >floor corpus: 1100 synthetic 4-dim unit-ish vectors (ivfK
    * engages at n > 1024). Written once per suite run. */
  private lazy val bigDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-quadguard").toString
    spark.range(1100)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 3), i -> " +
          "CAST(0.1 + 0.01 * pmod(id + i, 7) AS FLOAT))").as("embedding"),
        (col("id") % 3).cast("int").as("label"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def withOptIn[T](v: Option[String])(body: => T): T = {
    val key = "spark.graft.allowQuadratic"
    val prev = spark.conf.getOption(key)
    v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
    try body
    finally prev match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
  }

  test("above the ivfK floor, the fixed-fit pair tier refuses " +
    "without the explicit opt-in and names the scaled twin") {
    val e = intercept[IllegalStateException] {
      withOptIn(None) {
        graft.sim.SimQueries.semPairsAt(spark, bigDir, 0.4).count()
      }
    }
    assert(e.getMessage.contains("allowQuadratic"),
      s"refusal must name the opt-in knob: ${e.getMessage}")
    assert(e.getMessage.contains("q_dedup_semantic_scaled"),
      s"refusal must point at the production twin: ${e.getMessage}")
  }

  test("the opt-in unlocks the same corpus") {
    withOptIn(Some("true")) {
      // planning + a small action — the guard sits at plan time
      val n = graft.sim.SimQueries.semPairsAt(spark, bigDir, 0.99)
        .limit(1).count()
      assert(n >= 0)
    }
  }

  test("below the floor (the driver-gate regime) the guard never " +
    "engages: q_dedup_semantic runs WITHOUT the opt-in") {
    withOptIn(None) {
      val out = SparkEntry.queries("q_dedup_semantic")(
        spark, SparkTestBase.sf)
      assert(out.count() > 0)
    }
  }
}
