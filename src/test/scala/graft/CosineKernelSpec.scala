package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r11 embedding-LSH plan rewrite: `q_sim_neardup_lsh` now gathers
  * per-code member lists and runs the c² candidate enumeration +
  * exact-cosine verify inside the `cosine_close_pairs` kernel instead
  * of materializing every candidate as a join row carrying both full
  * embeddings (measured at the 10× replica: 25.6 M candidate rows of
  * ~1 KB, 18.0 s idle — candidates grow quadratically on the clustered
  * corpus). These specs pin (1) row-identity of the kernel plan against
  * the retired join plan at two `bits` settings, (2) codegen on/off
  * invariance, (3) the kernel's unit semantics (rounding, threshold
  * edge, same-bucket vs cross-bucket modes, id normalization) on
  * hand-built member lists, and (4) that the executed plan carries no
  * per-candidate embedding-pair columns. */
class CosineKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("kernel plan is row-identical to the join-based plan " +
    "(differential, sf0.01, bits = 16 and 12)") {
    val sf01 = "/root/testdata/sf0.01"
    for (bits <- Seq(16, 12)) {
      val kern = sim.SimQueries.simNeardupLshAt(spark, sf01, bits)
        .collect().map(_.toString).toSet
      val join = sim.SimQueries.simNeardupLshViaJoin(spark, sf01, bits)
        .collect().map(_.toString).toSet
      assert(kern == join,
        s"bits=$bits: ${(kern -- join).size} extra / " +
          s"${(join -- kern).size} missing vs the join-based plan")
      assert(kern.nonEmpty,
        s"bits=$bits: differential vacuous, no near-dup pairs")
    }
  }

  test("bounded top-k variant matches a window ranking derived from " +
    "the registered pair query (differential), and its plan carries " +
    "no Window over the pair set") {
    val sf01 = "/root/testdata/sf0.01"
    val topk = sim.SimQueries.simNeardupTopk(spark, sf01)
    val got = topk.collect().map(_.toString).toSeq
    // oracle: rank the pair query's directed edges with a window —
    // correct but full-sort-of-pairs; the registered plan must agree
    // while aggregating with the bounded heap instead
    val pairs = sim.SimQueries.simNeardupLsh(spark, sf01)
    val edges = pairs.select(col("v1").as("vec_id"), col("v2").as("nb"),
        col("cos_sim"))
      .unionByName(pairs.select(col("v2").as("vec_id"),
        col("v1").as("nb"), col("cos_sim")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos_sim").desc, col("nb"))
    val want = edges
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("vec_id"), col("rk"), col("nb").as("neighbor_id"),
        col("cos_sim"))
      .orderBy("vec_id", "rk")
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty, "top-k differential vacuous: no rows")
    assert(got == want, "bounded-heap top-k drifted from the window " +
      "ranking of the pair query")
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "top-k plan lost the partial-aggregatable bounded heap")
    assert(!plan.contains("Window"),
      "top-k plan sorts the pair set under a Window — the full-shuffle " +
        "shape this query exists to avoid")
  }

  test("occupancy-constant bits knob floors at 16 through 2^14 vectors " +
    "and then tracks ceil(log2 n) + 2") {
    import sim.SimQueries.neardupTopkBits
    // every oracle scale sits under the floor -> bit-identical to the
    // fixed-16-bit form the DuckDB twin computes
    for (n <- Seq(1L, 2L, 500L, 5000L, 16384L))
      assert(neardupTopkBits(n) == 16, s"n=$n")
    // past the floor the width tracks log2(n): occupancy n/2^bits <= 1/4
    assert(neardupTopkBits(16385L) == 17)
    assert(neardupTopkBits(1L << 19) == 21)      // 524k vecs (100x) -> 21
    assert(neardupTopkBits((1L << 19) + 1) == 22)
    for (n <- Seq(20000L, 100000L, 1000000L, 1L << 30)) {
      val b = neardupTopkBits(n)
      assert(n.toDouble / math.pow(2, b) <= 0.25,
        s"occupancy not flat at n=$n, bits=$b")
    }
  }

  test("two-phase screen never flips a survival decision: 200-vector " +
    "boundary fuzz against a single-phase dotScaled+BigDecimal " +
    "reference") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // vectors engineered so pair cosines CONCENTRATE at the 0.4
    // survival boundary (a = base + tiny jitter scaled to land cos at
    // 0.4 + N(0, 1e-3), including offsets inside the 5e-7 rounding
    // band) — the regime where a sloppy fast-phase margin would flip
    // decisions. Seeded: failures reproduce.
    val rnd = new scala.util.Random(20260815L)
    val dim = 16
    val base = Array.fill(dim)(rnd.nextGaussian())
    val bn = math.sqrt(base.map(x => x * x).sum)
    val unit = base.map(_ / bn)
    val offs = Seq(0.0, 1e-9, -1e-9, 4.9e-7, 5.1e-7, -4.9e-7, -5.1e-7,
      1e-6, -1e-6)
    val vecs = (0 until 200).map { i =>
      val target = 0.4 +
        (if (i < offs.size) offs(i) else rnd.nextGaussian() * 1e-3)
      // v = target·unit + sqrt(1-target²)·orth, orth ⟂ unit
      val g = Array.fill(dim)(rnd.nextGaussian())
      val proj = (0 until dim).map(k => g(k) * unit(k)).sum
      val orth = (0 until dim).map(k => g(k) - proj * unit(k)).toArray
      val on = math.sqrt(orth.map(x => x * x).sum)
      val v = (0 until dim).map(k =>
        target * unit(k) + math.sqrt(math.max(0, 1 - target * target)) *
          orth(k) / on).toArray
      (i.toLong, v.toSeq)
    }
    // norms exactly as the query computes them: sqrt(dotScaled(e,e)/1e12)
    def nrmOf(e: Array[Double]): Double =
      math.sqrt(functions.HashKernels.dotScaled(e, e) / 1e12)
    val withN = vecs.map { case (id, e) =>
      (id, e, nrmOf(e.toArray)) }
    // single-phase reference: the exact path only, per the oracle SQL
    val want = (for {
      i <- withN.indices; j <- (i + 1) until withN.size
      di = functions.HashKernels.dotScaled(
        withN(i)._2.toArray, withN(j)._2.toArray)
      cos = (di / 1e12) / (withN(i)._3 * withN(j)._3)
      if java.lang.Double.isFinite(cos)
      r6 = java.math.BigDecimal.valueOf(cos)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if r6 >= 0.4
    } yield (withN(i)._1, withN(j)._1, r6)).toSet
    val got = withN.toDF("vec_id", "emb", "nrm")
      .agg(collect_list(struct(col("vec_id"), col("emb"), col("nrm")))
        .as("ma"))
      .select(explode(expr("cosine_close_pairs(ma, ma, true, 0.4)"))
        .as("p"))
      .select("p.v1", "p.v2", "p.cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(want.nonEmpty && want.size < 200 * 199 / 2,
      s"fuzz vacuous: ${want.size} survivors — boundary not exercised")
    assert(got == want,
      s"screen flipped decisions: ${(got -- want).size} extra, " +
        s"${(want -- got).size} missing of ${want.size}")
  }

  test("kernel plan results are invariant to whole-stage codegen on/off") {
    val c0 = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val on = sim.SimQueries.simNeardupLsh(spark, SparkTestBase.sf)
        .collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = sim.SimQueries.simNeardupLsh(spark, SparkTestBase.sf)
        .collect().map(_.toString).toSeq
      assert(on == off, "simNeardupLsh differs across codegen modes")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", c0)
  }

  test("cosine_close_pairs unit semantics: rounding, threshold edge, " +
    "modes, id normalization") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // norms supplied exactly: (3,4) and (4,3) have norm 5; their dot is
    // 24 -> cos 0.96. (1,1) vs (1,0): cos = 1/sqrt(2) -> rounds to
    // 0.707107 at 6 decimals (the kernel must reproduce Spark's
    // round(col, 6) exactly).
    val a = Seq((1L, Seq(3.0, 4.0), 5.0), (2L, Seq(4.0, 3.0), 5.0),
      (3L, Seq(-3.0, 4.0), 5.0))
      .toDF("vec_id", "emb", "nrm")
      .agg(collect_list(struct(col("vec_id"), col("emb"), col("nrm")))
        .as("ma"))
    def run(thr: Double) = a
      .select(explode(expr(s"cosine_close_pairs(ma, ma, true, $thr)"))
        .as("p"))
      .select("p.v1", "p.v2", "p.cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // pairs: (1,2) cos 0.96; (1,3) cos (-9+16)/25 = 0.28; (2,3) cos
    // (-12+12)/25 = 0.0
    assert(run(0.5) == Set((1L, 2L, 0.96)))
    assert(run(0.28) == Set((1L, 2L, 0.96), (1L, 3L, 0.28)),
      "threshold compare must be inclusive (>=)")
    assert(run(0.99) == Set.empty, "no survivors must mean empty array")
    // 6-decimal HALF_UP rounding, bit-identical to Spark's round(_, 6)
    val b = Seq((10L, Seq(1.0, 1.0), math.sqrt(2.0)),
      (20L, Seq(1.0, 0.0), 1.0))
      .toDF("vec_id", "emb", "nrm")
      .agg(collect_list(struct(col("vec_id"), col("emb"), col("nrm")))
        .as("ma"))
    val r = b.select(explode(
        expr("cosine_close_pairs(ma, ma, true, 0.5)")).as("p"))
      .select("p.v1", "p.v2", "p.cos_sim").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .toSeq == Seq((10L, 20L, 0.707107)))
    // cross-bucket mode: every A x B pair, ids normalized v1 < v2 even
    // when the larger id sits in bucket A
    val hi = Seq((9L, Seq(1.0, 0.0), 1.0))
      .toDF("vec_id", "emb", "nrm")
      .agg(collect_list(struct(col("vec_id"), col("emb"), col("nrm")))
        .as("ma"))
    val lo = Seq((4L, Seq(1.0, 0.0), 1.0), (5L, Seq(0.0, 1.0), 1.0))
      .toDF("vec_id", "emb", "nrm")
      .agg(collect_list(struct(col("vec_id"), col("emb"), col("nrm")))
        .as("mb"))
    val cross = hi.crossJoin(lo)
      .select(explode(
        expr("cosine_close_pairs(ma, mb, false, 0.5)")).as("p"))
      .select("p.v1", "p.v2", "p.cos_sim").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(cross == Set((4L, 9L, 1.0)),
      "cross mode: expected the one qualifying A x B pair, normalized")
    // plan-time literal validation
    val e = intercept[Exception] {
      a.selectExpr("cosine_close_pairs(ma, ma, true, ma)").collect()
    }
    assert(e.getMessage.contains("threshold"))
  }

  test("executed kernel plan materializes no per-candidate embedding " +
    "pairs (the c^2 verify stays in-task)") {
    val plan = sim.SimQueries.simNeardupLsh(spark, SparkTestBase.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_close_pairs"),
      "kernel expression missing from the physical plan")
    assert(!plan.contains("emb1") && !plan.contains("emb2"),
      s"per-candidate embedding-pair columns found in plan:\n$plan")
  }
}
