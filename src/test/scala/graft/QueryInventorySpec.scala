package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and produces a sane result;
  * execution-path parametrization (shuffle partitions) must not change
  * results — SURVEY §5 adopted strategy (b). */
class QueryInventorySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle query has matching queries entry") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      // anti-join legitimately returns 0 at some SFs; everything else
      // must produce rows
      if (name != "q_anti_join") assert(n > 0, s"$name returned 0 rows")
    }
  }

  // the queries whose determinism argument is least trivial: exact
  // integer k-means, multiprobe LSH, two-stage blocked jaccard,
  // branch-dispatched MIC
  private val pathSensitive = Seq("q_agg_pricing_summary", "q_sim_ann_ivf",
    "q_sim_neardup_lsh", "q_dedup_ngram", "q_traj_mic_adaptive")

  test("results are invariant to shuffle partitioning") {
    def run(q: String) = SparkEntry.queries(q)(spark, sf)
      .collect().map(_.toString).toSeq
    val p0 = spark.conf.get("spark.sql.shuffle.partitions")
    try pathSensitive.foreach { q =>
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val r1 = run(q)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val r7 = run(q)
      assert(r1 == r7, s"$q differs across shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", p0)
  }

  test("results are invariant to whole-stage codegen on/off " +
    "(interpreted eval path of the custom expressions)") {
    def run(q: String) = SparkEntry.queries(q)(spark, sf)
      .collect().map(_.toString).toSeq
    val c0 = spark.conf.get("spark.sql.codegen.wholeStage")
    try Seq("q_dedup_ngram", "q_sim_ann_ivf", "q_dedup_simhash")
      .foreach { q =>
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        val on = run(q)
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val off = run(q)
        assert(on == off, s"$q differs across codegen modes")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", c0)
  }

  test("planted near-duplicates are found by minhash and simhash") {
    val mh = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty, "minhash found no near-dups in planted corpus")
    val sh = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    // high-jaccard pairs should also be simhash-close
    assert((mh intersect sh).nonEmpty)
  }

  test("box roundtrip is the identity on valid boxes") {
    val rows = SparkEntry.queries("q_traj_box_roundtrip")(spark, sf)
      .collect()
    rows.foreach { r =>
      Seq(("la", "r_a"), ("lb", "r_b"), ("lc", "r_c"),
        ("alpha", "r_alpha"), ("beta", "r_beta"), ("gamma", "r_gamma"))
        .foreach { case (in, out) =>
          val i = r.getAs[Double](in); val o = r.getAs[Double](out)
          assert(math.abs(i - o) < 1e-5, s"$in=$i vs $out=$o")
        }
    }
  }
}
