package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial hot-bucket guard specs (VERDICT r10 ask #3): a corpus of
  * identical-signature docs puts EVERY member in one (band, bval)
  * bucket under every banding — re-banding cannot split it, so the r10
  * plan's single collect_list gather grew without bound. The r11 guard
  * hash-segments buckets over a cap and verifies each segment cell
  * in-task ([[graft.functions.HashKernels.simhashClosePairsCross]]);
  * these specs drive a tiny cap on corpora engineered to blow it and
  * pin OUTPUT IDENTITY against the uncapped plan (the oracle), for
  * both the simhash tail and the cosine LSH twin. */
class SimhashSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Banded rows for hand-built signatures, exactly as dedupSimhash
    * builds them (9 bands over the split 64-bit signature). */
  private def banded(sigs: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val sig = sigs.toDF("doc_id", "sim_lo", "sim_hi")
    sig.select(col("doc_id"), col("sim_lo"), col("sim_hi"),
      explode(array((0 to 8).map(b => struct(lit(b).as("band"),
        text.TextQueries.bandVal(b).as("bval"))): _*)).as("bd"))
      .select(col("doc_id"), col("sim_lo"), col("sim_hi"),
        col("bd.band").as("band"), col("bd.bval").as("bval"))
  }

  test("simhash guard: capped plan is pair-identical to the uncapped " +
    "oracle on a 500-identical-signature corpus (cap 64 => 8 segments)") {
    graft.functions.GraftFunctions.register(spark)
    // 500 docs sharing ONE signature (hottest possible bucket), plus a
    // 1-bit-off neighbour family and unrelated background signatures
    val sigs =
      (0L until 500L).map(i => (i, 0x0123456789ABCDEFL, 0x00000000FEDCBA98L)) ++
      (500L until 520L).map(i => (i, 0x0123456789ABCDEEL, 0x00000000FEDCBA98L)) ++
      (520L until 540L).map(i => (i, ~0L, 0x00000000FFFFFFFFL))
    val b = banded(sigs)
    b.cache()
    try {
      val capped = text.TextQueries.closePairsFromBanded(b, 8, bucketCap = 64)
        .collect().map(_.toString).toSet
      val oracle = text.TextQueries
        .closePairsFromBanded(b, 8, bucketCap = Int.MaxValue)
        .collect().map(_.toString).toSet
      assert(capped == oracle,
        s"${(capped -- oracle).size} extra / ${(oracle -- capped).size} " +
          "missing vs the uncapped plan")
      // families: 500 identical (C(500,2) at h=0), 20 one-bit-off
      // neighbours (500·20 at h=1 plus C(20,2) internal at h=0), and
      // 20 identical far-away background docs (C(20,2) at h=0)
      assert(oracle.size == 500 * 499 / 2 + 500 * 20 + 2 * (20 * 19 / 2),
        s"unexpected oracle pair count ${oracle.size}")
      val plan = text.TextQueries.closePairsFromBanded(b, 8, bucketCap = 64)
        .queryExecution.executedPlan.toString
      assert(plan.contains("simhash_close_pairs_x"),
        "segment-cell kernel missing from the capped plan")
    } finally b.unpersist()
  }

  test("simhash density tier: a bucket of DISTINCT signatures over " +
    "the cap re-bands by the rotated signature and stays " +
    "pair-identical to the uncapped oracle") {
    graft.functions.GraftFunctions.register(spark)
    // 300 docs sharing band 0 (sim_lo low 7 bits equal) but otherwise
    // DIVERSE signatures — a density hot-spot the rotation CAN split,
    // unlike the identical-signature corpus above. Sprinkle genuine
    // near-dup families so the answer is non-trivial.
    val rnd = new scala.util.Random(11)
    val base = (0L until 300L).map { i =>
      val hi = rnd.nextLong() & 0x7FFFFFFFL
      val lo = (rnd.nextLong() & 0xFFFFFF80L) | 0x55L
      (i, lo, hi)
    }
    val dups = (0 until 10).map { p =>
      val (_, lo, hi) = base(p * 7)
      (1000L + p, lo ^ 0x100L, hi) // 1 bit off a base member
    }
    val b = banded(base ++ dups)
    b.cache()
    try {
      val capped = text.TextQueries.closePairsFromBanded(b, 8,
        bucketCap = 64).collect().map(_.toString).toSet
      val oracle = text.TextQueries.closePairsFromBanded(b, 8,
        bucketCap = Int.MaxValue).collect().map(_.toString).toSet
      assert(oracle.nonEmpty, "fixture produced no close pairs")
      assert(capped == oracle,
        s"${(capped -- oracle).size} extra / ${(oracle -- capped).size} " +
          "missing vs the uncapped plan")
    } finally b.unpersist()
  }

  test("simhash guard: default cap leaves sub-cap corpora on the " +
    "single-gather path with identical output") {
    val sigs = (0L until 100L).map(i =>
      (i, 0x1111111111111111L ^ i, 0x2222222222222222L))
    val b = banded(sigs)
    val dflt = text.TextQueries.closePairsFromBanded(b, 8)
      .collect().map(_.toString).toSet
    val uncapped = text.TextQueries
      .closePairsFromBanded(b, 8, bucketCap = Int.MaxValue)
      .collect().map(_.toString).toSet
    assert(dflt == uncapped)
  }

  test("cosine guard: capped LSH plan is row-identical to the uncapped " +
    "plan and the join oracle at a cap the sf corpus exceeds") {
    val sf = SparkTestBase.sf
    // sf0.001 has ~200 clustered vectors over few live codes; cap 8
    // forces multi-segment cells on every hot bucket
    val capped = sim.SimQueries.simNeardupLshCapped(spark, sf, 16, 8)
      .collect().map(_.toString).toSet
    val uncapped = sim.SimQueries
      .simNeardupLshCapped(spark, sf, 16, Int.MaxValue)
      .collect().map(_.toString).toSet
    val joinOracle = sim.SimQueries.simNeardupLshViaJoin(spark, sf, 16)
      .collect().map(_.toString).toSet
    assert(capped == uncapped,
      s"${(capped -- uncapped).size} extra / " +
        s"${(uncapped -- capped).size} missing vs the uncapped plan")
    assert(uncapped == joinOracle, "uncapped kernel plan drifted from " +
      "the join oracle")
    assert(capped.nonEmpty, "adversarial cap test vacuous: no pairs")
  }

  /** Banded rows under the threshold-parameterized layout (bandValAt
    * over maxHamming + 1 bands), exactly as dedupSimhashAt builds
    * them. */
  private def bandedAt(sigs: Seq[(Long, Long, Long)], maxHamming: Int) = {
    import spark.implicits._
    val k = maxHamming + 1
    val sig = sigs.toDF("doc_id", "sim_lo", "sim_hi")
    sig.select(col("doc_id"), col("sim_lo"), col("sim_hi"),
      explode(array((0 until k).map(b => struct(lit(b).as("band"),
        text.TextQueries.bandValAt(b, k).as("bval"))): _*)).as("bd"))
      .select(col("doc_id"), col("sim_lo"), col("sim_hi"),
        col("bd.band").as("band"), col("bd.bval").as("bval"))
  }

  test("simhash density tier at maxHamming = 12 (> 8): the adaptive " +
    "rotated cover keeps the capped plan pair-identical to the " +
    "uncapped oracle (ADVICE r13 #1 — the fixed 9x7 cover dropped " +
    "h in [9, 12] pairs here)") {
    graft.functions.GraftFunctions.register(spark)
    // 300 docs sharing band 0 under the 13-band layout (bits 0..3 of
    // sim_lo equal) but otherwise diverse, plus planted families at
    // hamming 10-12 — far wider than 8, so only an exhaustive-cover
    // second banding finds them once the bucket blows the cap.
    val rnd = new scala.util.Random(47)
    val base = (0L until 300L).map { i =>
      val lo = (rnd.nextInt() & 0xFFFFFFF0L) | 0x9L
      val hi = rnd.nextInt() & 0xFFFFFFFFL
      (i, lo, hi)
    }
    // ADVERSARIAL planted partners, one per chosen base member: flip
    // exactly ONE bit in each first-level band 1..12 (13-band layout:
    // boundaries 0,4,9,14,19,24,29,34,39,44,49,54,59,64) and NONE in
    // band 0 — the pair then shares ONLY the hot band-0 bucket, at
    // hamming exactly 12. The 12 flip positions (sig64 bits 4, 9, 16,
    // 23, 24, 31, 38, 40, 45, 52, 55, 59) are chosen so that after the
    // tier's rotr-31 every one of the OLD fixed 9x7-bit rotated bands
    // contains >= 1 flip: under the r13 code these pairs landed in no
    // shared (band2, bval2) sub-bucket and were silently dropped; the
    // adaptive 13-band rotated cover must find them (<= 12 flips
    // cannot corrupt all 13 disjoint rotated bands).
    val loFlips = Seq(4, 9, 16, 23, 24, 31).map(1L << _).reduce(_ | _)
    val hiFlips = Seq(38, 40, 45, 52, 55, 59).map(b => 1L << (b - 32))
      .reduce(_ | _)
    val planted = (0 until 12).map { p =>
      val (_, lo, hi) = base(p * 11)
      (2000L + p, lo ^ loFlips, hi ^ hiFlips)
    }
    val b = bandedAt(base ++ planted, 12)
    b.cache()
    try {
      val capped = text.TextQueries.closePairsFromBanded(b, 12,
        bucketCap = 64).collect().map(_.toString).toSet
      val oracleRows = text.TextQueries.closePairsFromBanded(b, 12,
        bucketCap = Int.MaxValue).collect()
      val oracle = oracleRows.map(_.toString).toSet
      assert(oracleRows.nonEmpty, "fixture produced no close pairs")
      // the fixture only bites if the planted h = 12 pairs qualify —
      // every planted partner must appear in the oracle
      val plantedFound = oracleRows.count(r =>
        r.getLong(2) == 12L &&
          (r.getLong(0) >= 2000L || r.getLong(1) >= 2000L))
      assert(plantedFound >= 12,
        s"fixture vacuous: only $plantedFound of 12 planted " +
          "hamming-12 pairs in the oracle")
      assert(capped == oracle,
        s"${(capped -- oracle).size} extra / ${(oracle -- capped).size} " +
          "missing vs the uncapped plan at maxHamming = 12")
    } finally b.unpersist()
  }
}
