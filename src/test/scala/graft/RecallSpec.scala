package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall lower bounds for the approximate-similarity tier (VERDICT
  * r14 next #3): the oracle gate proves each query matches its own
  * DEFINED semantics; this spec pins how much of the EXACT answer the
  * approximation returns, so a plan change that silently guts
  * retrieval quality (a broken LSH family, a collapsed codebook, a
  * shortlist that stopped shortlisting) fails a test instead of only
  * moving a committed artifact. Every input and algorithm is
  * deterministic, so the measured recalls are exact reproducible
  * numbers per scale — sf0.001 here (the suite's fixture scale:
  * ivf 0.82+, rerank 0.68, neardup 0.091), sf0.1 and the 10x replica
  * in RECALL.json; bounds sit just under the measured values to flag
  * regressions, not noise.
  */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private lazy val lines =
    graft.tools.RecallProbe.probe(spark, sf)
      .map(l => l.query -> l).toMap

  test("IVF recall@5 vs exact cosine truth stays above its floor") {
    val l = lines("q_sim_ann_ivf")
    assert(l.recall >= 0.75, s"ivf recall ${l.recall} (${l.hits}/${l.truthRows})")
  }

  test("occupancy-scaled IVF (nprobe = ⌈√(2K)⌉) never falls below " +
    "the fixed fit — the r15 mid-scale dip stays closed") {
    val sc = lines("q_sim_ann_ivf_scaled")
    val fx = lines("q_sim_ann_ivf")
    assert(sc.recall >= fx.recall,
      s"scaled (${sc.recall}) below fixed (${fx.recall}) — the " +
        "nprobe policy regressed (RECALL.json r15 dip class)")
  }

  test("re-ranked PQ recovers most of the exact answer and beats raw " +
    "ADC by construction") {
    val rr = lines("q_sim_ann_pq_rerank")
    val raw = lines("q_sim_ann_pq_vs_cosine")
    assert(rr.recall >= 0.65,
      s"rerank recall ${rr.recall} (${rr.hits}/${rr.truthRows})")
    assert(rr.recall > raw.recall,
      s"re-rank (${rr.recall}) must beat raw ADC (${raw.recall})")
  }

  test("raw-ADC PQ recall is measured, low, and documented — the " +
    "motivation for the rerank query") {
    val l = lines("q_sim_ann_pq_l2")
    // a floor only: the point of this line is that it EXISTS in the
    // artifact (quantization loss measured against PQ's own metric),
    // not that it is high
    assert(l.recall >= 0.10,
      s"pq l2 recall ${l.recall} (${l.hits}/${l.truthRows})")
  }

  test("neardup-topk finds a nonzero, pinned share of the full " +
    "cos>=0.4 truth (its sector code targets the near-duplicate band)") {
    val l = lines("q_sim_neardup_topk")
    assert(l.truthRows > 0, "no truth edges at the fixture scale — probe broken")
    assert(l.recall >= 0.09,
      s"neardup recall ${l.recall} (${l.hits}/${l.truthRows})")
  }
}
