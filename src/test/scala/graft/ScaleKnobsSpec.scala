package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Tag for the 10× scale assertions (documentation + filtering). */
object ScaleTest extends Tag("graft.ScaleTest")

/** Scale-invariant correctness at ~sf1 (10× sf0.1): the knob
  * subset/monotonicity properties that HashKernelsSpec pins at
  * sf0.001 re-asserted on the 10× replica, so a knob whose
  * correctness argument silently depends on data scale (candidate
  * growth, band straddling, code-width prefixing) is caught.
  *
  * OPT-IN: the replica is ~1 GB and takes minutes to build + query,
  * so the suite cancels unless GRAFT_SCALE_TESTS=1 is set (run:
  * `GRAFT_SCALE_TESTS=1 sbt "testOnly graft.ScaleKnobsSpec"`).
  * The 10× data is generated on first use by [[tools.ScaleTestdata]]
  * into /tmp/graft_sf1 (key-consistent replication, per-copy text
  * translation and embedding rotation — see its scaladoc for why
  * verbatim copies would fake quadratic near-dup groups). */
class ScaleKnobsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val sf1 = "/tmp/graft_sf1"

  private def optIn(): Unit = {
    assume(sys.env.get("GRAFT_SCALE_TESTS").contains("1"),
      "set GRAFT_SCALE_TESTS=1 to run the 10x scale suite")
    if (!graft.sources.FsIO.exists(s"$sf1/_GRAFT_SCALE_OK"))
      tools.ScaleTestdata.generate(spark, "/root/testdata/sf0.1", sf1, 10)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("10x: embedding near-dup at 24-bit codes is a subset of the " +
    "16-bit output (prefix-extensible candidates)", ScaleTest) {
    optIn()
    val base = pairSet(sim.SimQueries.simNeardupLsh(spark, sf1))
    val wide = pairSet(sim.SimQueries.simNeardupLshAt(spark, sf1,
      bits = 24))
    assert(base.nonEmpty, "10x corpus produced no near-dup pairs")
    assert(wide.subsetOf(base),
      s"${(wide -- base).size} pairs at 24 bits missing from 16-bit set")
  }

  test("10x: minhash rows_per_band=4 verified pairs are a subset of " +
    "rows_per_band=2 (aligned-band property)", ScaleTest) {
    optIn()
    val base = pairSet(text.TextQueries.dedupMinhash(spark, sf1))
    val wide = pairSet(text.TextQueries.dedupMinhashAt(spark, sf1,
      seeds = 8, rowsPerBand = 4))
    assert(base.nonEmpty)
    assert(wide.subsetOf(base),
      s"${(wide -- base).size} pairs at rows_per_band=4 missing from 2")
  }

  test("10x: simhash maxHamming=8 equals the registered query; " +
    "tighter thresholds give subsets down to h=0", ScaleTest) {
    optIn()
    val base = pairSet(text.TextQueries.dedupSimhash(spark, sf1))
    val at8 = pairSet(text.TextQueries.dedupSimhashAt(spark, sf1,
      maxHamming = 8))
    assert(at8 == base,
      s"${(at8 -- base).size} extra / ${(base -- at8).size} missing")
    val at4 = pairSet(text.TextQueries.dedupSimhashAt(spark, sf1,
      maxHamming = 4))
    assert(at4.subsetOf(base))
    val at0 = pairSet(text.TextQueries.dedupSimhashAt(spark, sf1,
      maxHamming = 0))
    assert(at0.subsetOf(at4))
  }

  test("10x: longer span-dedup spans remove no more text per doc " +
    "(monotonicity)", ScaleTest) {
    optIn()
    val kept5 = text.TextQueries.spanDedup(spark, sf1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val kept8 = text.TextQueries.spanDedupAt(spark, sf1, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept5.keySet == kept8.keySet)
    kept5.foreach { case (doc, k5) =>
      assert(kept8(doc) >= k5,
        s"doc $doc keeps less text with LONGER spans (8: ${kept8(doc)}" +
          s" < 5: $k5)")
    }
  }
}
