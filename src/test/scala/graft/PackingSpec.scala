package graft

import org.scalatest.funsuite.AnyFunSuite

/** Greedy non-straddling packing semantics (q_seq_pack_greedy) against
  * a straightforward in-test reference packer, plus the invariants
  * that distinguish it from q_seq_pack's concat-then-chunk convention. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val cap = 2048L

  test("greedy packing never straddles, resets capacity at boundaries " +
    "and matches a sequential reference packer per group") {
    val df = text.TextQueries.seqPackGreedy(spark, SparkTestBase.sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // reference: first-fit sequential per group in doc_id order
    rows.groupBy(_._2).foreach { case (_, g) =>
      var seq = 0L; var used = 0L
      g.sortBy(_._1).foreach { case (doc, _, n, gotSeq, gotOff) =>
        if (used > 0 && used + n > cap) { seq += 1; used = 0 }
        assert(gotSeq == seq && gotOff == used,
          s"doc $doc: got (seq=$gotSeq, off=$gotOff), " +
            s"want (seq=$seq, off=$used)")
        used += n
      }
    }
    // non-straddling invariant: a doc fits its sequence unless it is
    // alone in it (over-capacity doc at offset 0)
    rows.foreach { case (doc, _, n, _, off) =>
      assert(off + n <= cap || off == 0L,
        s"doc $doc straddles: offset $off + $n tokens > $cap")
    }
    // exercise the reset recurrence for sure: with ONE group the whole
    // corpus packs sequentially, so boundaries must occur (and the
    // reference packer must still agree)
    val one = text.TextQueries
      .seqPackGreedyGrouped(spark, SparkTestBase.sf, groups = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(one.exists(_._3 > 0L), "one-group packing never crossed cap")
    var seq = 0L; var used = 0L
    one.sortBy(_._1).foreach { case (doc, n, gotSeq, gotOff) =>
      if (used > 0 && used + n > cap) { seq += 1; used = 0 }
      assert(gotSeq == seq && gotOff == used, s"one-group doc $doc")
      used += n
    }
  }

  test("groups parameter scales packing parallelism (distinct grp " +
    "count) without changing per-group semantics") {
    val df = text.TextQueries
      .seqPackGreedyGrouped(spark, SparkTestBase.sf, groups = 7)
    val grps = df.select("grp").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(grps == (0L until 7L))
    val e = intercept[IllegalArgumentException] {
      text.TextQueries.seqPackGreedyGrouped(spark, SparkTestBase.sf, 0)
    }
    assert(e.getMessage.contains("groups"))
  }
}
