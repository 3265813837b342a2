package graft

import org.scalatest.funsuite.AnyFunSuite

/** Classifier-quality lower bounds for the text-dedup tiers (VERDICT
  * r15 next #2): the oracle gate proves each tier matches its own
  * DEFINITION; DedupQualityProbe plants known near-duplicates and
  * grades what each tier actually catches. This spec pins the
  * fixture-scale rates so a plan change that silently guts candidate
  * generation (broken bands, a blocking key that stopped matching, a
  * kernel threshold drift) fails a test instead of only moving the
  * committed DEDUP_QUALITY.json. All plants are deterministic, so
  * the rates are exact reproducible numbers; bounds sit under the
  * measured values (sf0.001: see DEDUP_QUALITY.json) only to survive
  * driver-side testdata regeneration, not noise. */
class DedupQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private lazy val (lines, dial) = {
    val (ls, dl) = graft.tools.DedupQualityProbe
      .probe(spark, sf, "/tmp/graft_dedupq_spec")
    (ls.map(l => l.tier -> l).toMap, dl)
  }

  private def rate(tier: String, typ: String): Double = {
    val (_, e, h) = lines(tier).det.find(_._1 == typ)
      .getOrElse(fail(s"$tier has no $typ detection line"))
    if (e == 0) fail(s"$tier/$typ planted nothing") else h.toDouble / e
  }
  private def pr(tier: String): (Double, Double) = {
    val (t, f, tp) = lines(tier).truth
      .getOrElse(fail(s"$tier has no truth P/R"))
    assert(t > 0, s"$tier truth is empty — plants invisible to probe")
    (if (f == 0) 1.0 else tp.toDouble / f, tp.toDouble / t)
  }

  test("exact copies are caught by every content tier") {
    assert(rate("exact", "copy") == 1.0)
    assert(rate("minhash", "copy") == 1.0)
    assert(rate("simhash", "copy") == 1.0)
    assert(rate("ngram", "copy") == 1.0)
  }

  test("minhash: exact verify ⇒ precision 1.0; banding loses almost " +
    "nothing vs the exact J≥0.8 truth at fixture density") {
    val (p, r) = pr("minhash")
    assert(p == 1.0, s"minhash precision $p — the verify stage leaked")
    assert(r >= 0.95, s"minhash recall $r — LSH bands lost real pairs")
    assert(rate("minhash", "tail_chrome") >= 0.9)
    assert(rate("minhash", "shuffle_half") >= 0.9)
  }

  test("simhash: 9-band pigeonhole cover is exhaustive at hamming ≤ 8 " +
    "— precision AND recall 1.0 vs the all-pairs truth") {
    val (p, r) = pr("simhash")
    assert(p == 1.0, s"simhash precision $p")
    assert(r == 1.0, s"simhash recall $r — the exhaustive cover broke")
    // the signature is bag-of-words-weighted: reordering is invisible,
    // small edits are small bit flips
    assert(rate("simhash", "shuffle_half") == 1.0)
    assert(rate("simhash", "word_swap") >= 0.9)
  }

  test("ngram: exact kernel verify ⇒ precision 1.0; the (fp, lenb) " +
    "blocking loss is real, measured, and bounded") {
    val (p, r) = pr("ngram")
    assert(p == 1.0, s"ngram precision $p — kernel verify leaked")
    assert(r >= 0.6, s"ngram recall $r — blocking lost more than the " +
      "measured fixture loss")
    assert(r < 1.0, s"ngram recall $r — if blocking suddenly became " +
      "lossless the probe stopped exercising it (plant drift)")
  }

  test("the DF-filtered ngram tier: nothing planted is hot at fixture " +
    "density, so detection must match or beat the unfiltered tier " +
    "(the 2-band hashed block key beats the raw min-8-gram key on " +
    "token-swap plants)") {
    assert(rate("ngram_df", "copy") == 1.0)
    assert(rate("ngram_df", "tail_chrome") >= rate("ngram", "tail_chrome"),
      "the DF variant lost chrome plants the base tier catches — " +
        "the filter fired on sub-threshold content or a band broke")
    assert(rate("ngram_df", "word_swap") >= 0.9)
    assert(rate("ngram_df", "shuffle_half") >= 0.9)
  }

  test("the DF-filtered ngram tier vs ITS OWN brute-forced truth " +
    "(de-chromed J≥0.5, corpus-wide hot census — VERDICT r16 #1): " +
    "exact kernel verify ⇒ precision 1.0; blocking loss bounded") {
    val (p, r) = pr("ngram_df")
    assert(p == 1.0, s"ngram_df precision $p — de-chromed verify " +
      "diverged from the truth predicate")
    assert(r >= 0.6, s"ngram_df recall $r — the (lenb, two-band fp) " +
      "blocking lost more than the measured fixture loss")
  }

  test("minhash shingle dial (VERDICT r16 #4): k=2 lifts word_swap " +
    "over the J≥0.8 bar (J ≈ 23/27 vs 22/28 at k=3) at a measured " +
    "pair-volume cost; copy stays 1.0 at every setting") {
    def at(k: Int, seeds: Int) = dial
      .find(d => d.shingleK == k && d.seeds == seeds)
      .getOrElse(fail(s"no dial line (k=$k, seeds=$seeds)"))
    def drate(l: graft.tools.DedupQualityProbe.DialLine, typ: String) = {
      val (_, e, h) = l.det.find(_._1 == typ)
        .getOrElse(fail(s"dial has no $typ line"))
      if (e == 0) fail(s"dial/$typ planted nothing")
      else h.toDouble / e
    }
    for (l <- dial) assert(drate(l, "copy") == 1.0,
      s"(k=${l.shingleK}, seeds=${l.seeds}) lost exact copies")
    // the dial's point: the small-edit plant crosses the verify bar
    assert(drate(at(2, 8), "word_swap") >= 0.9,
      "k=2 no longer catches word_swap — the shingle arithmetic moved")
    assert(drate(at(3, 8), "word_swap") <= 0.5,
      "k=3 suddenly catches word_swap — plant or threshold drift")
    // more bands never lose pairs: bands are ALIGNED prefixes of the
    // seed sequence, so the 16-seed candidate set is a superset of
    // the 8-seed one at the same predicate (a theorem, not a trend)
    assert(at(2, 16).pairs >= at(2, 8).pairs)
    assert(at(3, 16).pairs >= at(3, 8).pairs)
  }

  test("paraphrase and span-quote plants are invisible to every " +
    "n-gram/signature tier — the honest lines that motivate the " +
    "semantic and span tiers") {
    for (tier <- Seq("minhash", "simhash", "ngram", "ngram_df")) {
      assert(rate(tier, "paraphrase") == 0.0,
        s"$tier claims to catch paraphrases — plant broken or " +
          "threshold collapsed")
      assert(rate(tier, "span_copy") == 0.0,
        s"$tier fires on a 10-word quote inside unique filler — " +
          "precision collapsed")
    }
  }

  test("the span tier removes the planted duplicated span; the " +
    "semantic tier groups the nudged embedding with its source") {
    assert(rate("span", "span_copy") == 1.0)
    assert(rate("semantic", "embed_nudge") >= 0.9)
  }

  test("the registered k=2 dial (q_dedup_minhash_k2) closes the " +
    "word_swap blind spot with exact-verify precision vs its OWN " +
    "word-2-gram truth (VERDICT r17 next #2)") {
    val (p, r) = pr("minhash_k2")
    assert(p == 1.0, s"minhash_k2 precision $p — verify leaked")
    assert(r >= 0.95, s"minhash_k2 recall $r — banding lost pairs")
    assert(rate("minhash_k2", "copy") == 1.0)
    assert(rate("minhash_k2", "word_swap") >= 0.9,
      "the dial's whole point — word_swap over the J≥0.8 bar at k=2")
  }

  test("the de-chromed k=2 tier (q_dedup_minhash_df) keeps the dial's " +
    "word_swap recall with exact-verify precision vs its OWN " +
    "de-chromed truth (VERDICT r19 next #1)") {
    val (p, r) = pr("minhash_df")
    assert(p == 1.0, s"minhash_df precision $p — verify leaked")
    assert(r >= 0.95, s"minhash_df recall $r — banding lost pairs")
    assert(rate("minhash_df", "copy") == 1.0)
    assert(rate("minhash_df", "word_swap") >= 0.9,
      "de-chroming must not cost the k2 dial's word_swap recall")
  }

  test("the composed pipeline dominates its constituent tiers per " +
    "plant type and covers the cross-tier blind spots (VERDICT r17 " +
    "next #1)") {
    // union edges can only merge MORE: every pair a constituent tier
    // reports shares a pipeline cluster, so per-type detection is >=
    // the tier's (a theorem for minhash/ngram_df; asserted on data)
    for (t <- Seq("copy", "tail_chrome", "word_swap", "shuffle_half")) {
      assert(rate("pipeline", t) >= rate("minhash", t),
        s"pipeline lost $t plants the minhash tier catches")
      assert(rate("pipeline", t) >= rate("ngram_df", t),
        s"pipeline lost $t plants the ngram_df tier catches")
    }
    assert(rate("pipeline", "copy") == 1.0)
    assert(rate("pipeline", "tail_chrome") == 1.0)
    // the two blind spots single text tiers measurably miss: the
    // k=3 minhash word_swap gap (covered here by ngram_df + the
    // semantic link) and paraphrase (covered ONLY by the aligned
    // semantic edges, cos ~ 0.958)
    assert(rate("pipeline", "word_swap") >= 0.9)
    assert(rate("pipeline", "paraphrase") >= 0.8,
      "the pipeline's semantic edges stopped catching paraphrases")
    // span removal on survivors, conditioned on the source surviving
    // (see pipelineLine scaladoc)
    assert(rate("pipeline", "span_copy") >= 0.9)
  }

  test("the semantic tier catches PARAPHRASE-correlated embeddings " +
    "(cosine ≈ 0.958) — the plant type every text tier measurably " +
    "misses (VERDICT r16 #1: the cross-tier coverage is a measured " +
    "row, not an assertion); sub-1.0 is the honest IVF cell-split " +
    "loss, on the record at 0.93/0.78 for sf0.1/10x") {
    assert(rate("semantic", "paraphrase") >= 0.6,
      "the semantic tier lost the paraphrase plants — cell assignment " +
        "or the correlated-plant construction drifted")
    assert(rate("semantic", "paraphrase") < 1.0 ||
      rate("semantic", "embed_nudge") == 1.0,
      "paraphrase plants group PERFECTLY while nudges do not — the " +
        "plant perturbation collapsed to a copy")
  }
}
