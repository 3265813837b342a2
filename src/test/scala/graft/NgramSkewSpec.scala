package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Skew-resilience proof for the two-stage ngram dedup plan
  * (TextQueries.dedupNgram; VERDICT r2 stretch ask): a planted corpus
  * where one (fingerprint, length-bucket) block is HOT — hundreds of
  * documents share the blocking key without being near-duplicates — so
  * the key-only candidate join must absorb a quadratic block. The
  * two-stage shape holds because the hot block costs integer compares
  * and long merge-walks (~40 bytes/doc keys, grams fetched once per
  * candidate doc), not shuffled gram arrays; the single-stage plan this
  * replaced shipped the full arrays through the self-join and died
  * exactly here (87 s at sf0.1, ROUND_NOTES r1).
  *
  * Construction: every hot-block doc carries one shared "magic" 8-gram
  * pre-searched to have a near-minimal md5 among 20k candidates — it
  * pins min_fingerprint for every doc containing it (the ~500 random
  * grams of a doc each beat it with probability ≈ 1/20000), no matter
  * how different the rest of the text is — plus 470 chars of per-doc
  * LCG filler (kills Jaccard: ≈25 shared grams out of ~950, « 0.5).
  * All lengths sit in one floor(len/100) bucket. Planted true near-dup
  * pairs carry the same magic gram (same hot block, worst case) and
  * must be EXACTLY the output.
  */
class NgramSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val HotDocs = 400

  /** Deterministic lowercase filler, seeded per doc. */
  private def filler(seed: Long, n: Int): String = {
    var s = seed * 6364136223846793005L + 1442695040888963407L
    val b = new StringBuilder(n)
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      b.append(('a' + ((s >>> 33) % 26)).toChar)
      i += 1
    }
    b.toString
  }

  /** 8-char gram with the minimal md5 among 20k deterministic
    * candidates — any doc containing it min-fingerprints to it with
    * high probability. */
  private lazy val magic: String =
    (0 until 20000).map(i => f"zq$i%06d")
      .minBy(graft.functions.HashKernels.md5hex)

  private lazy val dir: String = {
    // hot block: doc_id 0..HotDocs-1, shared magic gram + unique filler
    val hot = (0 until HotDocs).map { i =>
      (i.toLong, magic + " " + filler(i + 7, 470))
    }
    // true near-dup pairs, in the SAME hot block (same magic gram):
    // identical 460-char body + a tiny tail edit (jaccard » 0.5)
    val dups = (0 until 5).flatMap { p =>
      val body = magic + " " + filler(1000 + p, 460)
      Seq((1000L + 2 * p, body + " alpha tail"),
        (1001L + 2 * p, body + " omega tail"))
    }
    // singletons: unique everything, never in a candidate pair
    val lone = (0 until 50).map(i => (2000L + i, filler(5000 + i, 490)))
    val d = Files.createTempDirectory("ngramskew").toString
    import spark.implicits._
    (hot ++ dups ++ lone).toDF("doc_id", "text")
      .coalesce(2)
      .write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  test("hot fingerprint block: the blocking key really is skewed") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val keys = spark.read.parquet(s"$dir/documents.parquet")
      .select(expr("min_fingerprint(text)").as("fp"),
        floor(length(col("text")) / 100).as("lenb"))
      .groupBy("fp", "lenb").count()
    val hottest = keys.orderBy(col("count").desc).collect()(0).getAs[Long]("count")
    // the shared core must funnel most hot docs into ONE block
    assert(hottest > HotDocs / 2,
      s"hot block only $hottest of $HotDocs — fixture broken")
  }

  test("two-stage plan absorbs the hot block and emits exactly the " +
    "planted near-dups") {
    val t0 = System.nanoTime()
    val out = SparkEntry.queries("q_dedup_ngram")(spark, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val got = out.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val want = (0 until 5)
      .map(p => (1000L + 2 * p, 1001L + 2 * p)).toSet
    assert(got == want, s"got=$got want=$want")
    out.foreach(r => assert(r.getAs[Double]("jaccard") > 0.5))
    // the hot block forces ~80k key-pair compares through the candidate
    // join; the bound below fails loudly if the plan ever regresses to
    // shipping gram arrays through the blocked self-join again (the r1
    // single-stage plan was 30x slower on corpora 40x this size)
    assert(secs < 60.0, s"hot-block dedup took ${secs}s — plan regressed?")
  }

  test("hot-fp-block guard: the segmented gather plan is " +
    "row-identical to the unsegmented plan when the cap is blown") {
    import graft.text.TextQueries
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    // cap 64 « the 410-doc hot block → the guarded branch must fire;
    // the max-block probe memo is a cap-independent statistic, so the
    // two invocations sharing it cannot affect plan OUTPUT, only the
    // branch taken per cap
    val plain = rows(TextQueries.dedupNgramAt(spark, dir,
      blockCap = Int.MaxValue))
    val guarded = rows(TextQueries.dedupNgramAt(spark, dir,
      blockCap = 64))
    assert(plain.nonEmpty, "fixture produced no near-dup rows at all")
    assert(guarded == plain,
      s"segmented plan diverged:\n plain=$plain\n guarded=$guarded")
  }
}
