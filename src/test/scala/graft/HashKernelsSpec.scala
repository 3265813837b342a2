package graft

import graft.functions.{GraftFunctions, HashKernels}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the native kernels must compute exactly what the
  * pure-SQL compositions (and therefore the DuckDB oracles) compute —
  * the same trusted-oracle pattern as the reference's function_test
  * (tests/helpers.py:4-18). */
class HashKernelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "one two",          // < 3 words → empty minhash
    "spark data batch hash sort value filter big dup group line",
    "short",
    "x y z x y z x y z")

  test("md5hex matches Spark md5()") {
    import spark.implicits._
    val got = samples.toDF("t")
      .select(md5(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == samples.map(HashKernels.md5hex))
  }

  test("simhash64 kernel == HOF-composed simhash") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples.toDF("text")
      .withColumn("hs", expr("transform(split(text, ' '), w -> md5(w))"))
      .withColumn("votes", expr(
        """transform(sequence(0, 63), b ->
          |  aggregate(hs, CAST(0 AS BIGINT), (acc, h) -> acc +
          |    CASE WHEN (CAST(conv(substring(h, CAST(b div 4 AS INT) + 1, 1),
          |                        16, 10) AS BIGINT)
          |               div shiftleft(CAST(1 AS BIGINT), CAST(b % 4 AS INT)))
          |              % 2 = 1 THEN 1 ELSE -1 END))""".stripMargin))
      .select(col("text"),
        expr("""aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) ->
               |  acc + CASE WHEN votes[b] >= 0
               |  THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))
               |  ELSE 0 END)""".stripMargin).as("lo_sql"),
        expr("""aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) ->
               |  acc + CASE WHEN votes[b + 32] >= 0
               |  THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))
               |  ELSE 0 END)""".stripMargin).as("hi_sql"),
        expr("simhash64(text)").as("k"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("lo_sql") ==
        r.getAs[org.apache.spark.sql.Row]("k").getAs[Long]("sim_lo"),
        s"lo mismatch for '${r.getString(0)}'")
      assert(r.getAs[Long]("hi_sql") ==
        r.getAs[org.apache.spark.sql.Row]("k").getAs[Long]("sim_hi"),
        s"hi mismatch for '${r.getString(0)}'")
    }
  }

  test("minhash_doc kernel == HOF-composed shingles/signature/bands") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples.toDF("text")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("sh_sql",
        when(size(col("ws")) >= 3, expr(
          "array_distinct(transform(sequence(0, size(ws) - 3)," +
            " i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .withColumn("mhs", expr(
        "transform(sequence(0, 7), k -> array_min(transform(sh_sql," +
          " x -> md5(concat(CAST(k AS STRING), ':', x)))))"))
      .withColumn("bkeys_sql",
        when(size(col("sh_sql")) > 0, expr(
          "transform(sequence(0, 3), j -> md5(concat(CAST(j AS STRING)," +
            " '|', mhs[2*j], '|', mhs[2*j+1])))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .withColumn("k", expr("minhash_doc(text)"))
    df.collect().foreach { r =>
      val k = r.getAs[org.apache.spark.sql.Row]("k")
      assert(r.getAs[scala.collection.Seq[String]]("sh_sql").toSeq ==
        k.getAs[scala.collection.Seq[String]]("sh").toSeq)
      assert(r.getAs[scala.collection.Seq[String]]("bkeys_sql").toSeq ==
        k.getAs[scala.collection.Seq[String]]("bkeys").toSeq)
    }
  }

  test("min_fingerprint kernel == HOF-composed 8-gram min") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples.toDF("text").select(
      expr("array_min(transform(sequence(1, greatest(length(text) - 7, 1))," +
        " i -> md5(substring(text, i, 8))))").as("sql"),
      expr("min_fingerprint(text)").as("k"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("min_fingerprint fast paths agree across pure-ASCII / BMP / " +
    "non-BMP inputs (r10 zero-alloc ASCII loop)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val extra = Seq(
      "pure ascii text long enough for many eight char windows",
      "café déjà vu accented BMP text with windows",
      "emoji 😀😀 non-BMP windows 😀 in extended text",
      "1234567", // < 8 chars: md5 of the whole text
      "12345678", // exactly one window
      "éshort") // < 8 chars, non-ASCII
    // Spark's substring/length count code points, same as the kernel
    val df = extra.toDF("text").select(
      expr("array_min(transform(sequence(1, greatest(length(text) - 7, 1))," +
        " i -> md5(substring(text, i, 8))))").as("sql"),
      expr("min_fingerprint(text)").as("k"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("ngram5_count / ngram5_packed / ngram3_set match HOF-composed forms") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples.toDF("text").select(
      expr("size(array_distinct(transform(sequence(1, greatest(length(text) - 4, 1))," +
        " i -> substring(text, i, 5))))").as("n_sql"),
      expr("ngram5_count(text)").as("n_k"),
      expr("size(ngram5_packed(text))").as("n_packed"),
      expr("array_sort(array_distinct(transform(sequence(1, greatest(length(text) - 2, 1))," +
        " i -> substring(text, i, 3))))").as("g3_sql"),
      expr("array_sort(ngram3_set(text))").as("g3_k"))
    df.collect().foreach { r =>
      assert(r.getAs[Int]("n_sql") == r.getAs[Int]("n_k"))
      // packing is injective on this corpus → same distinct count
      assert(r.getAs[Int]("n_sql") == r.getAs[Int]("n_packed"))
      assert(r.getAs[scala.collection.Seq[String]]("g3_sql").toSeq ==
        r.getAs[scala.collection.Seq[String]]("g3_k").toSeq)
    }
  }

  test("ngram8_packed pinned values: ASCII pack, short-gram length " +
    "flag, empty-text 2^61 sentinel, and the non-ASCII md5 fallback " +
    "(the dedupNgramDfSql oracle mirrors exactly these — ADVICE r16)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // independently derived (python hashlib mirror of the contract):
    // 'abcdefgh' -> 7-bit little-endian pack; 'abc' -> pack | 3<<56 |
    // 1<<61; '' -> bare 1<<61; non-ASCII -> first 8 md5 bytes | bit 63
    val expect = Map(
      "abcdefgh" -> 59003325963104609L,
      "abc" -> 2522015791329112417L,
      "" -> 2305843009213693952L,
      "ñé中abcde" -> -1718411569919223735L)
    val got = expect.keys.toSeq.toDF("text")
      .select(col("text"), expr("ngram8_packed(text)").as("g8"))
      .collect()
      .map(r => r.getAs[String]("text") ->
        r.getAs[scala.collection.Seq[Long]]("g8").toSeq).toMap
    expect.foreach { case (t, v) =>
      assert(got(t) == Seq(v), s"ngram8_packed('$t')")
    }
  }

  test("sortedIntersectAtLeast: exact count when the bound is met, " +
    "-1 otherwise — differential vs the full walk over random arrays") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val a = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
        .distinct.sorted
      val b = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
        .distinct.sorted
      val needed = rnd.nextInt(30)
      val full = graft.functions.HashKernels.sortedIntersectCount(a, b)
      val got = graft.functions.HashKernels
        .sortedIntersectAtLeast(a, b, needed)
      if (full >= needed) assert(got == full, s"needed=$needed full=$full")
      else assert(got == -1, s"needed=$needed full=$full got=$got")
    }
  }

  test("ngram_close_pairs kernel == the per-pair join form (size " +
    "prefilter + merge-walk + J >= 0.5) on a mixed block") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // a block of near-identical docs + unrelated docs: the kernel must
    // emit exactly the pairs the explicit pair-join computes
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedl!"),
      (3L, "entirely different content with no shared grams at all!"),
      (4L, "the quick brown fox jumps over the lazy dog repeated"),
      (5L, "short doc"))
    val g = docs.toDF("doc_id", "text")
      .select(col("doc_id"), expr("ngram5_packed(text)").as("grams"))
    val kernel = g.agg(collect_list(struct(col("doc_id"), col("grams")))
        .as("members"))
      .select(explode(expr("ngram_close_pairs(members)")).as("p"))
      .select("p.d1", "p.d2", "p.ni", "p.den")
      .collect().map(_.toString).toSet
    val g1 = g.select(col("doc_id").as("d1"), col("grams").as("g1"))
    val g2 = g.select(col("doc_id").as("d2"), col("grams").as("g2"))
    val joined = g1.crossJoin(g2).where(col("d1") < col("d2"))
      .withColumn("na", size(col("g1"))).withColumn("nb", size(col("g2")))
      .where(least(col("na"), col("nb")) * 3 >= col("na") + col("nb"))
      .withColumn("ni", expr("sorted_intersect_count(g1, g2)"))
      .where(col("ni") * 3 >= col("na") + col("nb"))
      .select(col("d1"), col("d2"), col("ni").cast("long"),
        (col("na") + col("nb") - col("ni")).cast("long").as("den"))
      .collect().map(_.toString).toSet
    assert(kernel == joined, s"kernel=$kernel joined=$joined")
    assert(kernel.nonEmpty, "fixture produced no close pairs")
  }

  test("sorted_intersect_count == size(array_intersect) on packed grams") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val pairs = for (a <- samples; b <- samples) yield (a, b)
    val df = pairs.toDF("a", "b").select(
      expr("sorted_intersect_count(ngram5_packed(a), ngram5_packed(b))")
        .as("k"),
      expr("size(array_intersect(" +
        "array_distinct(transform(sequence(1, greatest(length(a) - 4, 1)), i -> substring(a, i, 5)))," +
        "array_distinct(transform(sequence(1, greatest(length(b) - 4, 1)), i -> substring(b, i, 5)))))")
        .as("sql"))
    df.collect().foreach(r =>
      assert(r.getAs[Int]("k") == r.getAs[Int]("sql")))
  }

  test("dot_scaled == HOF-composed scaled-integer dot; lsh16_code " +
    "bits match per-plane signs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vs = Seq(
      (Seq(0.25, -0.75, 1.5, 0.125), Seq(-1.0, 0.5, 0.25, 2.0)),
      (Seq(1e-7, -1e-7, 0.0, 3.25), Seq(0.5, 0.5, 0.5, 0.5)))
    val df = vs.toDF("a", "b").select(
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(round(x * y * 1e12, 0) AS BIGINT))," +
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("sql"),
      expr("dot_scaled(a, b)").as("k"),
      expr("lsh16_code(a)").as("code"),
      expr("""aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, p) ->
        |  acc + CASE WHEN
        |    aggregate(zip_with(a,
        |        transform(sequence(1, size(a)), i -> sin(p * 997 + i * 31)),
        |        (x, y) -> CAST(round(x * y * 1e12, 0) AS BIGINT)),
        |      CAST(0 AS BIGINT), (q, w) -> q + w) > 0
        |    THEN shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))
        |    ELSE 0 END)""".stripMargin).as("code_sql"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("sql") == r.getAs[Long]("k"))
      assert(r.getAs[Long]("code") == r.getAs[Long]("code_sql"))
    }
  }

  test("rep_stats: hand-computed counters incl. split-on-space " +
    "empties, single word, saturation and non-BMP text") {
    import org.apache.spark.unsafe.types.UTF8String
    def rs(t: String): (Long, Long, Long, Long) = {
      val r = HashKernels.repStats(UTF8String.fromString(t))
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // 6 words, 3 distinct, 'a' ×3, bigram "a b" ×2
    assert(rs("a b a b a c") == (6L, 3L, 3L, 2L))
    // single word: no bigrams
    assert(rs("hello") == (1L, 1L, 1L, 0L))
    // empty string splits to one empty token (split(text,' ') parity)
    assert(rs("") == (1L, 1L, 1L, 0L))
    // consecutive spaces produce empty tokens, like split/string_split
    assert(rs("a  b") == (3L, 3L, 1L, 1L))
    // fully repeated: top word == nw, top bigram == nw-1
    assert(rs("x x x x") == (4L, 1L, 4L, 3L))
    // non-BMP (surrogate pairs) are opaque token content — counts are
    // word-level, so code-unit vs code-point indexing cannot differ
    assert(rs("😀 😀 y") == (3L, 2L, 2L, 1L))
  }

  test("rep_stats expression matches an explode+groupBy SQL twin") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = samples.toDF("t")
    val k = docs.select(expr("rep_stats(t)").as("r"))
      .select(col("r.nw"), col("r.ndw"), col("r.topw"), col("r.topbg"))
      .collect().map(_.toString).toSeq
    val sql = docs.select(
      size(split(col("t"), " ")).cast("long").as("nw"),
      size(array_distinct(split(col("t"), " "))).cast("long").as("ndw"),
      expr("array_max(transform(array_distinct(split(t, ' ')), w -> " +
        "size(filter(split(t, ' '), x -> x = w))))").cast("long")
        .as("topw"),
      expr("CASE WHEN size(split(t, ' ')) < 2 THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(array_max(transform(array_distinct(" +
        "transform(sequence(1, size(split(t, ' ')) - 1), i -> " +
        "concat(element_at(split(t, ' '), i), ' ', " +
        "element_at(split(t, ' '), i + 1)))), b -> " +
        "size(filter(transform(sequence(1, size(split(t, ' ')) - 1), " +
        "i -> concat(element_at(split(t, ' '), i), ' ', " +
        "element_at(split(t, ' '), i + 1))), x -> x = b)))) AS BIGINT) " +
        "END").as("topbg"))
      .collect().map(_.toString).toSeq
    assert(k == sql)
  }

  test("lsh_code(emb, 16) == lsh16_code(emb); wider codes refine the " +
    "same hyperplane prefix (monotone bit agreement)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vecs = (0 until 20).map { k =>
      (k.toLong, (1 to 8).map(i => math.sin(k * 13 + i) * 2).toArray)
    }.toDF("id", "emb")
    val both = vecs.selectExpr("lsh16_code(emb) AS a",
      "lsh_code(emb, 16) AS b", "lsh_code(emb, 24) AS c").collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      // prefix property: the low 16 bits of the 24-bit code ARE the
      // 16-bit code - wider codes only add hyperplanes
      assert((r.getLong(2) & ((1L << 16) - 1)) == r.getLong(0))
    }
    // plan-time validation: bits must be a literal in range
    val e = intercept[Exception] {
      vecs.selectExpr("lsh_code(emb, 99)").collect()
    }
    assert(e.getMessage.contains("[1, 63]") ||
      e.getMessage.contains("bits"))
  }

  test("near-dup output at wider codes is a subset of the 16-bit " +
    "output (prefix-extensible candidates)") {
    val base = sim.SimQueries.simNeardupLsh(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSet
    val wide = sim.SimQueries
      .simNeardupLshAt(spark, SparkTestBase.sf, bits = 24)
      .collect().map(_.toString).toSet
    assert(wide.subsetOf(base),
      s"${(wide -- base).size} pairs at 24 bits missing from 16-bit set")
  }

  test("minhash_doc_banded(8, 2) == minhash_doc; wider bands give a " +
    "subset of verified near-dup pairs (aligned-band property)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples.toDF("t")
    val both = df.selectExpr("minhash_doc(t) AS a",
      "minhash_doc_banded(t, 8, 2) AS b").collect()
    both.foreach(r => assert(r.get(0) == r.get(1)))
    // query-level: (8, 4) verified output is a subset of (8, 2)
    val base = text.TextQueries.dedupMinhash(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSet
    val wide = text.TextQueries
      .dedupMinhashAt(spark, SparkTestBase.sf, seeds = 8, rowsPerBand = 4)
      .collect().map(_.toString).toSet
    assert(wide.subsetOf(base),
      s"${(wide -- base).size} pairs at rows_per_band=4 missing from 2")
    // plan-time validation
    val e = intercept[Exception] {
      df.selectExpr("minhash_doc_banded(t, 8, 3)").collect()
    }
    assert(e.getMessage.contains("divide"))
  }

  test("dedupSimhashAt(8) is row-identical to the registered query " +
    "(both pigeonhole-exhaustive); tighter thresholds give subsets") {
    val base = text.TextQueries.dedupSimhash(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSet
    val at8 = text.TextQueries
      .dedupSimhashAt(spark, SparkTestBase.sf, maxHamming = 8)
      .collect().map(_.toString).toSet
    assert(at8 == base,
      s"${(at8 -- base).size} extra / ${(base -- at8).size} missing")
    val at4 = text.TextQueries
      .dedupSimhashAt(spark, SparkTestBase.sf, maxHamming = 4)
      .collect().map(_.toString).toSet
    assert(at4.subsetOf(base))
    // h=0 (exact-signature duplicates): the single 64-bit band
    // straddles both halves — regression for the ANSI Long-overflow
    // in the straddling-band assembly (must not throw)
    val at0 = text.TextQueries
      .dedupSimhashAt(spark, SparkTestBase.sf, maxHamming = 0)
      .collect().map(_.toString).toSet
    assert(at0.subsetOf(at4))
  }

  test("spanDedupAt(5) == registered query; longer spans remove " +
    "strictly less text per document (monotonicity)") {
    val base = text.TextQueries.spanDedup(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSet
    val at5 = text.TextQueries.spanDedupAt(spark, SparkTestBase.sf, 5)
      .collect().map(_.toString).toSet
    assert(at5 == base)
    val kept5 = text.TextQueries.spanDedup(spark, SparkTestBase.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val kept8 = text.TextQueries.spanDedupAt(spark, SparkTestBase.sf, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept5.keySet == kept8.keySet)
    kept5.foreach { case (doc, k5) =>
      assert(k5 <= kept8(doc),
        s"doc $doc kept $k5 tokens at span=5 but ${kept8(doc)} at span=8")
    }
  }

  test("dedupSemanticAt(0.4) == registered query; a higher threshold " +
    "refines the groups (every tau=0.7 group sits inside a tau=0.4 group)") {
    val base = sim.SimQueries.dedupSemantic(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSet
    val at04 = sim.SimQueries.dedupSemanticAt(spark, SparkTestBase.sf, 0.4)
      .collect().map(_.toString).toSet
    assert(at04 == base)
    val rep04 = sim.SimQueries.dedupSemantic(spark, SparkTestBase.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rep07 = sim.SimQueries.dedupSemanticAt(spark, SparkTestBase.sf, 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // refinement: two vectors grouped at 0.7 must be grouped at 0.4
    rep07.keys.foreach { v =>
      val peers07 = rep07.filter(_._2 == rep07(v)).keySet
      val peers04 = rep04.filter(_._2 == rep04(v)).keySet
      assert(peers07.subsetOf(peers04),
        s"vec $v: tau=0.7 group not contained in its tau=0.4 group")
    }
  }

  test("q_dedup_semantic_scaled == q_dedup_semantic below the ivfK " +
    "floor (n <= 1024 => K = 16, the shared fixed fit — the scaled " +
    "tier's bit-identical-at-small-n claim, pinned)") {
    // SparkTestBase.sf is sf0.001 (50 vectors), deep under the floor:
    // kmeansScaledShared resolves to the SAME shared K=16 artifact,
    // so the two registered queries must agree row-for-row
    val fixed = sim.SimQueries.dedupSemantic(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSeq
    val scaled = sim.SimQueries.dedupSemanticScaled(spark, SparkTestBase.sf)
      .collect().map(_.toString).toSeq
    assert(scaled == fixed)
  }
}
