package graft.text

import graft.QueryDef
import graft.rel.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text pipeline operators over `documents` (north-star
  * surface, BASELINE.json): exact dedup, MinHash+LSH near-dup, SimHash
  * near-dup, language-ID heuristic, quality scoring, token counting,
  * rolling-hash fingerprinting, per-language stats.
  *
  * Scale design: every pipeline is a chain of narrow projections +
  * keyed aggregations. The LSH candidate join is keyed on (band,
  * bucket-hash) — at 100 TB that shuffle is bounded by bucket
  * cardinality, never all-pairs; the verify step only touches candidate
  * pairs. Hash functions are md5-based so DuckDB computes bit-identical
  * signatures for the oracle compare.
  */
object TextQueries {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: hash-groupBy on content (SURVEY §2.10). One shuffle
    * keyed on the content hash; keeper = min doc_id. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "content_hash", "n_copies")
      .orderBy("keep_id")

  private val dedupExactSql =
    """SELECT min(doc_id) AS keep_id, md5(text) AS content_hash,
      |  CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // -------------------------------------------------------------- minhash

  /** Distinct word-3-gram shingles per doc. concat() (not concat_ws)
    * null-propagates past the document tail, matching SQL `||`. */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"),
        concat(col("w"), lit(" "), lead("w", 1).over(win), lit(" "),
          lead("w", 2).over(win)).as("shingle"))
      .filter(col("shingle").isNotNull)
      .distinct()
  }

  /** Per-(doc, band) LSH bucket key from an 8-hash MinHash signature,
    * banded 4×2. min(md5(seed:shingle)) is a string-min minhash — same
    * total order in both engines. */
  private def buckets(s: SparkSession, d: String): DataFrame =
    shingles(s, d)
      .crossJoin(broadcast(s.range(8).toDF("seed")))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"),
        col("shingle")))).as("mh"))
      .groupBy(col("doc_id"),
        floor(col("seed") / 2.0).cast("long").as("band"))
      .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("mh0"),
        min(when(col("seed") % 2 === 1, col("mh"))).as("mh1"))
      .select(col("doc_id"), col("band"),
        md5(concat(col("band").cast("string"), lit("|"), col("mh0"),
          lit("|"), col("mh1"))).as("bkey"))

  /** MinHash+LSH near-duplicate detection (SURVEY §2.10): shingle →
    * 8-hash signature → 4 bands → bucket-join candidates → exact
    * Jaccard verify ≥ 0.8. Candidate generation is a keyed equi-join on
    * (band, bucket) — never an all-pairs cross join. */
  def dedupMinhash(s: SparkSession, d: String): DataFrame = {
    val b1 = buckets(s, d)
      .select(col("doc_id").as("d1"), col("band"), col("bkey"))
    val b2 = buckets(s, d)
      .select(col("doc_id").as("d2"), col("band").as("band2"),
        col("bkey").as("bkey2"))
    val cand = b1.join(b2,
      col("band") === col("band2") && col("bkey") === col("bkey2") &&
        col("d1") < col("d2"))
      .select("d1", "d2").distinct()

    val s1 = shingles(s, d)
      .select(col("doc_id").as("d1"), col("shingle"))
    val s2 = shingles(s, d)
      .select(col("doc_id").as("d2b"), col("shingle").as("shingle2"))
    val inter = cand.join(s1, "d1")
      .join(s2, col("d2") === col("d2b") && col("shingle") === col("shingle2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_inter"))
    val sizes1 = shingles(s, d).groupBy(col("doc_id").as("d1"))
      .agg(count(lit(1)).as("n1"))
    val sizes2 = shingles(s, d).groupBy(col("doc_id").as("d2"))
      .agg(count(lit(1)).as("n2"))
    inter.join(sizes1, "d1").join(sizes2, "d2")
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n1") + col("n2") - col("n_inter")), 6))
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  private val dedupMinhashSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id,
      |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
      |shd AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
      |sig AS (
      |  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS mh
      |  FROM shd, (SELECT unnest(range(8)) AS seed) seeds
      |  GROUP BY doc_id, seed),
      |bands AS (
      |  SELECT doc_id, CAST(floor(seed / 2.0) AS BIGINT) AS band,
      |         min(CASE WHEN seed % 2 = 0 THEN mh END) AS mh0,
      |         min(CASE WHEN seed % 2 = 1 THEN mh END) AS mh1
      |  FROM sig GROUP BY 1, 2),
      |buckets AS (
      |  SELECT doc_id, band,
      |    md5(CAST(band AS VARCHAR) || '|' || mh0 || '|' || mh1) AS bkey
      |  FROM bands),
      |cand AS (
      |  SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
      |  FROM buckets b1
      |  JOIN buckets b2 ON b1.band = b2.band AND b1.bkey = b2.bkey
      |    AND b1.doc_id < b2.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
      |inter AS (
      |  SELECT c.d1, c.d2, count(*) AS n_inter
      |  FROM cand c
      |  JOIN shd s1 ON s1.doc_id = c.d1
      |  JOIN shd s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
      |  GROUP BY c.d1, c.d2)
      |SELECT i.d1, i.d2,
      |  round(CAST(n_inter AS DOUBLE) / (z1.n_sh + z2.n_sh - n_inter), 6) AS jaccard
      |FROM inter i
      |JOIN sizes z1 ON z1.doc_id = i.d1
      |JOIN sizes z2 ON z2.doc_id = i.d2
      |WHERE CAST(n_inter AS DOUBLE) / (z1.n_sh + z2.n_sh - n_inter) >= 0.8
      |ORDER BY d1, d2""".stripMargin

  // -------------------------------------------------------------- simhash

  /** 64-bit frequency-weighted SimHash signature per doc, as two 32-bit
    * halves in BIGINTs (integer math only — bit-exact across engines). */
  private def simhashSig(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), md5(col("w")).as("hx"))
    val nib = tok
      .crossJoin(broadcast(s.range(1, 17).toDF("p")))
      .withColumn("nibval",
        expr("instr('0123456789abcdef', substring(hx, CAST(p AS INT), 1)) - 1"))
    val bitsTable = {
      import s.implicits._
      Seq((0L, 1L), (1L, 2L), (2L, 4L), (3L, 8L)).toDF("b", "dv")
    }
    nib.crossJoin(broadcast(bitsTable))
      // floor-division: DuckDB CAST(double AS BIGINT) rounds while Spark
      // truncates, so both sides use explicit floor()
      .select(col("doc_id"), ((col("p") - 1) * 4 + col("b")).as("bitpos"),
        when(floor(col("nibval") / col("dv")) % 2 === 1, 1L)
          .otherwise(-1L).as("contrib"))
      .groupBy("doc_id", "bitpos").agg(sum("contrib").as("sgn"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("bitpos") < 32 && col("sgn") >= 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos AS INT))"))
          .otherwise(0L)).as("sim_lo"),
        sum(when(col("bitpos") >= 32 && col("sgn") >= 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos - 32 AS INT))"))
          .otherwise(0L)).as("sim_hi"))
  }

  /** SimHash near-dup pairs: hamming(sig1, sig2) ≤ 8 over all doc pairs.
    * (Bit-sampling LSH would band the signature at larger corpus sizes;
    * at 5k docs the O(n²) BIGINT compare is trivially cheap.) */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val g1 = simhashSig(s, d).select(col("doc_id").as("d1"),
      col("sim_lo").as("lo1"), col("sim_hi").as("hi1"))
    val g2 = simhashSig(s, d).select(col("doc_id").as("d2"),
      col("sim_lo").as("lo2"), col("sim_hi").as("hi2"))
    g1.join(g2, col("d1") < col("d2"))
      .withColumn("hamming",
        (bit_count(col("lo1").bitwiseXOR(col("lo2"))) +
          bit_count(col("hi1").bitwiseXOR(col("hi2")))).cast("long"))
      .filter(col("hamming") <= 8)
      .select("d1", "d2", "hamming")
      .orderBy("d1", "d2")
  }

  private val dedupSimhashSql =
    """WITH tok AS (
      |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS hx
      |  FROM documents),
      |nib AS (
      |  SELECT doc_id, p,
      |    strpos('0123456789abcdef', substr(hx, CAST(p AS INT), 1)) - 1 AS nibval
      |  FROM tok, (SELECT unnest(range(1, 17)) AS p) ps),
      |bits AS (
      |  SELECT doc_id, (p - 1) * 4 + b AS bitpos,
      |    CASE WHEN CAST(floor(nibval / dv) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END AS contrib
      |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) bt(b, dv)),
      |sums AS (SELECT doc_id, bitpos, sum(contrib) AS sgn FROM bits GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN bitpos < 32 AND sgn >= 0
      |      THEN (CAST(1 AS BIGINT) << CAST(bitpos AS INT)) ELSE 0 END) AS BIGINT) AS sim_lo,
      |    CAST(sum(CASE WHEN bitpos >= 32 AND sgn >= 0
      |      THEN (CAST(1 AS BIGINT) << CAST(bitpos - 32 AS INT)) ELSE 0 END) AS BIGINT) AS sim_hi
      |  FROM sums GROUP BY doc_id)
      |SELECT s1.doc_id AS d1, s2.doc_id AS d2,
      |  CAST(bit_count(xor(s1.sim_lo, s2.sim_lo))
      |     + bit_count(xor(s1.sim_hi, s2.sim_hi)) AS BIGINT) AS hamming
      |FROM sig s1 JOIN sig s2 ON s1.doc_id < s2.doc_id
      |WHERE bit_count(xor(s1.sim_lo, s2.sim_lo))
      |    + bit_count(xor(s1.sim_hi, s2.sim_hi)) <= 8
      |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------ text stats

  /** Per-language corpus stats (SURVEY §2.10 q_text_stats). */
  def textStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nw"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nw").as("total_words"),
        round(sum("nw").cast("double") / count(lit(1)), 6).as("avg_words"),
        round(sum("nc").cast("double") / count(lit(1)), 6).as("avg_chars"),
        countDistinct("source").as("n_sources"))
      .orderBy("lang")

  private val textStatsSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
      |  round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 6) AS avg_words,
      |  round(CAST(sum(length(text)) AS DOUBLE) / count(*), 6) AS avg_chars,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ----------------------------------------------------------- token count

  /** Whitespace + BPE-ish regex token counts (SURVEY §2.10). */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("bpeish_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  private val tokenCountSql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
      |    AS bpeish_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- quality

  /** Composite quality score: length saturation + lexical diversity +
    * char-length saturation (SURVEY §2.10 quality scoring). Pure integer
    * ratios in fixed expression order → cross-engine deterministic. */
  def qualityScore(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("nw", size(split(col("text"), " ")).cast("double"))
      .withColumn("nu", size(array_distinct(split(col("text"), " ")))
        .cast("double"))
      .withColumn("ncl", length(col("text")).cast("double"))
      .select(col("doc_id"), col("lang"),
        round(lit(0.3) * least(col("nw") / 100.0, lit(1.0)) +
          lit(0.4) * (col("nu") / col("nw")) +
          lit(0.3) * least(col("ncl") / 500.0, lit(1.0)), 6)
          .as("quality"))
      .orderBy("doc_id")

  private val qualityScoreSql =
    """SELECT doc_id, lang,
      |  round(0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |      + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |               / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |      + 0.3 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0), 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- lang id

  /** N-gram-flavoured language-ID heuristic: marker-word hit ratio with
    * a fixed decision rule (SURVEY §2.10 language-ID). The synthetic
    * corpus only separates 'es' from the rest, so the classifier is
    * binary; the machinery (tokenize → marker ratio → argmax) is the
    * real product. */
  def langId(s: SparkSession, d: String): DataFrame = {
    val markers = "'the','a','query','row','stream','order','column'," +
      "'vector','slow','part','table','join'"
    Tables.documents(s, d)
      .withColumn("score_es",
        expr(s"size(filter(split(text, ' '), w -> w IN ($markers)))")
          .cast("double") / size(split(col("text"), " ")))
      .select(col("doc_id"), col("lang"),
        round(col("score_es"), 6).as("score_es"),
        when(col("score_es") > 0.5, lit("es")).otherwise(lit("xx"))
          .as("pred_lang"))
      .withColumn("is_match",
        (col("pred_lang") === lit("es")) === (col("lang") === lit("es")))
      .orderBy("doc_id")
  }

  private val langIdSql =
    """SELECT doc_id, lang,
      |  round(sc, 6) AS score_es,
      |  CASE WHEN sc > 0.5 THEN 'es' ELSE 'xx' END AS pred_lang,
      |  (CASE WHEN sc > 0.5 THEN 'es' ELSE 'xx' END = 'es') = (lang = 'es')
      |    AS is_match
      |FROM (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the','a','query','row','stream','order','column',
      |                 'vector','slow','part','table','join'))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sc
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- fingerprint

  /** Rolling-hash document fingerprint: min md5 over all char 8-grams —
    * winnowing's global-min special case (SURVEY §2.10 fingerprinting).
    * The 8-gram explosion is a narrow generator (no shuffle) followed by
    * one keyed min-aggregation. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - 7, lit(1)))).as("i"),
        col("text"))
      .groupBy("doc_id")
      .agg(min(md5(expr("substring(text, CAST(i AS INT), 8)")))
        .as("fingerprint"))
      .orderBy("doc_id")

  private val fingerprintSql =
    """WITH pos AS (
      |  SELECT doc_id, text,
      |    unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
      |  FROM documents)
      |SELECT doc_id, min(md5(substr(text, CAST(i AS INT), 8))) AS fingerprint
      |FROM pos GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("q_dedup_minhash", dedupMinhash, Some(dedupMinhashSql)),
    QueryDef("q_dedup_simhash", dedupSimhash, Some(dedupSimhashSql)),
    QueryDef("q_text_stats", textStats, Some(textStatsSql)),
    QueryDef("q_token_count", tokenCount, Some(tokenCountSql)),
    QueryDef("q_quality_score", qualityScore, Some(qualityScoreSql)),
    QueryDef("q_lang_id", langId, Some(langIdSql)),
    QueryDef("q_fingerprint", fingerprint, Some(fingerprintSql)))
}
