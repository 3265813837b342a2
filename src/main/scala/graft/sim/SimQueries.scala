package graft.sim

import graft.QueryDef
import graft.rel.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star surface,
  * BASELINE.json): brute-force cosine top-k as the correctness baseline
  * and a sign-LSH (random-hyperplane) bucketed near-dup pass as the
  * scale path.
  *
  * Spark-side vector math uses higher-order array functions
  * (zip_with + aggregate) — whole-stage-codegen'd, no UDFs, vectors
  * never explode into rows on the hot path. The oracle recomputes the
  * same dot products via unnest+join in DuckDB; all similarities are
  * rounded to 6 decimals before any ranking/threshold so both engines
  * rank identically.
  *
  * Scale notes: top-k broadcasts the (small) query set — one pass over
  * the corpus, no shuffle until the per-query top-k window on qid.
  * The LSH variant buckets vectors by the sign pattern of 8 fixed
  * pseudo-random hyperplanes (h_p[i] = sin(997p + 31i) — deterministic
  * in any engine), so candidate generation is a keyed self-join on the
  * bucket id, never all-pairs.
  */
object SimQueries {

  /** embeddings with double-cast vector and precomputed L2 norm. */
  private def withNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      // single parquet split → spread before the vector kernels
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm",
        sqrt(expr(
          "aggregate(emb, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)")))

  /** Brute-force cosine top-5 neighbours for the query subset
    * (vec_id % 50 = 0), excluding self. */
  def simTopk(s: SparkSession, d: String): DataFrame = {
    val corpus = withNorm(s, d)
    val queries = corpus
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"))
    val sims = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qemb, emb, (a, b) -> a * b)," +
          " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("cos_sim",
        round(col("dot") / (col("qnrm") * col("nrm")), 6))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("vec_id").as("nid"),
        col("cos_sim"))
      .orderBy("qid", "rk")
  }

  private val simTopkSql =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY vec_id),
      |q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
      |dots AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS nid, sum(q.v * e.v) AS dot
      |  FROM q JOIN e ON q.idx = e.idx AND q.vec_id <> e.vec_id
      |  GROUP BY 1, 2),
      |sims AS (
      |  SELECT qid, nid, round(dot / (n1.nrm * n2.nrm), 6) AS cos_sim
      |  FROM dots
      |  JOIN norms n1 ON n1.vec_id = qid
      |  JOIN norms n2 ON n2.vec_id = nid),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos_sim DESC, nid) AS rk FROM sims)
      |SELECT qid, CAST(rk AS BIGINT) AS rk, nid, cos_sim
      |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin

  /** Sign-LSH bucket id per vector: bit p = [v · h_p > 0] with
    * h_p[i] = sin(997p + 31i) (1-based i, matching DuckDB's
    * generate_subscripts), packed into a BIGINT. Row-local nested array
    * folds — no explode, no shuffle; the hyperplane family is a pure
    * function of (p, i) so it needs no materialized table on either
    * engine. */
  private def lshBuckets(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), expr(
        """aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, p) ->
          |  acc + CASE WHEN
          |    aggregate(zip_with(emb,
          |        transform(sequence(1, size(emb)), i -> sin(p * 997 + i * 31)),
          |        (a, b) -> a * b),
          |      CAST(0 AS DOUBLE), (x, y) -> x + y) > 0
          |    THEN shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))
          |    ELSE 0 END)""".stripMargin).as("bkt"))

  /** Embedding near-dup pairs: sign-LSH bucket candidates + exact cosine
    * ≥ 0.4 verify. The all-pairs comparison only ever happens inside a
    * bucket (1/2^8 of the corpus per bucket in expectation). */
  def simNeardupLsh(s: SparkSession, d: String): DataFrame = {
    // one pass computes bucket id + norm + vector per row; the lineage
    // barrier keeps them evaluated once per vector rather than
    // re-derived inside the self-join predicate (see
    // TextQueries.dedupMinhash)
    val vecs = withNorm(s, d)
      .join(lshBuckets(s, d), "vec_id")
      .localCheckpoint(false)
    val b1 = vecs.select(col("vec_id").as("v1"), col("bkt"))
    val b2 = vecs.select(col("vec_id").as("v2"), col("bkt").as("bkt2"))
    val cand = b1.join(b2,
      col("bkt") === col("bkt2") && col("v1") < col("v2"))
      .select("v1", "v2")
    val e1 = vecs.select(col("vec_id").as("v1"),
      col("emb").as("emb1"), col("nrm").as("nrm1"))
    val e2 = vecs.select(col("vec_id").as("v2b"),
      col("emb").as("emb2"), col("nrm").as("nrm2"))
    cand.join(e1, "v1")
      .join(e2, col("v2") === col("v2b"))
      .withColumn("cos_sim", round(
        expr("aggregate(zip_with(emb1, emb2, (a, b) -> a * b)," +
          " CAST(0 AS DOUBLE), (acc, v) -> acc + v)") /
          (col("nrm1") * col("nrm2")), 6))
      .filter(col("cos_sim") >= 0.4)
      .select("v1", "v2", "cos_sim")
      .orderBy("v1", "v2")
  }

  private val simNeardupLshSql =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY vec_id),
      |proj AS (
      |  SELECT vec_id, p, sum(v * sin(p * 997 + idx * 31)) AS dot
      |  FROM e, (SELECT unnest(range(8)) AS p) ps
      |  GROUP BY 1, 2),
      |bucket AS (
      |  SELECT vec_id,
      |    CAST(sum(CASE WHEN dot > 0
      |      THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS BIGINT)
      |      AS bkt
      |  FROM proj GROUP BY vec_id),
      |cand AS (
      |  SELECT b1.vec_id AS v1, b2.vec_id AS v2
      |  FROM bucket b1 JOIN bucket b2
      |    ON b1.bkt = b2.bkt AND b1.vec_id < b2.vec_id),
      |dots AS (
      |  SELECT c.v1, c.v2, sum(e1.v * e2.v) AS dot
      |  FROM cand c
      |  JOIN e e1 ON e1.vec_id = c.v1
      |  JOIN e e2 ON e2.vec_id = c.v2 AND e2.idx = e1.idx
      |  GROUP BY 1, 2)
      |SELECT d.v1, d.v2,
      |  round(dot / (n1.nrm * n2.nrm), 6) AS cos_sim
      |FROM dots d
      |JOIN norms n1 ON n1.vec_id = d.v1
      |JOIN norms n2 ON n2.vec_id = d.v2
      |WHERE round(dot / (n1.nrm * n2.nrm), 6) >= 0.4
      |ORDER BY v1, v2""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_sim_topk", simTopk, Some(simTopkSql)),
    QueryDef("q_sim_neardup_lsh", simNeardupLsh, Some(simNeardupLshSql)))
}
