package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator (VERDICT r5 stretch #7): replicates the
  * sf0.1 tables `copies`× into a new directory with referentially
  * CONSISTENT key offsets, so the 72-query bench can run at ~sf1 and
  * per-query time ratios expose any hidden super-linear shape.
  *
  * Key domains share one offset each (orderkey offsets agree between
  * orders and lineitem, etc.), dimension tables (region, nation) stay
  * unscaled — the TPC-H shape: facts grow, dimensions don't.
  * Document text is character-TRANSLATED per copy (every shingle
  * changes), because verbatim replication would hand the near-dup
  * queries quadratic cross-copy duplicate groups and fake a
  * super-linear signal that is a data artifact, not a plan defect.
  *
  * Usage: `runMain graft.tools.ScaleTestdata [src] [dst] [copies]`
  * (defaults /root/testdata/sf0.1 → /tmp/graft_sf1 × 10). Output is
  * perf-only — no oracle claims at this scale.
  */
object ScaleTestdata {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // the text translation cycles with the alphabet length: copy 12
    // would translate identically to copy 0 and silently reintroduce
    // the exact-duplicate artifact the translation exists to prevent
    // an empty/blank arg means "all tables" (lets callers reach the
    // alphabet positional without restricting the table set)
    val tables = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val alpha = args.lift(4).getOrElse("etaoinshrdlu")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, src, dst, copies, tables, alpha)
    spark.stop()
  }

  /** Generation body, session-preserving — callable from a test suite
    * (ScaleKnobsSpec) without tearing down the caller's session the
    * way main()'s stop() would. */
  def generate(spark: SparkSession, src: String, dst: String,
      copies: Int, tables: Set[String] = Set.empty,
      alpha: String = "etaoinshrdlu"): Unit = {
    // the text translation cycles with the alphabet length: copy 12
    // would translate identically to copy 0 and silently reintroduce
    // the exact-duplicate artifact the translation exists to prevent
    require(copies >= 1 && copies <= alpha.length,
      s"ScaleTestdata: copies must be in [1, ${alpha.length}] (the " +
        s"per-copy text translation has period ${alpha.length}), " +
        s"got $copies")
    // COMPOSING replicas (x10 of an x10): the cyclic shifts over ONE
    // alphabet form a group of order 12, so k1-then-k2 collapses to
    // (k1+k2) mod 12 and a naive x100 plants ~8-way EXACT-duplicate
    // families (measured: the dedup probes go quadratic on them).
    // Pass a second-stage alphabet DISJOINT from the first (e.g.
    // "cmpwykvxbfgj") — the two stages then act on disjoint letter
    // sets and all copies-x-copies compositions are distinct
    // bijections, keeping shingle-similarity structure linear.
    require(alpha.toSet.size == alpha.length,
      s"ScaleTestdata: alphabet '$alpha' has repeated letters")
    // `tables` non-empty restricts the replica to that subset — the
    // single-family probe path (e.g. a 100x documents-only replica
    // built by applying x10 to an x10 replica without paying 1.9 GB
    // of lineitem nobody will scan)
    def wanted(t: String): Boolean = tables.isEmpty || tables(t)

    def rd(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // dimensions: unscaled
    Seq("region", "nation").filter(wanted).foreach(t => wr(rd(t), t))

    // one offset per key DOMAIN, from the owning table, shared by all
    // referencing tables so joins stay referentially intact
    def domainMax(t: String, c: String): Long =
      rd(t).agg(max(col(c).cast("long"))).collect()(0).getLong(0) + 1L
    // offsets computed on demand so a subset replica never scans the
    // owning tables of domains it does not rescale
    val offSrc: Map[String, () => Long] = Map(
      "custkey" -> (() => domainMax("customer", "c_custkey")),
      "orderkey" -> (() => domainMax("orders", "o_orderkey")),
      "partkey" -> (() => domainMax("part", "p_partkey")),
      "suppkey" -> (() => domainMax("supplier", "s_suppkey")),
      "event_id" -> (() => domainMax("events", "event_id")),
      "user_id" -> (() => domainMax("events", "user_id")),
      "doc_id" -> (() => domainMax("documents", "doc_id")),
      "vec_id" -> (() => domainMax("embeddings", "vec_id")))
    val offMemo = scala.collection.mutable.HashMap.empty[String, Long]
    def off(domain: String): Long =
      offMemo.getOrElseUpdate(domain, offSrc(domain)())
    val keyCols: Map[String, Map[String, String]] = Map(
      "customer" -> Map("c_custkey" -> "custkey"),
      "supplier" -> Map("s_suppkey" -> "suppkey"),
      "part" -> Map("p_partkey" -> "partkey"),
      "orders" -> Map("o_orderkey" -> "orderkey",
        "o_custkey" -> "custkey"),
      "lineitem" -> Map("l_orderkey" -> "orderkey",
        "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"),
      "events" -> Map("event_id" -> "event_id", "user_id" -> "user_id"),
      "documents" -> Map("doc_id" -> "doc_id"),
      "embeddings" -> Map("vec_id" -> "vec_id"))

    val copyDf = spark.range(copies).select(col("id").as("__copy"))
    keyCols.filter(kv => wanted(kv._1)).foreach { case (t, cols) =>
      val base = rd(t)
      var out = base.crossJoin(copyDf)
      cols.foreach { case (c, domain) =>
        val dt = base.schema(c).dataType
        out = out.withColumn(c,
          (col(c).cast("long") + col("__copy") * off(domain)).cast(dt))
      }
      if (t == "documents") {
        // per-copy character translation: every shingle changes, so
        // copies are NOT near-duplicates of each other
        val shifted = (k: Int) =>
          alpha.drop(k % alpha.length) + alpha.take(k % alpha.length)
        out = out.withColumn("text",
          (1 until copies).foldLeft(col("text")) { (acc, k) =>
            when(col("__copy") === k,
              translate(col("text"), alpha, shifted(k))).otherwise(acc)
          })
      }
      if (t == "embeddings") {
        // per-copy circular rotation + per-copy SIGN PATTERN. The
        // rotation decorrelates the index-dependent LSH/PQ projections;
        // the sign flip (r12) kills the COSINE similarity between
        // copies as well: a balanced ±1 pattern makes
        // cos(v, s·v) ≈ 0, while WITHIN one copy all dot products are
        // exactly preserved (the signs cancel pairwise), so each copy
        // keeps the source's cluster structure on fresh codes.
        // Rotation alone was measured (r12 100x probe) leaving rotated
        // copies of clustered vectors genuinely near-dup — the answer
        // set grew ~n² across copies, a replica artifact of the same
        // class the documents translation exists to prevent.
        // The hash is SALTED WITH THE STAGE ALPHABET (r13): with an
        // unsalted hash(copy, i), stage-1 copy (k, 0) and stage-2 copy
        // (0, k) of an x10-of-x10 compose to the IDENTICAL transform
        // (copy 0 is the identity in both stages and the same copy
        // index draws the same sign pattern), planting 9 full
        // exact-duplicate table pairs at 100x. Stages already pass
        // disjoint alphabets for the text translation, so the same
        // string makes every stage's sign family independent and all
        // cross-stage compositions distinct. Copy 0 is bit-identical
        // to the source.
        val rotated =
          "concat(" +
            "slice(embedding, (CAST(__copy AS INT) * 7) " +
            "% size(embedding) + 1, size(embedding) - " +
            "(CAST(__copy AS INT) * 7) % size(embedding)), " +
            "slice(embedding, 1, (CAST(__copy AS INT) * 7) " +
            "% size(embedding)))"
        out = out.withColumn("embedding", expr(
          s"CASE WHEN __copy = 0 THEN embedding ELSE " +
            s"transform($rotated, (x, i) -> x * CAST(1 - 2 * " +
            s"abs(hash(CAST(__copy AS INT), i, '$alpha') % 2) " +
            "AS FLOAT)) END"))
      }
      // write the many-files layout real data has: a single output
      // file serializes downstream scans into one task and fakes a
      // super-linear signal for per-row queries (the round-6 sf1 run
      // measured q_quality_score 25x on a one-file input)
      wr(out.drop("__copy").repartition(32), t)
      System.err.println(s"[scale] $t x$copies done")
    }
    // completion marker: table iteration order is unspecified, so
    // "does table X exist" cannot distinguish a finished replica from
    // an interrupted one — consumers (ScaleKnobsSpec) probe this file
    graft.sources.FsIO.writeString(s"$dst/_GRAFT_SCALE_OK",
      s"copies=$copies src=$src\n")
    System.err.println(s"[scale] wrote $dst")
  }
}
