package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of `q_dedup_simhash` (VERDICT r8 ask #2): times
  * the three cost layers separately so "signature kernel vs band join"
  * stops being a guess —
  *
  *  1. `scan`      — parquet scan + full-text materialization only
  *     (the irreducible I/O floor of ANY per-document kernel);
  *  2. `signature` — scan + one `simhash64(text)` call per doc
  *     (the md5-vote kernel under suspicion);
  *  3. `full`      — the registered query (signatures + 9-band
  *     explode + groupBy-bucket kernel verify + distinct + sort;
  *     the band self-join before r10).
  *
  * Each layer runs `reps` times (default 3) into the noop sink after
  * one untimed warm-up; minima are printed as one JSON line. The
  * signature cost is `signature - scan`; the join cost `full -
  * signature`.
  *
  * Usage: `runMain graft.tools.SimhashProfile [sfDir] [reps]`.
  */
object SimhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def docs = graft.rel.Tables.documents(spark, sfDir)
    val layers: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      // length() forces the text bytes to materialize without keeping
      // any simhash work in the plan
      "scan" -> (() => docs.select(col("doc_id"),
        length(col("text")).as("n"))),
      "signature" -> (() => docs.select(col("doc_id"),
        expr("simhash64(text)").as("sig"))),
      "full" -> (() => graft.text.TextQueries.dedupSimhash(spark, sfDir)))

    // one-off diagnostics: candidate-pair volume through the banding
    // (the rows a self-join WOULD materialize; with the r10 kernel plan
    // this is in-task POPCNT work instead). Banding reuses the query's
    // own TextQueries.bandVal so the profile can't drift from the plan.
    {
      val sig = docs.select(col("doc_id"),
          expr("simhash64(text)").as("sig"))
        .select(col("doc_id"), col("sig.sim_lo").as("sim_lo"),
          col("sig.sim_hi").as("sim_hi"))
        .localCheckpoint(false)
      val banded = sig.select(col("doc_id"),
        explode(array((0 to 8).map(b =>
          struct(lit(b).as("band"),
            graft.text.TextQueries.bandVal(b).as("bval"))): _*)).as("bd"))
        .select(col("bd.band").as("band"), col("bd.bval").as("bval"))
      val hist = banded.groupBy("band", "bval").count()
        .agg(max("count").as("mx"), sum(col("count") * col("count")).as("s2"))
        .collect()(0)
      System.err.println(s"[profile] hottest band-key=${hist.getLong(0)} " +
        s"sum(count^2)=${hist.getLong(1)}")
    }

    val mins = layers.map { case (name, mk) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up, untimed
      val t = (1 to reps).map(_ => once()).min
      name -> t
    }
    val m = mins.toMap
    val line = mins.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", ",") +
      s""""signature_minus_scan":${m("signature") - m("scan")},""" +
      s""""join_minus_signature":${m("full") - m("signature")},""" +
      s""""reps":$reps,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
