package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r16 dial probe: output sizes and wall time of the base
  * vs DF-filtered ngram tier (and decontaminate) on a dataset dir —
  * is the skew tail answer-bound, and does the DF filter cut it? */
object NgramDfProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs; q <- Seq("q_dedup_ngram", "q_dedup_ngram_df",
        "q_decontaminate", "q_decontaminate_df")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      println(f"[ngdf] $d $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
