package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r16 stage decomposition of the ngram tier on a dataset dir:
  * where do the seconds actually go (scan+kernel, DF census, block
  * stats, pair walk)? */
object NgramStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngst] $name t=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val docs = graft.rel.Tables.documents(spark, d)
      .repartition(col("doc_id"))
    val rows0 = docs.select(col("doc_id"),
      floor(length(col("text")) / 100).cast("long").as("lenb"),
      expr("min_fingerprint(text)").as("fp8"),
      expr("ngram5_packed(text)").as("grams"))
      .localCheckpoint(false)
    t("scan+kernel")(rows0.count())
    val nDocs = docs.count()
    val hot = t("census")(rows0.select(explode(col("grams")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") > lit(nDocs * 0.01))
      .agg(sort_array(collect_list(col("g"))).as("hot"))
      .localCheckpoint(true))
    val rows = rows0.crossJoin(broadcast(hot))
      .select(col("doc_id"), col("lenb"),
        array_except(col("grams"), col("hot")).as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("fp", array_min(col("grams")))
      .localCheckpoint(false)
    t("filter+minfp")(rows.count())
    println(s"[ngst] hotSize=" +
      hot.select(size(col("hot"))).collect()(0).getInt(0))
    val hotDf = hot.select(explode(col("hot")).as("g"))
      .localCheckpoint(true)
    val rowsB = rows0
      .select(col("doc_id"), col("lenb"), explode(col("grams")).as("g"))
      .join(broadcast(hotDf), Seq("g"), "left_anti")
      .groupBy("doc_id", "lenb")
      .agg(sort_array(collect_list(col("g"))).as("grams"))
      .withColumn("fp", element_at(col("grams"), 1))
      .localCheckpoint(false)
    t("explode-anti-recollect")(rowsB.count())
    // base-tier blocks (raw fp8) vs df blocks (min filtered gram)
    for ((lbl, r, key) <- Seq(
        ("base", rows0.withColumnRenamed("fp8", "fp"), "fp"),
        ("df", rows, "fp"))) {
      val blocks = r.groupBy(col(key), col("lenb"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      val stats = blocks.agg(max("c"), sum(expr("c*(c-1)/2")),
        count(lit(1))).collect()(0)
      println(s"[ngst] $lbl maxBlock=${stats.get(0)} " +
        s"candPairs=${stats.get(1)} blocks=${stats.get(2)}")
    }
    spark.stop()
  }
}
