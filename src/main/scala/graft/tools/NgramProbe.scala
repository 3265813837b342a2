package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for q_dedup_ngram (not a registered
  * query; run with `sbt "runMain graft.tools.NgramProbe"`). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(col("doc_id"))
    time("warmup")(docs.count())
    println("  n_docs=" + docs.count())
    val keys = time("keys fp+count+checkpoint") {
      docs.select(col("doc_id"),
        floor(length(col("text")) / 100).cast("long").as("lenb"),
        expr("min_fingerprint(text)").as("fp"),
        expr("ngram5_count(text)").cast("long").as("ng"))
        .localCheckpoint(false)
    }
    time("fp skew") {
      keys.groupBy("fp", "lenb").count().orderBy(desc("count"))
        .limit(12).collect().foreach(r => println("  " + r))
    }
    val k1 = keys.select(col("doc_id").as("d1"), col("lenb"), col("fp"),
      col("ng").as("n1"))
    val k2 = keys.select(col("doc_id").as("d2"), col("lenb").as("lenb2"),
      col("fp").as("fp2"), col("ng").as("n2"))
    val cand = k1.join(k2,
      col("fp") === col("fp2") && col("lenb") === col("lenb2") &&
        col("d1") < col("d2"))
      .filter(least(col("n1"), col("n2")) * 3 >= col("n1") + col("n2"))
      .select("d1", "d2")
    val candCp = time("cand join+checkpoint") {
      val c = cand.localCheckpoint(false)
      println("  n_cand=" + c.count())
      c
    }
    val candIds = candCp.select(col("d1").as("doc_id"))
      .unionByName(candCp.select(col("d2").as("doc_id"))).distinct()
    val grams = time("grams for candidates") {
      val g = docs.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), expr("ngram5_packed(text)").as("grams"))
        .localCheckpoint(false)
      println("  n_gram_docs=" + g.count())
      g
    }
    val g1 = grams.select(col("doc_id").as("d1"), col("grams").as("g1"))
    val g2 = grams.select(col("doc_id").as("d2b"), col("grams").as("g2"))
    time("verify+sort+write") {
      candCp.join(g1, "d1")
        .join(g2, col("d2") === col("d2b"))
        .withColumn("ni", expr("sorted_intersect_count(g1, g2)"))
        .filter(col("ni") * 3 >= size(col("g1")) + size(col("g2")))
        .select(col("d1"), col("d2"), round(col("ni").cast("double") /
          (size(col("g1")) + size(col("g2")) - col("ni")), 6).as("jaccard"))
        .orderBy("d1", "d2")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
