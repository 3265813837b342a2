package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage timings for the remaining bench-heavy queries. */
object MiscProbe {
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
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("warmup")(li.count())
    time("3x countDistinct (expand)") {
      li.agg(countDistinct("l_orderkey"), countDistinct("l_partkey"),
        countDistinct("l_suppkey")).collect()
    }
    time("3x approx rsd=0.01") {
      li.agg(approx_count_distinct(col("l_orderkey"), 0.01),
        approx_count_distinct(col("l_partkey"), 0.01),
        approx_count_distinct(col("l_suppkey"), 0.01)).collect()
    }
    time("3x approx rsd=0.05") {
      li.agg(approx_count_distinct(col("l_orderkey"), 0.05),
        approx_count_distinct(col("l_partkey"), 0.05),
        approx_count_distinct(col("l_suppkey"), 0.05)).collect()
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(col("doc_id"))
    time("docs warm")(docs.count())
    time("simhash64 kernel pass") {
      docs.select(expr("simhash64(text)").as("s"))
        .agg(sum(col("s.sim_lo"))).collect()
    }
    time("minhash_doc kernel pass") {
      docs.select(expr("minhash_doc(text)").as("m"))
        .agg(sum(size(col("m.sh")))).collect()
    }
    time("min_fingerprint kernel pass") {
      docs.select(expr("min_fingerprint(text)").as("f"))
        .agg(count(col("f"))).collect()
    }
    spark.stop()
  }
}
