package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the minhash band knob on a large corpus (not a registered
  * query): wall time + verified pairs of dedupMinhashAt per
  * (seeds, rows_per_band). `SPARK_GRAFT_SF_DIR=... runMain
  * graft.tools.MinhashBandsProbe`. */
object MinhashBandsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (seeds, rowsPerBand, shingleK): the band knob plus the k=2 dial
    // (r18 — q_dedup_minhash_k2's answer census on skew corpora)
    val configs = Seq((8, 2, 3), (8, 4, 3), (16, 4, 3), (8, 2, 2))
    val results = configs.map { case (seeds, rpb, k) =>
      val t0 = System.nanoTime()
      val n = graft.text.TextQueries
        .dedupMinhashAt(spark, sfDir, seeds, rpb, k).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val tag = s"s${seeds}_r$rpb" + (if (k != 3) s"_k$k" else "")
      s""""$tag":{"sec":$sec,"pairs":$n}"""
    }
    val sims = Seq(8, 4).map { h =>
      val t0 = System.nanoTime()
      val n = graft.text.TextQueries.dedupSimhashAt(spark, sfDir, h)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      s""""simhash_h$h":{"sec":$sec,"pairs":$n}"""
    }
    println(s"""{"metric":"minhash_bands","sf":"$sfDir",${(results ++ sims).mkString(",")}}""")
    spark.stop()
  }
}
