package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the lsh_code width knob on a large corpus (not a
  * registered query; `SPARK_GRAFT_SF_DIR=... runMain
  * graft.tools.LshBitsProbe [bits...]`): wall time + output rows of
  * simNeardupLshAt per width. Demonstrates the r6 scale fix for the
  * one >10x sf1 ratio (candidates ~ n^2/2^bits). */
object LshBitsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val bits = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = bits.map { b =>
      val t0 = System.nanoTime()
      val n = graft.sim.SimQueries.simNeardupLshAt(spark, sfDir, b)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      s""""bits_$b":{"sec":$sec,"pairs":$n}"""
    }
    println(s"""{"metric":"lsh_bits","sf":"$sfDir",${results.mkString(",")}}""")
    spark.stop()
  }
}
