package graft.tools

import graft.traj._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: wide-COM fold timing (map-probe regression check). */
object ComProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    time("warmup positions")(TrajModel.positionsShared(spark, d).count())
    time("q_traj_com_wide")(TrajQueries.trajComWide(spark, d).collect().length)
    time("q_traj_com (long)")(TrajQueries.trajCom(spark, d).collect().length)
    spark.stop()
  }
}
