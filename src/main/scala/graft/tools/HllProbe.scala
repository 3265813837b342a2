package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: HLL estimate error vs exact at each SF for rsd candidates —
  * picks the cheapest sketch that keeps the q_approx_distinct 5% bound
  * comfortably true (the sketch is deterministic for fixed data, so a
  * pass here is a pass in the driver). */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1");
         rsd <- Seq(0.05, 0.02, 0.01)) {
      val li = spark.read.parquet(s"/root/testdata/sf$sf/lineitem.parquet")
      val r = li.agg(
        approx_count_distinct(col("l_orderkey"), rsd).as("o"),
        approx_count_distinct(col("l_partkey"), rsd).as("p"),
        approx_count_distinct(col("l_suppkey"), rsd).as("s"),
        countDistinct("l_orderkey").as("eo"),
        countDistinct("l_partkey").as("ep"),
        countDistinct("l_suppkey").as("es")).collect()(0)
      def err(a: Long, e: Long) = f"${math.abs(a - e) * 100.0 / e}%.2f%%"
      println(s"sf$sf rsd=$rsd: orders ${err(r.getLong(0), r.getLong(3))}" +
        s" parts ${err(r.getLong(1), r.getLong(4))}" +
        s" supps ${err(r.getLong(2), r.getLong(5))}")
    }
    spark.stop()
  }
}
