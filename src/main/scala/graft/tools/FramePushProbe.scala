package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: show whether the single-frame positions build pushes the
  * frame predicate into the lineitem parquet scan.
  * `sbt "runMain graft.tools.FramePushProbe [sfDir]"`. */
object FramePushProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("frame-push-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.traj.TrajModel.positionsFrame(spark, sfDir, 1)
      .explain("formatted")
    spark.stop()
  }
}
