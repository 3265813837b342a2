package graft.tools
import org.apache.spark.sql.SparkSession
object AnglesProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // warm positions
    graft.traj.TrajModel.positionsShared(spark, d).count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.traj.TrajQueries.trajAngles(spark, d).write.format("noop").mode("overwrite").save()
      println(s"angles run $i: ${(System.nanoTime()-t0)/1e9}s")
    }
    val t1 = System.nanoTime()
    graft.traj.TrajQueries.trajDistances(spark, d).write.format("noop").mode("overwrite").save()
    println(s"distances: ${(System.nanoTime()-t1)/1e9}s")
    graft.traj.TrajQueries.trajAngles(spark, d).explain("formatted")
    spark.stop()
  }
}
