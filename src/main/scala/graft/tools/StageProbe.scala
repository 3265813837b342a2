package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level timing of any registered query under Bench's exact
  * session config, in BOTH regimes: the cold first-touch pass (shared
  * artifacts built inside) and the warm pass (the bench-min regime,
  * where shared barriers are already materialized). Stage lines print
  * per pass so a hot query's time can be attributed to a real stage.
  *
  * Usage: runMain graft.tools.StageProbe q_name [q_name2 ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  *      SPARK_GRAFT_MIN_PART (16k — Bench's floor).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "StageProbe: pass one or more query names")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "16k"))
      .config("spark.graft.allowQuadratic", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = e.stageInfo
          val ms = for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b
          stages.add(f"[stage] ${ms.getOrElse(-1L)}%6d ms  " +
            f"tasks=${i.numTasks}%4d  ${i.name.takeWhile(_ != '\n').take(110)}")
        }
    })
    args.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      def once(label: String): Unit = {
        stages.clear()
        record = true
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        record = false
        Thread.sleep(300)
        println(f"\n[probe] $q $label ${dt}%.2f s")
        stages.forEach(println)
      }
      once("cold")
      once("warm1")
      once("warm2")
    }
    spark.stop()
  }
}
