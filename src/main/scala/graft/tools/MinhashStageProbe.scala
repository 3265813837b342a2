package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level timing of the REGISTERED k2 minhash tier (r20): the
  * per-stage listener prints every stage's wall time, task count and
  * name so the 10.9 s (vs the oracle's 0.2 s on identical candidate
  * volume) can be attributed to a real stage instead of guessed at.
  * Usage: runMain graft.tools.MinhashStageProbe /root/testdata/sf0.1
  *          [q_dedup_minhash_k2]
  */
object MinhashStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = if (args.length > 1) args(1) else "q_dedup_minhash_k2"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PROBE_MIN_PART", "1m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b
        stages.add(f"[stage] ${ms.getOrElse(-1L)}%6d ms  " +
          f"tasks=${i.numTasks}%4d  ${i.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    val fn = graft.SparkEntry.queries(q)
    val t0 = System.nanoTime()
    val n = fn(spark, d).count()
    println(f"[probe] $q total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    Thread.sleep(500)
    stages.forEach(println)
    spark.stop()
  }
}
