package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for the round-7 cluster/semantic dedup queries. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // probes measure the fixed-fit reference twin deliberately
      .config("spark.graft.allowQuadratic", "true")
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the JVM like Bench does
    noop(graft.SparkEntry.queries("q_dedup_exact")(spark, "/root/testdata/sf0.001"))

    val pairs = time("minhash pairs (build+run)") {
      val p = graft.text.TextQueries.minhashPairsProbe(spark, sfDir)
      noop(p); p
    }
    println(s"pair count: ${pairs.count()}")
    time("cc on minhash pairs") {
      noop(graft.graph.GraphOps.connectedComponents(pairs.select("d1", "d2")))
    }
    time("q_dedup_cluster end-to-end") {
      noop(graft.text.TextQueries.dedupCluster(spark, sfDir))
    }
    time("q_dedup_semantic end-to-end") {
      noop(graft.sim.SimQueries.dedupSemantic(spark, sfDir))
    }
    time("q_dedup_semantic again (cache warm)") {
      noop(graft.sim.SimQueries.dedupSemantic(spark, sfDir))
    }
    time("q_sim_ann_ivf after semantic") {
      noop(graft.sim.SimQueries.simAnnIvf(spark, sfDir))
    }
    time("q_span_dedup end-to-end") {
      noop(graft.text.TextQueries.spanDedup(spark, sfDir))
    }
    spark.stop()
  }
}
