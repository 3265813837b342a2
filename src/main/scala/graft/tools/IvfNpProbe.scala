package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off dial probe for the scaled-IVF nprobe policy: recall@5 of
  * `simAnnIvfScaledAt` under several candidate nprobe values, at each
  * given dir. Throwaway evidence-gathering for the r16 formula pick;
  * the outcome lands in RECALL.json / the scaled query's scaladoc. */
object IvfNpProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val truth = graft.SparkEntry.queries("q_sim_topk")(spark, d)
        .select("qid", "nid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      truth.count()
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val k = graft.sim.SimQueries.ivfK(n)
      for (np <- Seq(5, 6, 7, 9, 11, 12).distinct) {
        val approx = graft.sim.SimQueries
          .simAnnIvfScaledAt(spark, d, _ => np).select("qid", "nid")
        val (t, h) = RecallProbe.edgeRecall(truth, approx)
        println(s"[ivfnp] dir=$d n=$n K=$k np=$np recall=" +
          String.format(java.util.Locale.ROOT, "%.4f",
            Double.box(h.toDouble / t)))
      }
      truth.unpersist(false)
    }
    spark.stop()
  }
}
