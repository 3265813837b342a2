package graft.tools

import org.apache.spark.sql.SparkSession

/** Time any registered `SparkEntry.queries` entries by name — the
  * focused counterpart of the full Bench sweep, for iterating on ONE
  * query's plan without paying the other 76.
  *
  * Usage: `runMain graft.tools.QueryProbe q_span_dedup [q_x ...]`
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_CPUS`
  * (default 32), `SPARK_GRAFT_PROBE_REPS` (default 3). Each query gets
  * one untimed warm-up, then `reps` timed runs into the noop sink
  * (same materialization contract as Bench); per-query minima print as
  * one JSON line. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "QueryProbe: pass one or more query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Bench's AQE coalescing floor (r20): without it the byte-based
      // coalescer collapses kernel-tier post-shuffle stages to one
      // task at fixture byte sizes and the probe measures a serialized
      // plan Bench never runs (q_dedup_minhash_df probed 14 s here vs
      // 1.4 s under Bench's own config — the instrument, not the plan)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "16k"))
      // probes measure the fixed-fit reference twin deliberately
      .config("spark.graft.allowQuadratic", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val unknown = args.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"QueryProbe: unknown queries ${unknown.mkString(", ")}")
    val results = args.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val times = (1 to reps).map(_ => once())
      name -> times.min
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"probe","queries":$qs,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
