package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the sim queries (not a registered
  * query; run with `sbt "runMain graft.tools.SimProbe"`). */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

    time("warmup count")(emb.count())
    val vecs = time("norm+code+checkpoint") {
      emb.withColumn("n2s", expr("dot_scaled(emb, emb)"))
        .withColumn("nrm", sqrt(col("n2s") / expr("1e12")))
        .withColumn("bkt", expr("lsh16_code(emb)"))
        .localCheckpoint(false)
    }
    val banded = vecs.select(col("vec_id"), col("bkt"),
      explode(expr(
        "transform(sequence(0, 15), b -> named_struct(" +
          "'band', b, 'mval', bkt - shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))" +
          " * CAST(shiftright(bkt, CAST(b AS INT)) % 2 AS BIGINT)))"))
        .as("bd"))
      .select(col("vec_id"), col("bd.band").as("band"),
        col("bd.mval").as("mval"))
    val b1 = banded.select(col("vec_id").as("v1"), col("band"), col("mval"))
    val b2 = banded.select(col("vec_id").as("v2"), col("band").as("band2"),
      col("mval").as("mval2"))
    val cand = b1.join(b2,
      col("band") === col("band2") && col("mval") === col("mval2") &&
        col("v1") < col("v2"))
      .select("v1", "v2").distinct()
    time("candidates count")(println("  n_cand=" + cand.count()))
    val candCp = time("cand checkpoint")(cand.localCheckpoint(false))
    val e1 = vecs.select(col("vec_id").as("v1"),
      col("emb").as("emb1"), col("nrm").as("nrm1"))
    val e2 = vecs.select(col("vec_id").as("v2b"),
      col("emb").as("emb2"), col("nrm").as("nrm2"))
    val out = candCp.join(e1, "v1")
      .join(e2, col("v2") === col("v2b"))
      .withColumn("cos_sim", round(
        (expr("dot_scaled(emb1, emb2)") / expr("1e12")) /
          (col("nrm1") * col("nrm2")), 6))
      .filter(col("cos_sim") >= 0.4)
      .select("v1", "v2", "cos_sim")
    time("verify+count")(println("  n_out=" + out.count()))
    time("full orderBy write") {
      out.orderBy("v1", "v2").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
