package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost breakdown for the k2 minhash tier (r20): at plain sf0.1
  * the ORACLE runs the whole chain in ~0.2 s while the Spark tier
  * costs ~10.7 s — so the tier's cost is NOT candidate volume (77k,
  * identical in both engines; the sf0.1 corpus has zero >25%-DF
  * shingles) but plan overhead. This probe times each stage in
  * isolation to find where the 10.7 s actually lives before
  * optimizing anything. Usage:
  *   runMain graft.tools.MinhashCostProbe /root/testdata/sf0.1
  */
object MinhashCostProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.util.Barrier.BarrierOps

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = graft.rel.Tables.documents(spark, d)
      .repartition(col("doc_id"))

    // stage 1: kernel only (shingles + signature fused)
    time("kernel(sh+sig k2)") {
      docs.select(col("doc_id"),
        expr("minhash_doc_banded(text, 8, 2, 2)").as("m"))
    }
    // stage 2: + barrier
    def ds0 = docs.select(col("doc_id"),
        expr("minhash_doc_banded(text, 8, 2, 2)").as("m"))
      .select(col("doc_id"), col("m.sh").as("sh"),
        col("m.bkeys").as("bkeys"))
      .filter(size(col("sh")) > 0)
    time("kernel+barrier")(ds0.graftBarrier)
    // stage 3: candidates from the barrier'd ds
    val ds = ds0.graftBarrier
    val bands = ds.select(col("doc_id"),
      posexplode(col("bkeys")).as(Seq("band", "bkey")))
    val b1 = bands.select(col("doc_id").as("d1"), col("band"), col("bkey"))
    val b2 = bands.select(col("doc_id").as("d2"),
      col("band").as("band2"), col("bkey").as("bkey2"))
    val cand = b1.join(b2,
      col("band") === col("band2") && col("bkey") === col("bkey2") &&
        col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    time("candidates")(cand)
    // stage 4: verify join + array_intersect
    val sh1 = ds.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val sh2 = ds.select(col("doc_id").as("d2b"), col("sh").as("sh2"))
    time("verify(join+intersect)") {
      cand.join(sh1, "d1")
        .join(sh2, col("d2") === col("d2b"))
        .withColumn("ni", size(array_intersect(col("sh1"), col("sh2"))))
        .filter(col("ni") > 0)
    }
    spark.stop()
  }
}
