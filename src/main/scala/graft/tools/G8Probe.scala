package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object G8Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1_skew")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[g8] $name t=${(System.nanoTime() - t0) / 1e9}%.2f"); r }
    val docs = graft.rel.Tables.documents(spark, d).repartition(col("doc_id"))
    val r1 = docs.select(col("doc_id"),
      expr("ngram5_packed(text)").as("grams")).localCheckpoint(false)
    t("5gram-arrays")(r1.count())
    val r2 = docs.select(col("doc_id"),
      expr("array_distinct(transform(sequence(1, greatest(length(text) - 7, 1)), i -> md5(substring(text, i, 8))))").as("g8")).localCheckpoint(false)
    t("8gram-md5-arrays")(r2.count())
    val fps = r2.select(col("doc_id"), explode(col("g8")).as("h8"))
      .groupBy("doc_id").agg(min("h8").as("fp0"),
        min(md5(concat(lit("1:"), col("h8")))).as("fp1"))
    t("fps-agg")(fps.count())
    spark.stop()
  }
}
