package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Usage demo for the `xyz` DataSourceV2 (graft.sources.XyzDataSource):
  * writes a 2-frame trajectory, reads it back chunked, shows the rows
  * and the pruned scan plan. `sbt "runMain graft.tools.XyzDemo"`. */
object XyzDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("xyz-demo")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = Files.createTempFile("demo", ".xyz")
    Files.writeString(path,
      """2
        |# Step: 0 Box: 6.0 6.0 6.0
        |C 1.0 2.0 3.0
        |O 4.0 5.0 6.0
        |2
        |# Step: 10 Box: 6.0 6.0 6.0
        |C 1.5 2.5 3.5
        |O 4.5 5.5 6.5
        |""".stripMargin)

    val df = spark.read.format("xyz").option("chunks", "1")
      .load(path.toString)
    println("PARTITIONS=" + df.rdd.getNumPartitions)
    df.show(false)
    df.select("element", "x").explain("formatted")

    val pruned = df.filter(
      org.apache.spark.sql.functions.col("frame_id") === 1L)
    println("PRUNED-PARTS=" + pruned.rdd.getNumPartitions +
      " ROWS=" + pruned.count())

    try spark.read.format("xyz").load("/tmp/does_not_exist.xyz").count()
    catch {
      case e: Throwable =>
        println(s"MISSING-FILE => ${e.getClass.getSimpleName}")
    }
    spark.stop()
  }
}
