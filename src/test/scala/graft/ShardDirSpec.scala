package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Directory-of-shards BATCH reads for all four trajectory formats —
  * the many-files layout a 100 TB trajectory actually has, and exactly
  * what the DSv2 write paths produce (frame-grouped `part-NNNNN.*`
  * shards). Frame ids are GLOBAL: shard k continues where shard k-1
  * ended in lexicographic name order, so a sharded write reads back as
  * ONE trajectory. Pushed frame_id predicates prune whole shards from
  * the plan. */
class ShardDirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2 frames × 3 atoms per shard, values offset per shard so rows are
    * distinguishable across the directory. */
  private def writeXyzShard(dir: java.io.File, name: String,
      base: Double): Unit = {
    val txt = (0 until 2).map { f =>
      s"3\n# Step: ${base + f} Box: 6.0 6.0 6.0\n" +
        (0 until 3).map(a => s"C ${base + f} $a.0 0.0\n").mkString
    }.mkString
    Files.writeString(dir.toPath.resolve(name), txt)
  }

  test("xyz shard directory reads as one trajectory with global " +
    "frame ids") {
    val dir = Files.createTempDirectory("xyzshards").toFile
    writeXyzShard(dir, "part-00000.xyz", 0.0)
    writeXyzShard(dir, "part-00001.xyz", 10.0)
    writeXyzShard(dir, "part-00002.xyz", 20.0)
    val df = spark.read.format("xyz").option("chunks", 1)
      .load(dir.getPath)
    assert(df.count() == 18) // 3 shards × 2 frames × 3 atoms
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 6L))
    // frame 3 is shard 1's local frame 1 → x = 11.0
    val r = df.filter(col("frame_id") === 3 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 11.0f)
    assert(r.getAs[Double]("time") == 11.0)
  }

  test("frame_id pushdown prunes whole shards from the plan") {
    val dir = Files.createTempDirectory("xyzshards").toFile
    writeXyzShard(dir, "part-00000.xyz", 0.0)
    writeXyzShard(dir, "part-00001.xyz", 10.0)
    val df = spark.read.format("xyz").option("chunks", 1)
      .load(dir.getPath)
    assert(df.rdd.getNumPartitions == 4) // 4 frames, chunks=1
    val pruned = df.filter(col("frame_id") >= 2) // shard 1 only
    assert(pruned.rdd.getNumPartitions == 2)
    assert(pruned.count() == 6)
    // limit pushdown stops planning shards once covered
    assert(df.limit(3).rdd.getNumPartitions == 1)
  }

  test("gro write-path shards read back as one trajectory") {
    val dir = Files.createTempDirectory("groshards").toString
    val df = spark.range(0, 4).selectExpr("id AS frame_id")
      .crossJoin(spark.range(0, 2).selectExpr("CAST(id AS INT) AS atom_id"))
      .selectExpr("frame_id", "CAST(frame_id * 2 AS DOUBLE) AS time",
        "atom_id", "CAST(1 AS INT) AS res_id", "'SOL' AS res_name",
        "'OW' AS atom_name",
        "CAST(frame_id + atom_id * 0.125 AS FLOAT) AS x",
        "CAST(0.5 AS FLOAT) AS y", "CAST(1.0 AS FLOAT) AS z",
        "CAST(6.0 AS FLOAT) AS bv1x", "CAST(0.0 AS FLOAT) AS bv1y",
        "CAST(0.0 AS FLOAT) AS bv1z", "CAST(0.0 AS FLOAT) AS bv2x",
        "CAST(7.0 AS FLOAT) AS bv2y", "CAST(0.0 AS FLOAT) AS bv2z",
        "CAST(0.0 AS FLOAT) AS bv3x", "CAST(0.0 AS FLOAT) AS bv3y",
        "CAST(8.0 AS FLOAT) AS bv3z")
      // two tasks → two shard files; frames 0-1 and 2-3
      .repartitionByRange(2, col("frame_id"))
      .sortWithinPartitions("frame_id", "atom_id")
    df.write.format("gro").mode("overwrite").save(dir)
    val back = spark.read.format("gro").load(dir)
    assert(back.count() == 8)
    // global frame ids are contiguous 0..3 (shard-local 0..1 offset)
    assert(back.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 4L))
    val r = back.filter(col("frame_id") === 3 && col("atom_id") === 1)
      .collect()(0)
    assert(math.abs(r.getAs[Float]("x") - 3.125f) < 1e-3)
  }

  test("pdb shard directory: multi-model shards with global frame ids") {
    val dir = Files.createTempDirectory("pdbshards").toFile
    def rec(serial: Int, x: Double): String =
      "ATOM  " + f"$serial%5d" + "  CA  ALA A" + f"$serial%4d" + "    " +
        f"$x%8.3f" + f"${2.0}%8.3f" + f"${3.0}%8.3f" +
        "  1.00  0.00           C"
    def shard(models: Int, base: Double): String =
      (1 to models).map { m =>
        f"MODEL $m%8d\n" + rec(1, base + m) + "\n" + rec(2, base + m) +
          "\nENDMDL\n"
      }.mkString
    Files.writeString(dir.toPath.resolve("part-00000.pdb"), shard(2, 0.0))
    Files.writeString(dir.toPath.resolve("part-00001.pdb"), shard(3, 100.0))
    val df = spark.read.format("pdb").option("unit_scale", "1.0")
      .load(dir.getPath)
    assert(df.count() == 10) // (2 + 3 models) × 2 atoms
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 5L))
    // global frame 2 = shard 1's first model → x = 101.0
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 101.0f)
  }

  test("dcd shard directory: binary shards with global frame ids and " +
    "shard pruning") {
    val dir = Files.createTempDirectory("dcdshards").toFile
    def mkFrames(n: Int, base: Float): Seq[graft.sources.DcdWrite.Frame] =
      (0 until n).map { f =>
        val xs = Array.tabulate(2)(a => base + f + a * 0.25f)
        graft.sources.DcdWrite.Frame(xs, xs.map(_ + 10f),
          xs.map(_ + 20f), Some((6.0, 7.0, 8.0, 90.0, 90.0, 90.0)))
      }
    graft.sources.DcdWrite.write(
      new java.io.File(dir, "part-00000.dcd").getPath, mkFrames(2, 0f))
    graft.sources.DcdWrite.write(
      new java.io.File(dir, "part-00001.dcd").getPath, mkFrames(3, 100f))
    val df = spark.read.format("dcd").option("chunks", 1)
      .option("unit_scale", "1.0").load(dir.getPath)
    assert(df.count() == 10) // (2 + 3 frames) × 2 atoms
    assert(df.select("frame_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 5L))
    // global frame 2 = shard 1's local frame 0 → x = 100.0
    val r = df.filter(col("frame_id") === 2 && col("atom_id") === 0)
      .collect()(0)
    assert(r.getAs[Float]("x") == 100.0f)
    // pushdown prunes the first shard entirely
    assert(df.filter(col("frame_id") >= 2).rdd.getNumPartitions == 3)
  }
}
