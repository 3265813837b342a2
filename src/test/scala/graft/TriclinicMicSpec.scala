package graft

import graft.traj.{TrajModel, TrajOps, TrajQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The tri_mic codegen kernel (graft.functions.TriclinicMicDist /
  * GeomKernels.triMic) vs its Column-tree twin
  * (TrajOps.distMicTriclinic): bit-identical results, and — the round-2
  * regression this kernel exists to kill — the MIC queries must
  * actually COMPILE under whole-stage codegen instead of silently
  * falling back to the interpreted path (janino "Code grows beyond
  * 64 KB"). `spark.sql.codegen.fallback=false` turns that silent
  * fallback into a hard failure, so these tests prove compilation. */
class TriclinicMicSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private val box = TrajOps.triBox(6.0, 7.0, 8.0, 60.0, 60.0, 90.0)

  test("kernel == Column tree bit-for-bit on a displacement sweep") {
    import spark.implicits._
    val deltas = (for {
      i <- -3 to 3; j <- -3 to 3; k <- -3 to 3
    } yield (i * 2.7 + 0.31, j * 3.9 - 0.57, k * 4.3 + 1.13)).toDF("dx", "dy", "dz")
    val rows = deltas
      .withColumn("tree", TrajOps.distMicTriclinic(col("dx"), col("dy"), col("dz"), box))
      .withColumn("kern", TrajOps.triMicKernel(col("dx"), col("dy"), col("dz"), box))
      .collect()
    assert(rows.length === 343)
    rows.foreach { r =>
      val t = r.getAs[Double]("tree")
      val k = r.getAs[Double]("kern")
      assert(java.lang.Double.doubleToLongBits(t) ===
        java.lang.Double.doubleToLongBits(k),
        s"(${r.get(0)}, ${r.get(1)}, ${r.get(2)}): tree=$t kernel=$k")
    }
  }

  test("kernel matches interpreted eval (codegen on/off invariance)") {
    import spark.implicits._
    val df = Seq((5.5, -6.9, 15.2), (0.1, 0.2, 0.3), (-11.7, 3.6, -4.1))
      .toDF("dx", "dy", "dz")
      .withColumn("kern", TrajOps.triMicKernel(col("dx"), col("dy"), col("dz"), box))
    val on = df.collect().map(_.getAs[Double]("kern"))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = df.collect().map(_.getAs[Double]("kern"))
      assert(on.toSeq === off.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null displacement yields null, not a crash") {
    val df = spark.sql("SELECT CAST(NULL AS DOUBLE) AS dx, 1.0D AS dy, 2.0D AS dz")
      .select(TrajOps.triMicKernel(col("dx"), col("dy"), col("dz"), box).as("kern"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("MIC queries compile under codegen (no 64 KB fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      // round 2: mic_adaptive died with janino 'Code grows beyond 64 KB'
      // and ran interpreted; with fallback disabled that would THROW here
      assert(TrajQueries.trajMicAdaptive(spark, sf).collect().nonEmpty)
      assert(TrajQueries.trajDistancesTriclinic(spark, sf).collect().nonEmpty)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("per-residue COM: residues partition atoms, masses conserve") {
    val com = TrajQueries.trajCom(spark, sf).collect()
      .map(r => r.getAs[Long]("frame_id") -> r.getAs[Double]("total_mass"))
      .toMap
    val res = TrajQueries.trajComResidue(spark, sf).collect()
    // every (frame, residue) group is non-empty and counts sum to the
    // frame's atom count from the topology dimension
    val atomsPerFrame = res.groupBy(_.getAs[Long]("frame_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_atoms")).sum).toMap
    val nAtoms = TrajModel.topologyShared(spark, sf).count()
    atomsPerFrame.foreach { case (f, n) =>
      assert(com.contains(f), s"frame $f missing from q_traj_com")
      assert(n <= nAtoms)
    }
    // 8-atom residues: no residue exceeds 8 members
    assert(res.forall(_.getAs[Long]("n_atoms") <= 8))
  }
}
