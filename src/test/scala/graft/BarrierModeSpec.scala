package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cluster-idiom barrier toggle (VERDICT r13 ask #6): every shared
  * build routes through graft.util.Barrier, whose default
  * `localCheckpoint(false)` is executor-loss-UNSAFE on a real cluster
  * (blocks die with the executor and severed lineage cannot recompute
  * them). `spark.graft.barrier=persist` switches every barrier to
  * `persist(DISK_ONLY)` — lineage kept, loss-recomputable. This spec
  * pins OUTPUT IDENTITY across the modes on barrier-heavy queries from
  * each family (signature dedup, k-means sim, trajectory shared
  * builds, CC iteration), using a fresh `newSession` per mode so the
  * (session, dir)-keyed memo caches cannot leak instances across
  * modes. */
class BarrierModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  // barrier-heavy representatives: simhash (signature barrier),
  // dedup_cluster (eager CC iteration), sim_ann_ivf (k-means fit
  // barriers), traj_com (TrajModel shared builds), multimodal_features
  // (decode memo)
  private val queries = Seq("q_dedup_simhash", "q_dedup_cluster",
    "q_sim_ann_ivf", "q_traj_com", "q_multimodal_features")

  test("persist-mode barriers produce identical results to the " +
    "default localCheckpoint mode on barrier-heavy queries") {
    val sLocal = spark.newSession()
    sLocal.conf.set("spark.graft.barrier", "local")
    val sPersist = spark.newSession()
    sPersist.conf.set("spark.graft.barrier", "persist")
    for (q <- queries) {
      val a = SparkEntry.queries(q)(sLocal, sf)
        .collect().map(_.toString).toSeq
      val b = SparkEntry.queries(q)(sPersist, sf)
        .collect().map(_.toString).toSeq
      assert(a.nonEmpty, s"$q returned no rows")
      assert(a == b, s"$q differs between barrier modes")
    }
  }

  test("unknown barrier mode fails fast with a named error") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.barrier", "reliable")
    val e = intercept[IllegalArgumentException] {
      graft.util.Barrier.barrier(graft.rel.Tables.nation(s2, sf))
    }
    assert(e.getMessage.contains("spark.graft.barrier"))
  }
}
