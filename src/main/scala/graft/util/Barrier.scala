package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The lineage-barrier primitive behind every shared/memoized build
  * (TrajModel.shared, SimQueries.shared, the simhash/minhash signature
  * barriers, the multimodal decode memo): evaluate an expensive
  * relation ONCE and let many downstream plans consume the
  * materialized rows instead of re-deriving them.
  *
  * Two modes, selected per session via `spark.graft.barrier`
  * (VERDICT r13 ask #6):
  *
  *  - `local` (default) — `localCheckpoint(eager = false)`: executor-
  *    local blocks, lineage CUT. Fastest on local[n] and the right
  *    choice for a single-JVM session, but on a real cluster a lost
  *    executor loses blocks that, with lineage severed, cannot be
  *    recomputed — the job dies (SCALING.md §"what changes on a
  *    cluster").
  *  - `persist` — `persist(StorageLevel.DISK_ONLY)`: blocks spill to
  *    executor disk but LINEAGE IS KEPT, so a lost executor's blocks
  *    recompute from source — the cluster-safe idiom standing in for
  *    the persisted/bucketed silver tables a production deployment
  *    would use. Every barriered build in this library is
  *    deterministic (hash signatures, sorted gathers, exact-integer
  *    k-means), so a recomputed partition is bit-identical to the lost
  *    one and query results are unaffected (BarrierModeSpec pins
  *    this).
  *
  * `eager` materializes the barrier immediately (the iterative
  * connected-components loop pins each round before planning the
  * next); in persist mode a `count()` forces the blocks, in local mode
  * `localCheckpoint(eager = true)` does.
  */
object Barrier {
  private val Key = "spark.graft.barrier"

  private def mode(df: DataFrame): String = {
    val m = df.sparkSession.conf.get(Key, "local")
    require(m == "local" || m == "persist",
      s"$Key must be 'local' or 'persist', got '$m'")
    m
  }

  /** Lazy barrier: materializes on first action, reused after. */
  def barrier(df: DataFrame): DataFrame = mode(df) match {
    case "local" => df.localCheckpoint(false)
    case "persist" => df.persist(StorageLevel.DISK_ONLY)
  }

  /** Eager barrier: blocks are materialized before this returns — the
    * iterative-loop form (each CC round must pin before the next round
    * plans on top of it). */
  def barrierEager(df: DataFrame): DataFrame = mode(df) match {
    case "local" => df.localCheckpoint()
    case "persist" =>
      val p = df.persist(StorageLevel.DISK_ONLY)
      p.count()
      p
  }

  /** `df.graftBarrier` / `df.graftBarrierEager` postfix forms — the
    * call-site syntax every shared build uses. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def graftBarrier: DataFrame = barrier(df)
    def graftBarrierEager: DataFrame = barrierEager(df)
  }
}
