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
  *    this). CAVEAT (ADVICE r14): because lineage is kept, persist is
  *    a CACHE, not a plan barrier. That is fine for the one-shot
  *    shared builds [[barrier]] serves (single-level plans), but it
  *    CANNOT serve iteration: each loop round's logical plan would
  *    nest the previous round's plan several times over (cache
  *    substitution happens after analysis), growing the tree
  *    exponentially with round count — measured r15: connected
  *    components on a 64-node path graph OOM'd the driver's
  *    explainString before converging.
  *
  * [[barrierEager]] — the iterative-loop form — therefore ALWAYS cuts
  * lineage, in every mode: reliable `checkpoint()` when
  * `sparkContext.getCheckpointDir` is configured (lineage cut AND
  * blocks in the fault-tolerant store — the correct cluster
  * deployment, which should always set a checkpoint dir when running
  * iterative dedup clustering), `localCheckpoint(eager = true)`
  * otherwise (including persist mode, as the documented
  * executor-loss-unsafe fallback — on a cluster, configure the
  * checkpoint dir instead).
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

  /** Eager barrier: blocks are materialized AND LINEAGE IS CUT before
    * this returns — the iterative-loop form (each CC round must pin
    * before the next round plans on top of it, and keeping lineage
    * across rounds nests plans exponentially — see class scaladoc
    * caveat). Reliable `checkpoint()` ONLY in `persist` mode with a
    * checkpoint dir configured (cluster-safe: blocks recoverable from
    * the fault-tolerant store); `localCheckpoint(eager = true)`
    * otherwise. The mode gate matters (ADVICE r15): a default-`local`
    * session that happens to carry a checkpoint dir for unrelated
    * user code must NOT silently upgrade every loop round to
    * double-compute-plus-disk-write reliable checkpointing — `local`
    * means local, unconditionally.
    *
    * The persist leg caches before checkpointing: a bare
    * `checkpoint()` runs the round's job twice (Spark recomputes the
    * plan to write the checkpoint files), so the round is pinned to
    * DISK_ONLY first, the checkpoint write reads those blocks instead
    * of recomputing, and the transient cache entry is dropped once
    * the reliable copy exists. */
  def barrierEager(df: DataFrame): DataFrame = mode(df) match {
    case "persist"
        if df.sparkSession.sparkContext.getCheckpointDir.isDefined =>
      val cached = df.persist(StorageLevel.DISK_ONLY)
      try cached.checkpoint()
      finally cached.unpersist(false)
    case _ => df.localCheckpoint()
  }

  /** `df.graftBarrier` / `df.graftBarrierEager` postfix forms — the
    * call-site syntax every shared build uses. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def graftBarrier: DataFrame = barrier(df)
    def graftBarrierEager: DataFrame = barrierEager(df)
  }
}
