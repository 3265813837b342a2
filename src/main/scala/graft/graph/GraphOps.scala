package graft.graph

import graft.util.Barrier.BarrierOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline.
  *
  * The near-dup tiers (minhash / simhash / ngram / embedding LSH) emit
  * PAIRS; an actual dedup pass needs CLUSTERS — "these 5 docs are one
  * group, keep the canonical one". The bridge is connected components
  * over the pair graph, and the published MapReduce-native algorithm is
  * the alternating large-star/small-star of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SOCC '14): every round is a
  * pair of keyed aggregations + joins (no vertex-program framework
  * needed), and alternation converges in O(log² n) rounds on any graph
  * — NOT O(diameter) like naive min-label flooding, which dies on path
  * graphs (GraphOpsSpec pins a 256-node path converging inside the
  * 30-round cap where flooding would need 255 rounds).
  *
  * Scale design (100 TB): the edge set entering CC is the OUTPUT of a
  * near-dup tier — bounded by candidate pairs, orders of magnitude
  * smaller than the corpus. Each round shuffles the current edge set
  * twice, keyed by node id; edges only ever get replaced by
  * (node → smaller-node) pointers, so the set shrinks toward one star
  * edge per non-root node. Each round pins its edge set behind an
  * eager LINEAGE-CUTTING barrier (graft.util.Barrier.barrierEager —
  * reliable checkpoint() when a checkpoint dir is configured, else
  * localCheckpoint): a lineage-keeping cache here would nest each
  * round's plan ~4× into the next (both largeStar orientations plus
  * smallStar's self-join), an exponential tree that OOM'd the driver
  * on a 64-node path graph when tried (r15); see the Barrier scaladoc
  * caveat. On a cluster, set a checkpoint dir to keep the loop
  * executor-loss-safe.
  */
object GraphOps {

  /** Star-shapedness probe: nodes that appear both as a `lo` and as a
    * `hi` in the canonical (lo < hi) edge set — empty exactly when the
    * set is a union of stars rooted at their minima (the CC fixpoint).
    * ONE scan and ONE shuffle: both roles unpivot via an in-row
    * explode, then a single keyed aggregation with map-side partials.
    * The previous `intersect` probe planned a distinct on each side of
    * a join — two scans and three exchanges per round on the hot loop
    * of every near-dup clustering run. */
  private[graft] def starProbe(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("lo").as("n"), lit(1).as("l"), lit(0).as("h")),
        struct(col("hi").as("n"), lit(0).as("l"), lit(1).as("h"))))
        .as("e"))
      .select("e.n", "e.l", "e.h")
      .groupBy("n").agg(max("l").as("l"), max("h").as("h"))
      .filter(col("l") === 1 && col("h") === 1)

  /** Connected components of an undirected graph.
    *
    * @param edges0 two integral columns (endpoint ids); direction and
    *               duplicates are ignored, self-loops dropped.
    * @return ("node" LONG, "cluster" LONG) — one row per node that
    *         appears in some edge; cluster = min node id of its
    *         component. Isolated nodes (no edges) do not appear; callers
    *         coalesce(cluster, id) after an outer join.
    */
  def connectedComponents(edges0: DataFrame, maxRounds: Int = 30): DataFrame = {
    val cs = edges0.columns
    require(cs.length == 2, s"edges need 2 columns, got ${cs.mkString(",")}")

    // canonical undirected form: (lo < hi), distinct, no self-loops
    def canon(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Seq(least(a, b).as("lo"), greatest(a, b).as("hi"))

    // no up-front distinct: the first large-star's own distinct dedups,
    // and duplicate input edges don't change any per-node min
    var edges = edges0
      .select(canon(col(cs(0)).cast("long"), col(cs(1)).cast("long")): _*)
      .filter(col("lo").isNotNull && col("lo") =!= col("hi"))
      .graftBarrierEager // eager: pin the input before iterating (Barrier scaladoc)

    /** Large-star: for every node u, attach its LARGER neighbors to
      * m(u) = min(Γ(u) ∪ {u}). Runs on both orientations. */
    def largeStar(e: DataFrame): DataFrame = {
      val dir = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = dir.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // no distinct: small-star's groupBy dedups the per-node mins and
      // its trailing distinct canonicalizes the round's output — one
      // less shuffle stage per round
      dir.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(canon(col("v"), col("m")): _*)
        .filter(col("lo") =!= col("hi"))
    }

    /** Small-star: for every node u, attach its SMALLER neighbors (and
      * u itself) to m(u) = min of those neighbors. Runs on the hi→lo
      * orientation only. */
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("hi").agg(min("lo").as("m"))
      val members = e.join(mins, "hi")
        .select(col("m").as("lo"), col("lo").as("hi"))
      val roots = mins.select(col("m").as("lo"), col("hi"))
      members.union(roots)
        .filter(col("lo") =!= col("hi"))
        .distinct()
    }

    // Convergence = the edge set is a union of stars rooted at their
    // minima, which under the canonical (lo < hi) form is exactly "no
    // node appears both as a lo and as a hi". Both operations preserve
    // connectivity and any such star set is a fixpoint of both, so the
    // first star-shaped state IS the answer — one cheap probe per
    // round, detected the same round the stars form (the count+except
    // set-equality check needed an extra confirm round and two probes).
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    def t[T](name: String)(f: => T): T =
      if (!debug) f
      else {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(
          f"[cc] $name%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }

    var round = 0
    var converged = t("init-empty?")(edges.isEmpty)
    while (!converged && round < maxRounds) {
      // ONE action per round (r20-opt): the round's edge set and its
      // star-shapedness violations materialize in the same job — the
      // probe's subtree is the round's own output, so exchange reuse
      // shares the star computation between the two union branches
      // instead of the old second probe job re-reading the pinned
      // edges. Each round previously paid two full job round-trips
      // (barrier + probe); on the hot loop of every near-dup
      // clustering run the probe job's fixed latency was pure
      // overhead. The convergence check and the next round's input
      // are then block-reads of the pinned union — no recompute.
      val next = smallStar(largeStar(edges))
      val pinned = t(s"round $round")(
        next.select(col("lo"), col("hi"), lit(true).as("e"))
          .unionByName(starProbe(next)
            .select(col("n").as("lo"), col("n").as("hi"),
              lit(false).as("e")))
          .graftBarrierEager)
      converged = t(s"probe $round")(
        pinned.filter(!col("e")).isEmpty)
      edges = pinned.filter(col("e")).select("lo", "hi")
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")

    // fixpoint = disjoint stars rooted at component minima
    edges.select(col("hi").as("node"), col("lo").as("cluster"))
      .union(edges.select(col("lo").as("node"), col("lo").as("cluster")))
      .groupBy("node").agg(min("cluster").as("cluster"))
  }
}
