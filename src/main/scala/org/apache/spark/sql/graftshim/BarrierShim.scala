package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** The one Spark-internals bridge in this library (scoped to a
  * subpackage of `org.apache.spark.sql` for `private[sql]` access —
  * the same technique Spark's own connectors and e.g. frameless use).
  *
  * [[persistRowBlocks]] is `Dataset.checkpoint(eager = false,
  * reliableCheckpoint = false)` — i.e. `localCheckpoint` — minus the
  * ONE call that makes localCheckpoint cluster-unsafe: it copies the
  * physical rows, persists the RDD, and rebuilds a DataFrame over a
  * [[LogicalRDD]] via the same `fromDataset` helper Spark's
  * checkpoint uses (partitioning/ordering preserved), but does NOT
  * mark the RDD for lineage truncation. Result:
  *
  *  - blocks are plain deserialized row blocks (BarrierCostProbe:
  *    consumer reads 0.17 s vs 0.49 s through the InMemoryRelation
  *    columnar cache on the shared array-column barrier shape — the
  *    sf0.1 persist-mode regression of VERDICT r16 next #2 lived in
  *    that columnar read path, not in disk IO);
  *  - the RDD's lineage is KEPT, so a lost executor's blocks
  *    recompute from the parent chain exactly like any uncheckpointed
  *    RDD — the executor-loss-safety property persist mode exists for;
  *  - the returned plan is a genuine plan barrier (the SQL tree is
  *    cut), so downstream consumers plan against a leaf instead of
  *    re-optimizing the full build lineage.
  *
  * Laziness matches `persist`: blocks materialize on the first action
  * and are reused after. */
object BarrierShim {
  def persistRowBlocks(df: DataFrame, level: StorageLevel): DataFrame =
    persistRowBlocksHandle(df, level)._1

  /** Same, returning the persisted RDD so a caller that manages
    * lifetimes (BarrierCostProbe) can unpersist it. */
  def persistRowBlocksHandle(df: DataFrame, level: StorageLevel)
      : (DataFrame, RDD[InternalRow]) = {
    val cds = df.asInstanceOf[ClassicDataset[_]]
    val rdd: RDD[InternalRow] =
      cds.queryExecution.toRdd.map(_.copy()).persist(level)
    (ClassicDataset.ofRows(cds.sparkSession,
      LogicalRDD.fromDataset(rdd, cds, isStreaming = false)), rdd)
  }
}
