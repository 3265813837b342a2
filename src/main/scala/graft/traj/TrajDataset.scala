package graft.traj

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed wide-layout trajectory facade (SURVEY §1.4): one row per frame,
  * positions as an [n_atoms][3] nested array — the direct analog of the
  * reference's frame-chunked `xyz` column
  * (core/dask_traj.py:364-436). */
final case class TrajFrame(
    frame_id: Long,
    n_atoms: Int,
    xyz: Seq[Seq[Double]],
    box: Option[Seq[Double]])

object TrajDataset {

  /** Long (frame_id, atom_id, x, y, z[, box_x, box_y, box_z]) → wide
    * Dataset[TrajFrame]. sort_array on the (atom_id, …) struct pins
    * atom order inside each frame, so the array layout is
    * deterministic. Per-frame unitcell columns (box_x/y/z — constant
    * within a frame, as in the xyz source) carry through as the typed
    * box when present. One shuffle, keyed on frame_id — the frame axis
    * stays the partitioning axis, exactly the reference's chunking
    * discipline (§1.3). */
  def wide(positions: DataFrame): Dataset[TrajFrame] = {
    val spark = positions.sparkSession
    import spark.implicits._
    val hasBox = Seq("box_x", "box_y", "box_z")
      .forall(positions.columns.contains)
    val boxAgg =
      if (hasBox)
        // per-frame constant: min == the value; null components → no box
        when(min("box_x").isNull, lit(null).cast("array<double>"))
          .otherwise(array(min("box_x").cast("double"),
            min("box_y").cast("double"), min("box_z").cast("double")))
      else first(lit(null).cast("array<double>"))
    positions
      .groupBy("frame_id")
      .agg(sort_array(collect_list(struct(
        col("atom_id"), col("x"), col("y"), col("z")))).as("atoms"),
        boxAgg.as("box"))
      .select(
        col("frame_id"),
        size(col("atoms")).as("n_atoms"),
        expr("transform(atoms, a -> array(a.x, a.y, a.z))").as("xyz"),
        col("box"))
      .as[TrajFrame]
  }

  /** §1.1 derived/virtual unitcell columns: a gro-sourced frame carries
    * the 3×3 unitcell VECTORS (bv1x..bv3z); lengths and angles are
    * lazily derivable (utils/validation.py:232-292 — the reference
    * computes them on property access, core/dask_traj.py:562-589).
    * Pure Column expressions appended to the plan: nothing evaluates
    * unless the derived columns are referenced — the same
    * computed-column laziness as the reference, but via Catalyst. */
  def withUnitcellLengthsAngles(df: DataFrame): DataFrame =
    TrajOps.vectorsToBox(
      col("bv1x"), col("bv1y"), col("bv1z"),
      col("bv2x"), col("bv2y"), col("bv2z"),
      col("bv3x"), col("bv3y"), col("bv3z"))
      .foldLeft(df) { case (d, (n, c)) =>
        d.withColumn(n.replace("r_", "unitcell_"), c)
      }

  /** Concat-join compatibility validation (core/dask_traj.py:608-627:
    * the reference refuses to join trajectories whose atom sets differ;
    * the check runs eagerly at join time). Both directions of the
    * set difference must be empty. */
  def joinCompatible(a: DataFrame, b: DataFrame): Boolean = {
    val na = a.select("atom_id").distinct()
    val nb = b.select("atom_id").distinct()
    na.except(nb).isEmpty && nb.except(na).isEmpty
  }

  /** Wide atom-map form: one row per frame with an atom_id →
    * (x, y, z) map — the positional-gather layout. The reference's
    * distance kernel gathers xyz[:, pairs] straight out of the wide
    * per-frame array (geometry/distance.py:131-141); element_at on
    * this map is the Catalyst form of that gather (SURVEY §2.3 J2's
    * "array-gather via higher-order functions on the wide layout").
    * One shuffle (the frame grouping); lookups are per-row map probes,
    * no joins. */
  def atomMap(positions: DataFrame): DataFrame =
    positions
      .groupBy("frame_id")
      .agg(map_from_entries(sort_array(collect_list(struct(
        col("atom_id"),
        struct(col("x"), col("y"), col("z")))))).as("atoms"))

  /** Wide → long: posexplode over the atom axis (the §1.4 exploded
    * relational view used by the oracle queries). */
  def long(frames: Dataset[TrajFrame]): DataFrame =
    frames.toDF()
      .select(col("frame_id"),
        posexplode(col("xyz")).as(Seq("atom_ix", "coords")))
      .select(col("frame_id"), col("atom_ix"),
        col("coords").getItem(0).as("x"),
        col("coords").getItem(1).as("y"),
        col("coords").getItem(2).as("z"))
}
