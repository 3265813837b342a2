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
