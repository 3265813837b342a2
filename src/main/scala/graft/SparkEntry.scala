package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries are assembled from the per-domain inventories:
  *  - graft.rel.RelQueries    — relational ops over the star schema
  *  - graft.traj.TrajQueries  — trajectory geometry (reference parity)
  *  - graft.text.TextQueries  — dedup / text-analysis (north-star)
  *  - graft.sim.SimQueries    — similarity search (north-star)
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    rel.RelQueries.defs ++
      traj.TrajQueries.defs ++
      text.TextQueries.defs ++
      sim.SimQueries.defs :+
      // cross-domain (text + sim): the composed end-to-end dedup
      // pipeline lives outside the per-domain inventories
      QueryDef("q_dedup_pipeline", text.DedupPipeline.dedupPipeline,
        Some(text.DedupPipeline.dedupPipelineSql)) :+
      QueryDef("q_multimodal_features",
        multimodal.MultimodalPipeline.multimodalFeatures,
        Some(multimodal.MultimodalPipeline.multimodalFeaturesSql)) :+
      QueryDef("q_multimodal_image",
        multimodal.MultimodalPipeline.multimodalImage,
        Some(multimodal.MultimodalPipeline.multimodalImageSql)) :+
      QueryDef("q_multimodal_video",
        multimodal.MultimodalPipeline.multimodalVideo,
        Some(multimodal.MultimodalPipeline.multimodalVideoSql)) :+
      QueryDef("q_multimodal_audio",
        multimodal.MultimodalPipeline.multimodalAudio,
        Some(multimodal.MultimodalPipeline.multimodalAudioSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    rel.RelQueries.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
