package graft.multimodal

import graft.rel.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface, BASELINE.json):
  * image/audio/video-style payloads modelled as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted partition-wise.
  *
  * The container has no codec libraries, so `decodeStub` is a
  * clearly-marked deterministic fake — the Spark-side contract is the
  * real deliverable: binary column + typed metadata schema, a
  * `Dataset[Asset] → Dataset[Features]` mapPartitions transform (the
  * Scala analog of a batched `mapInPandas` decode: one decoder init per
  * partition, streamed rows, no driver materialization), and a
  * downstream aggregation that stays fully relational.
  *
  * At 100 TB: payloads live in the fact table, features are a narrow
  * projection of it; the only shuffle is the final keyed aggregate.
  */
object MultimodalPipeline {

  /** Binary payload + typed metadata (the multimodal column contract). */
  final case class Asset(doc_id: Long, media_type: String,
      payload: Array[Byte])

  final case class Features(doc_id: Long, media_type: String,
      byte_len: Long, header: Long, feature: Array[Float])

  /** STUB — stands in for a real image/audio decoder (libs unavailable
    * here). Deterministic fake: 4 "channel features" = mean byte value
    * of each quarter of the payload. Replace the body with a codec call
    * (e.g. TwelveMonkeys/javacv) in a real deployment; the signature and
    * batch shape are what production code keeps. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload.isEmpty) return Array(0f, 0f, 0f, 0f)
    val q = math.max(payload.length / 4, 1)
    (0 until 4).map { i =>
      val slice = payload.slice(i * q, math.min((i + 1) * q, payload.length))
      if (slice.isEmpty) 0f
      else slice.map(b => (b & 0xff).toFloat).sum / slice.length
    }.toArray
  }

  /** Assets view: documents' text bytes stand in for media payloads;
    * media_type derived deterministically from doc_id. */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Asset]
  }

  /** Partition-wise decode: one decoder context per partition, rows
    * streamed through it — the batched-UDF execution shape. */
  def features(ds: Dataset[Asset]): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts are
      // not serializable; never construct them on the driver)
      it.map { a =>
        val f = decodeStub(a.payload)
        val header = if (a.payload.length >= 4)
          ((a.payload(0) & 0xffL) << 24) | ((a.payload(1) & 0xffL) << 16) |
            ((a.payload(2) & 0xffL) << 8) | (a.payload(3) & 0xffL)
        else 0L
        Features(a.doc_id, a.media_type, a.payload.length.toLong, header, f)
      }
    }
  }

  /** Registered query: decode → per-media-type feature aggregate.
    * No DuckDB oracle (binary decode isn't SQL-expressible) → the
    * driver records a rows-only check. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    features(assets(s, d)).toDF()
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum("byte_len").as("total_bytes"),
        round(avg(element_at(col("feature"), 1)), 4).as("avg_f0"))
      .orderBy("media_type")
}
