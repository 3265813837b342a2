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
  * Oracle checkability: alongside the float feature vector (the real
  * product of a decoder), the transform emits integer-exact decode
  * stats (byte_len, big-endian 4-byte header, first-quarter byte sum and
  * count). Those are plain arithmetic over the payload bytes, which
  * DuckDB reproduces on the text source (corpus is ASCII, so character
  * ops = byte ops), making the registered query hash-checkable.
  *
  * At 100 TB: payloads live in the fact table, features are a narrow
  * projection of it; the only shuffle is the final keyed aggregate.
  */
object MultimodalPipeline {

  /** Binary payload + typed metadata (the multimodal column contract). */
  final case class Asset(doc_id: Long, media_type: String,
      payload: Array[Byte])

  final case class Features(doc_id: Long, media_type: String,
      byte_len: Long, header: Long, f0_sum: Long, f0_len: Long,
      feature: Array[Float])

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
        // integer-exact first-quarter stats: the oracle-checkable twin
        // of feature(0) (whose float math is engine-specific)
        val q = math.max(a.payload.length / 4, 1)
        val n = math.min(q, a.payload.length)
        var s = 0L; var i = 0
        while (i < n) { s += (a.payload(i) & 0xff); i += 1 }
        Features(a.doc_id, a.media_type, a.payload.length.toLong, header,
          s, n.toLong, f)
      }
    }
  }

  /** A sampled "frame" of a video-like payload. */
  final case class Frame(doc_id: Long, frame_ix: Int, frame: Array[Byte])

  /** Frame sampling: every `stride`-th fixed-size window of the payload
    * becomes one frame row — the video-frame-sample transform of the
    * multimodal contract. Partition-wise flatMap, no driver
    * materialization; output row count is bounded by
    * payload_len / (frameBytes · stride) per asset. A real decoder
    * yields codec frames here; the windowing, typing, and fan-out shape
    * are what production keeps. */
  def sampleFrames(ds: Dataset[Asset], frameBytes: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      val n = a.payload.length / frameBytes
      (0 until n by stride).map { i =>
        Frame(a.doc_id, i,
          a.payload.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Resize: stride-decimate a payload to at most `target` bytes (the
    * image-resize stand-in — a real implementation convolves pixels;
    * the byte-level stride keeps the contract: deterministic,
    * bounded-output, partition-wise). */
  def resize(ds: Dataset[Asset], target: Int = 256): Dataset[Asset] = {
    import ds.sparkSession.implicits._
    ds.map { a =>
      if (a.payload.length <= target) a
      else {
        val stride = (a.payload.length + target - 1) / target
        val out = new Array[Byte]((a.payload.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = a.payload(i * stride); i += 1 }
        a.copy(payload = out)
      }
    }
  }

  /** Registered query: decode → per-media-type aggregate over the
    * integer-exact decode stats (DuckDB reproduces them from the text
    * bytes — see the oracle below). The float feature vector is
    * spec-tested (MultimodalSpec), not oracle-hashed. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    features(assets(s, d)).toDF()
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum("byte_len").as("total_bytes"),
        sum("header").as("sum_header"),
        graft.util.Det.ratio6(sum("f0_sum"), sum("f0_len")).as("avg_f0"))
      .orderBy("media_type")

  /** DuckDB twin: byte_len/header/first-quarter mean re-derived from the
    * text characters (ASCII corpus ⇒ ord(char) = payload byte). */
  val multimodalFeaturesSql: String =
    """WITH a AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    text, length(text) AS bl,
      |    greatest(length(text) // 4, 1) AS q
      |  FROM documents),
      |hdr AS (
      |  SELECT doc_id, media_type, bl, q, text,
      |    CASE WHEN bl >= 4 THEN
      |      ord(substr(text, 1, 1)) * 16777216 + ord(substr(text, 2, 1)) * 65536
      |      + ord(substr(text, 3, 1)) * 256 + ord(substr(text, 4, 1))
      |    ELSE 0 END AS header
      |  FROM a),
      |pos AS (
      |  SELECT doc_id, unnest(range(1, least(q, bl) + 1)) AS i, text
      |  FROM hdr),
      |f0 AS (
      |  SELECT doc_id, sum(ord(substr(text, CAST(i AS INT), 1))) AS f0_sum,
      |    count(*) AS f0_len
      |  FROM pos GROUP BY doc_id)
      |SELECT media_type, CAST(count(*) AS BIGINT) AS n_assets,
      |  CAST(sum(bl) AS BIGINT) AS total_bytes,
      |  CAST(sum(header) AS BIGINT) AS sum_header,
      |  """.stripMargin +
      graft.util.Det.ratio6Sql("sum(coalesce(f0_sum, 0))",
        "sum(coalesce(f0_len, 0))") +
      """ AS avg_f0
      |FROM hdr LEFT JOIN f0 USING (doc_id)
      |GROUP BY media_type ORDER BY media_type""".stripMargin
}
