package graft.multimodal

import graft.rel.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface, BASELINE.json):
  * image/audio/video-style payloads modelled as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted partition-wise.
  *
  * The IMAGE path decodes for real: `javax.imageio` ships in the base
  * JDK, so image assets carry genuine PNG payloads (generated
  * deterministically per doc by [[imagePayload]], encoded with
  * `ImageIO.write`) and [[imageFeatures]] decodes them partition-wise
  * with `ImageIO.read`, emitting integer-exact pixel stats (width,
  * height, per-channel sums) plus the float feature vector a production
  * pipeline would keep. Because the pixel values are a closed-form
  * function of (doc_id, x, y) and PNG is lossless, the DuckDB oracle
  * reproduces the stats by plain arithmetic — the registered
  * `q_multimodal_image` hash-checks the full encode → decode → stats
  * round-trip end to end.
  *
  * AUDIO/VIDEO stay on `decodeStub` — the container genuinely lacks
  * audio/video codec libraries — so the contract deliverable for those
  * two types is the Spark-side plumbing: binary column + typed metadata
  * schema, a `Dataset[Asset] → Dataset[Features]` mapPartitions
  * transform (the Scala analog of a batched `mapInPandas` decode: one
  * decoder init per partition, streamed rows, no driver
  * materialization), and a downstream aggregation that stays fully
  * relational.
  *
  * Oracle checkability of the stub path: alongside the float feature
  * vector, the transform emits integer-exact decode stats (byte_len,
  * big-endian 4-byte header, first-quarter byte sum and count). Those
  * are plain arithmetic over the payload bytes, which DuckDB reproduces
  * on the text source (corpus is ASCII, so character ops = byte ops),
  * making the registered `q_multimodal_features` (audio/video)
  * hash-checkable.
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

  /** STUB — stands in for a real AUDIO/VIDEO decoder only (those codec
    * libs are unavailable here; images decode for real — see
    * [[imageFeatures]]). Deterministic fake: 4 "channel features" =
    * mean byte value of each quarter of the payload. Replace the body
    * with a codec call (e.g. javacv) in a real deployment; the
    * signature and batch shape are what production code keeps. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload.isEmpty) return Array(0f, 0f, 0f, 0f)
    val q = math.max(payload.length / 4, 1)
    (0 until 4).map { i =>
      val slice = payload.slice(i * q, math.min((i + 1) * q, payload.length))
      if (slice.isEmpty) 0f
      else slice.map(b => (b & 0xff).toFloat).sum / slice.length
    }.toArray
  }

  /** Deterministic synthetic PNG for `doc_id`: a `width × height`
    * truecolor image (width = 8 + id%9 ∈ [8,16], height = 8 + id%7 ∈
    * [8,14]) whose pixel (x,y) has channels
    * `r = (id·7 + 3x + 5y) mod 256`, `g = (id·11 + x + 2y) mod 256`,
    * `b = (id·13 + 2x + y) mod 256`, encoded with the JDK's own
    * `ImageIO` PNG writer. PNG truecolor is lossless, so a decoder must
    * reproduce these values exactly — which is what lets the DuckDB
    * oracle check the decode by recomputing the same arithmetic. */
  def imagePayload(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 9).toInt
    val h = 8 + (docId % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((docId * 11 + x + y * 2) % 256).toInt
        val b = ((docId * 13 + x * 2 + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Assets view: image-typed docs carry a real PNG payload
    * ([[imagePayload]]); audio/video carry the documents' text bytes as
    * opaque stand-in payloads. media_type derived deterministically
    * from doc_id. */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Asset]
      .map(a =>
        if (a.media_type == "image") a.copy(payload = imagePayload(a.doc_id))
        else a)
  }

  /** Per-image decode product: integer-exact pixel stats (the
    * oracle-checkable part) + the float feature a production pipeline
    * keeps (mean channel values, pixel count). */
  final case class ImageFeatures(doc_id: Long, width: Long, height: Long,
      r_sum: Long, g_sum: Long, b_sum: Long, feature: Array[Float])

  /** REAL partition-wise image decode via the JDK's `javax.imageio` —
    * no external codec needed for PNG/BMP/GIF. One decoder-context
    * setup per partition (`setUseCache(false)`: in-memory decode, no
    * temp-file spooling), rows streamed through it. */
  def imageFeatures(ds: Dataset[Asset]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        require(img != null,
          s"doc ${a.doc_id}: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            rs += (rgb >> 16) & 0xff
            gs += (rgb >> 8) & 0xff
            bs += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w * h).toFloat
        ImageFeatures(a.doc_id, w.toLong, h.toLong, rs, gs, bs,
          Array(rs / n, gs / n, bs / n, n))
      }
    }
  }

  /** Partition-wise decode: one decoder context per partition, rows
    * streamed through it — the batched-UDF execution shape. Image rows
    * get the real `ImageIO` decode for their float feature (mean
    * channel values + pixel count); audio/video go through the
    * documented stub. The integer byte stats are payload arithmetic in
    * both cases. */
  def features(ds: Dataset[Asset]): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init (codec contexts are not
      // serializable; never construct them on the driver)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val f =
          if (a.media_type == "image") {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.payload))
            require(img != null,
              s"doc ${a.doc_id}: payload is not a decodable image")
            val w = img.getWidth
            val h = img.getHeight
            var rs = 0L; var gs = 0L; var bs = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                rs += (rgb >> 16) & 0xff
                gs += (rgb >> 8) & 0xff
                bs += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = (w * h).toFloat
            Array(rs / n, gs / n, bs / n, n)
          } else decodeStub(a.payload)
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

  /** Registered query (stub path): decode → per-media-type aggregate
    * over the integer-exact decode stats for the AUDIO/VIDEO assets
    * (DuckDB reproduces them from the text bytes — see the oracle
    * below). Image assets carry PNG payloads whose byte stats DuckDB
    * cannot re-derive; they are covered by the stronger
    * [[multimodalImage]] pixel-level oracle instead. The float feature
    * vector is spec-tested (MultimodalSpec), not oracle-hashed. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    features(assets(s, d)).toDF()
      .where(col("media_type") =!= "image")
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
      |  FROM documents WHERE doc_id % 3 <> 0),
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

  /** Image-typed assets only (real PNG payloads, one per image doc). */
  def imageAssets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).where(col("doc_id") % 3 === 0)
      .as[Long]
      .map(id => Asset(id, "image", imagePayload(id)))
  }

  /** Registered query (real-decode path): generate PNG payloads,
    * decode them with `javax.imageio`, emit per-doc integer-exact pixel
    * stats. The DuckDB oracle recomputes the same stats from the pixel
    * formula ([[imagePayload]]) without ever seeing a PNG — a green row
    * proves the encode → decode → stats round-trip bit-exactly.
    *
    * Reference tie-in: the multimodal-columns north-star row
    * (BASELINE.json) — decode / feature-extract as a partition-wise
    * transform over opaque binary columns. */
  def multimodalImage(s: SparkSession, d: String): DataFrame =
    imageFeatures(imageAssets(s, d)).toDF()
      .select("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")
      .orderBy("doc_id")

  /** DuckDB twin of [[multimodalImage]]: pixel channel values re-derived
    * arithmetically from (doc_id, x, y); the static 16×14 grid is the
    * max image size, filtered per doc to its true w×h. */
  val multimodalImageSql: String =
    """WITH img AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (SELECT unnest(range(0, 16)) AS x),
      |ys AS (SELECT unnest(range(0, 14)) AS y),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
      |    (doc_id * 11 + x + y * 2) % 256 AS g,
      |    (doc_id * 13 + x * 2 + y) % 256 AS b
      |  FROM img, xs, ys WHERE x < w AND y < h)
      |SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
      |  CAST(max(h) AS BIGINT) AS height,
      |  CAST(sum(r) AS BIGINT) AS r_sum,
      |  CAST(sum(g) AS BIGINT) AS g_sum,
      |  CAST(sum(b) AS BIGINT) AS b_sum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
