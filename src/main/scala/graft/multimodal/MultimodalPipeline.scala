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
  * The AUDIO path decodes for real too: `javax.sound.sampled` ships in
  * the JDK, so audio assets carry genuine WAV/PCM16 payloads
  * ([[audioPayload]]) and [[audioFeatures]] decodes them
  * partition-wise with integer-exact sample stats, hash-checked by the
  * registered `q_multimodal_audio`. Only VIDEO stays on `decodeStub` —
  * the JDK genuinely has no video codec — so the contract deliverable
  * for that type is the Spark-side plumbing: binary column + typed
  * metadata schema, a `Dataset[Asset] → Dataset[Features]`
  * mapPartitions transform (the Scala analog of a batched
  * `mapInPandas` decode: one decoder init per partition, streamed
  * rows, no driver materialization), and a downstream aggregation that
  * stays fully relational.
  *
  * Oracle checkability of the stub path: alongside the float feature
  * vector, the transform emits integer-exact decode stats (byte_len,
  * big-endian 4-byte header, first-quarter byte sum and count). Those
  * are plain arithmetic over the payload bytes, which DuckDB reproduces
  * on the text source (corpus is ASCII, so character ops = byte ops),
  * making the registered `q_multimodal_features` (video) hash-checkable.
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

  /** STUB — stands in for a real VIDEO decoder only (video codecs are
    * genuinely unavailable here; images decode for real via
    * `javax.imageio` — [[imageFeatures]] — and audio via the JDK's
    * `javax.sound.sampled` — [[audioFeatures]]). Deterministic fake: 4
    * "channel features" = mean byte value of each quarter of the
    * payload. Replace the body with a codec call (e.g. javacv) in a
    * real deployment; the signature and batch shape are what
    * production code keeps. */
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

  /** Deterministic synthetic WAV for `doc_id`: 16-bit mono PCM at
    * 8 kHz, `n = 200 + id%100` samples with
    * `s(i) = (id·31 + i·17 + 7) mod 65536 − 32768`, encoded with the
    * JDK's own `javax.sound.sampled` WAVE writer. PCM is lossless, so
    * a decoder must reproduce these exact int16 values — which lets
    * the DuckDB oracle check the decode by recomputing the same
    * arithmetic (the audio analog of [[imagePayload]]). */
  def audioPayload(docId: Long): Array[Byte] =
    audioPayload(docId, wavWriter())

  /** `AudioSystem`'s static entry points route every call through a
    * synchronized provider-registry lookup (JDK service cache) — at
    * 32 threads × tens of thousands of rows that lock serializes the
    * whole stage (measured: the audio query scaled 19× for 10× data
    * before, 32 workers queueing on one monitor). The dataset paths
    * therefore resolve the javax.sound SPI providers ONCE per
    * partition via ServiceLoader and call them directly — same public
    * API surface, no global lock in the row loop. */
  private[multimodal] def wavWriter()
      : javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    while (it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE)) return w
    }
    throw new IllegalStateException("no WAVE writer provider in this JDK")
  }

  private[multimodal] def wavReaders()
      : Array[javax.sound.sampled.spi.AudioFileReader] = {
    val out = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    while (it.hasNext) out += it.next()
    out.result()
  }

  /** Sticky provider selection: the first row probes the providers in
    * order and REMEMBERS which one accepted — essential because the
    * JDK ships a MIDI soft-synth AudioFileReader whose rejection probe
    * itself routes through the synchronized `MidiSystem.getProviders`
    * registry (profiled: with naive try-each-provider-per-row, all 32
    * workers sat in that monitor and the audio stage scaled 14× for
    * 10× data; with the sticky reader it is one WAVE-header parse per
    * row). One instance per partition. */
  private[multimodal] final class AudioOpener(
      readers: Array[javax.sound.sampled.spi.AudioFileReader]) {
    private var preferred = -1
    def open(docId: Long, payload: Array[Byte])
        : javax.sound.sampled.AudioInputStream = {
      var skip = -1
      if (preferred >= 0) {
        try return readers(preferred).getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            skip = preferred // just rejected THIS payload: don't re-probe
            preferred = -1
        }
      }
      var i = 0
      while (i < readers.length) {
        if (i != skip) {
          try {
            val s = readers(i).getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            preferred = i
            return s
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
          }
        }
        i += 1
      }
      throw new IllegalArgumentException(
        s"doc $docId: no javax.sound provider decodes this payload")
    }
  }

  private[multimodal] def audioPayload(docId: Long,
      writer: javax.sound.sampled.spi.AudioFileWriter): Array[Byte] = {
    val n = 200 + (docId % 100).toInt
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = ((docId * 31 + i * 17 + 7) % 65536 - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte // PCM WAVE data is little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    writer.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Assets view: image-typed docs carry a real PNG payload
    * ([[imagePayload]]), audio-typed docs a real WAV
    * ([[audioPayload]]); video docs carry the documents' text bytes as
    * opaque stand-in payloads. media_type derived deterministically
    * from doc_id. `only` restricts to one media type WITH the filter
    * applied BEFORE the payload-generating map — the typed `.map` is
    * opaque to Catalyst, so a downstream `.where(media_type)` cannot
    * push past it and would pay PNG/WAV encoding for rows it then
    * discards (measured at 10×: the video-only aggregate spent 80 %
    * of its time encoding other types' payloads). */
  def assets(s: SparkSession, d: String,
      only: Option[String] = None): Dataset[Asset] = {
    import s.implicits._
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
    val filtered = only.fold(base)(t => base.where(col("media_type") === t))
    filtered.as[Asset]
      .mapPartitions { it =>
        // WAVE writer resolved once per partition (see wavWriter)
        lazy val w = wavWriter()
        it.map(a => a.media_type match {
          case "image" => a.copy(payload = imagePayload(a.doc_id))
          case "audio" => a.copy(payload = audioPayload(a.doc_id, w))
          case _ => a
        })
      }
  }

  /** Per-image decode product: integer-exact pixel stats (the
    * oracle-checkable part) + the float feature a production pipeline
    * keeps (mean channel values, pixel count). */
  final case class ImageFeatures(doc_id: Long, width: Long, height: Long,
      r_sum: Long, g_sum: Long, b_sum: Long, feature: Array[Float])


  /** Shared image decode kernel: pixel stats every image consumer
    * agrees on (one implementation — imageFeatures and features()
    * previously carried drifting copies). */
  private[multimodal] def imagePixelStats(docId: Long,
      payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null,
      s"doc $docId: payload is not a decodable image")
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
    (w, h, rs, gs, bs)
  }

  /** Shared audio decode kernel: PCM16-mono validation + sample stats
    * (rate, count, sum, min, max). Samples convert per the stream's
    * own declared endianness, so any conforming PCM16 mono WAV
    * decodes, not just this repo's writer; non-PCM16 payloads fail
    * loudly instead of yielding silently-wrong numbers. */
  private[multimodal] def audioSampleStats(opener: AudioOpener,
      docId: Long, payload: Array[Byte])
      : (Long, Int, Long, Long, Long) = {
    val ais = opener.open(docId, payload)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"doc $docId: expected 16-bit mono signed PCM, got $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    var sum = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    val le = !fmt.isBigEndian
    var i = 0
    while (i < n) {
      val b0 = bytes(2 * i) & 0xff
      val b1 = bytes(2 * i + 1) & 0xff
      val s = (if (le) (b1 << 8) | b0 else (b0 << 8) | b1)
        .toShort.toLong
      sum += s
      if (s < mn) mn = s
      if (s > mx) mx = s
      i += 1
    }
    if (n == 0) { mn = 0L; mx = 0L }
    (fmt.getSampleRate.toLong, n, sum, mn, mx)
  }

  /** REAL partition-wise image decode via the JDK's `javax.imageio` —
    * no external codec needed for PNG/BMP/GIF. One decoder-context
    * setup per partition (`setUseCache(false)`: in-memory decode, no
    * temp-file spooling), rows streamed through it. */
  def imageFeatures(ds: Dataset[Asset]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val (w, h, rs, gs, bs) = imagePixelStats(a.doc_id, a.payload)
        val n = (w * h).toFloat
        ImageFeatures(a.doc_id, w.toLong, h.toLong, rs, gs, bs,
          Array(rs / n, gs / n, bs / n, n))
      }
    }
  }

  /** Per-audio decode product: integer-exact sample stats (the
    * oracle-checkable part) + the float feature a production pipeline
    * keeps (mean amplitude, sample count, rate, peak). */
  final case class AudioFeatures(doc_id: Long, sample_rate: Long,
      n_samples: Long, sample_sum: Long, s_min: Long, s_max: Long,
      feature: Array[Float])

  /** REAL partition-wise audio decode via the JDK's
    * `javax.sound.sampled` — no external codec needed for WAV/PCM.
    * The decoder yields the stream's own declared format; samples
    * convert per that format's endianness, so any conforming PCM16
    * mono WAV decodes, not just this repo's writer. */
  def audioFeatures(ds: Dataset[Asset]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // once per partition, sticky across rows (see AudioOpener)
      val opener = new AudioOpener(wavReaders())
      it.map { a =>
        val (rate, n, sum, mn, mx) =
          audioSampleStats(opener, a.doc_id, a.payload)
        AudioFeatures(a.doc_id, rate, n.toLong, sum, mn, mx,
          Array(if (n == 0) 0f else sum.toFloat / n, n.toFloat,
            rate.toFloat,
            math.max(math.abs(mn), math.abs(mx)).toFloat))
      }
    }
  }

  /** Partition-wise decode: one decoder context per partition, rows
    * streamed through it — the batched-UDF execution shape. Image rows
    * get the real `ImageIO` decode for their float feature (mean
    * channel values + pixel count), audio rows the real `javax.sound`
    * decode (mean amplitude, count, rate, peak); video goes through
    * the documented stub. The integer byte stats are payload
    * arithmetic in all cases. */
  def features(ds: Dataset[Asset]): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init (codec contexts are not
      // serializable; never construct them on the driver)
      javax.imageio.ImageIO.setUseCache(false)
      lazy val audioOpener = new AudioOpener(wavReaders())
      it.map { a =>
        val f =
          if (a.media_type == "image") {
            val (w, h, rs, gs, bs) = imagePixelStats(a.doc_id, a.payload)
            val n = (w * h).toFloat
            Array(rs / n, gs / n, bs / n, n)
          } else if (a.media_type == "audio") {
            val (rate, n, sum, mn, mx) =
              audioSampleStats(audioOpener, a.doc_id, a.payload)
            Array(if (n == 0) 0f else sum.toFloat / n, n.toFloat,
              rate.toFloat, math.max(math.abs(mn), math.abs(mx)).toFloat)
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
    * over the integer-exact decode stats for the VIDEO assets (DuckDB
    * reproduces them from the text bytes — see the oracle below).
    * Image and audio assets carry real PNG/WAV payloads whose byte
    * stats DuckDB cannot re-derive; they are covered by the stronger
    * [[multimodalImage]] / [[multimodalAudio]] decode-level oracles
    * instead. The float feature vector is spec-tested
    * (MultimodalSpec), not oracle-hashed. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    features(assets(s, d, only = Some("video"))).toDF()
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
      |  SELECT doc_id, 'video' AS media_type,
      |    text, length(text) AS bl,
      |    greatest(length(text) // 4, 1) AS q
      |  FROM documents WHERE doc_id % 3 = 2),
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

  /** Audio-typed assets only (real WAV payloads, one per audio doc). */
  def audioAssets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).where(col("doc_id") % 3 === 1)
      .as[Long]
      .map(id => Asset(id, "audio", audioPayload(id)))
  }

  /** Registered query (real-decode path, audio): generate WAV
    * payloads, decode them with `javax.sound.sampled`, emit per-doc
    * integer-exact sample stats. The DuckDB oracle recomputes the same
    * stats from the PCM formula ([[audioPayload]]) without ever seeing
    * a WAV — a green row proves the encode → decode → stats
    * round-trip sample-exactly (the audio analog of
    * [[multimodalImage]]). */
  def multimodalAudio(s: SparkSession, d: String): DataFrame =
    audioFeatures(audioAssets(s, d)).toDF()
      .select("doc_id", "sample_rate", "n_samples", "sample_sum",
        "s_min", "s_max")
      .orderBy("doc_id")

  /** DuckDB twin of [[multimodalAudio]]: int16 sample values re-derived
    * arithmetically from (doc_id, i); the static 0..299 range is the
    * max sample count, filtered per doc to its true n. */
  val multimodalAudioSql: String =
    """WITH au AS (
      |  SELECT doc_id, 200 + doc_id % 100 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |ix AS (SELECT unnest(range(0, 300)) AS i),
      |s AS (
      |  SELECT doc_id, n,
      |    (doc_id * 31 + i * 17 + 7) % 65536 - 32768 AS v
      |  FROM au, ix WHERE i < n)
      |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(max(n) AS BIGINT) AS n_samples,
      |  CAST(sum(v) AS BIGINT) AS sample_sum,
      |  CAST(min(v) AS BIGINT) AS s_min,
      |  CAST(max(v) AS BIGINT) AS s_max
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
