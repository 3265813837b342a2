package graft

import graft.multimodal.MultimodalPipeline
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("AVI payload round-trips: RIFF walk + lossless frame decode " +
    "equals the frame formula pixel-exactly") {
    for (id <- Seq(2L, 5L, 98L, 54323L)) {
      val frames = MultimodalPipeline.decodeAviFrames(id,
        MultimodalPipeline.aviPayload(id))
      val n = 2 + (id % 3).toInt
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 4).toInt
      assert(frames.length == n, s"doc $id frame count")
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y) & 0xffffff
          val want =
            ((((id * 7 + f * 19 + x * 3 + y * 5) % 256).toInt << 16) |
              (((id * 11 + f * 23 + x + y * 2) % 256).toInt << 8) |
              ((id * 13 + f * 29 + x * 2 + y) % 256).toInt)
          assert(rgb == want, s"doc $id frame $f pixel ($x,$y)")
        }
      }
    }
  }

  test("real MJPEG-in-AVI decode: container structure exact, channel " +
    "means within lossy-codec tolerance") {
    for (id <- Seq(2L, 11L, 305L)) {
      val frames = MultimodalPipeline.decodeAviFrames(id,
        MultimodalPipeline.aviPayload(id, mjpeg = true))
      val n = 2 + (id % 3).toInt
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 4).toInt
      assert(frames.length == n, s"doc $id frame count")
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == w && img.getHeight == h)
        var rs = 0L; var gs = 0L; var bs = 0L
        var wr = 0L; var wg = 0L; var wb = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y)
          rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff
          bs += rgb & 0xff
          wr += (id * 7 + f * 19 + x * 3 + y * 5) % 256
          wg += (id * 11 + f * 23 + x + y * 2) % 256
          wb += (id * 13 + f * 29 + x * 2 + y) % 256
        }
        val px = (w * h).toDouble
        // JPEG is lossy but approximately DC-preserving: the per-frame
        // channel means must land near the formula's
        assert(math.abs(rs / px - wr / px) < 16, s"doc $id frame $f r")
        assert(math.abs(gs / px - wg / px) < 16, s"doc $id frame $f g")
        assert(math.abs(bs / px - wb / px) < 16, s"doc $id frame $f b")
      }
    }
  }

  test("decodeAviFrames rejects non-AVI payloads and truncated " +
    "containers loudly") {
    val e1 = intercept[IllegalArgumentException] {
      MultimodalPipeline.decodeAviFrames(1L, "not an avi at all".getBytes)
    }
    assert(e1.getMessage.contains("RIFF"))
    val good = MultimodalPipeline.aviPayload(2L)
    val torn = java.util.Arrays.copyOf(good, good.length - 7)
    intercept[IllegalArgumentException] {
      MultimodalPipeline.decodeAviFrames(2L, torn)
    }
  }

  test("frame sampling and resize keep the partition-wise batch shape") {
    val ds = MultimodalPipeline.assets(spark, SparkTestBase.sf)
    val frames = MultimodalPipeline.sampleFrames(ds, frameBytes = 32,
      stride = 2)
    val f = frames.filter(_.doc_id == 0L).collect()
    assert(f.nonEmpty)
    assert(f.forall(_.frame.length == 32))
    assert(f.map(_.frame_ix).toSeq == f.map(_.frame_ix).toSeq.sorted)
    // frame 0 is the payload's first 32 bytes
    val payload0 = ds.filter(_.doc_id == 0L).collect().head.payload
    assert(f.head.frame.toSeq == payload0.slice(0, 32).toSeq)
    val resized = MultimodalPipeline.resize(ds, target = 100)
    assert(resized.collect().forall(_.payload.length <= 100))
    // resize is a no-op under the target
    val small = MultimodalPipeline.resize(ds, target = 100000)
    assert(small.filter(_.doc_id == 0L).collect().head
      .payload.toSeq == payload0.toSeq)
  }

  test("binary payload pipeline: schema, header word, feature batch") {
    val ds = MultimodalPipeline.assets(spark, SparkTestBase.sf)
    val feats = MultimodalPipeline.features(ds)
    val row = feats.filter(_.doc_id == 0L).collect().head
    assert(row.byte_len > 0)
    assert(row.feature.length == 4)
    // header = first 4 payload bytes big-endian; payloads are UTF-8 text
    assert(row.header > 0)
    val agg = MultimodalPipeline.multimodalFeatures(spark, SparkTestBase.sf)
      .collect()
    // image/audio rows live under the per-doc real-decode
    // q_multimodal_image / q_multimodal_audio queries; this aggregate
    // is the video container-level rollup (also real decode, r12)
    assert(agg.map(_.getAs[String]("media_type")).toSet == Set("video"))
    assert(agg.head.getAs[Long]("n_frames") >=
      2 * agg.head.getAs[Long]("n_assets"))
  }

  test("registered video query matches the closed-form stats per " +
    "(doc, frame)") {
    val got = MultimodalPipeline.multimodalVideo(spark, SparkTestBase.sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val f = row.getAs[Int]("frame_ix")
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 4).toInt
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        rs += (id * 7 + f * 19 + x * 3 + y * 5) % 256
        gs += (id * 11 + f * 23 + x + y * 2) % 256
        bs += (id * 13 + f * 29 + x * 2 + y) % 256
      }
      assert(row.getAs[Long]("width") == w && row.getAs[Long]("height") == h)
      assert(row.getAs[Long]("r_sum") == rs, s"doc $id frame $f r_sum")
      assert(row.getAs[Long]("g_sum") == gs, s"doc $id frame $f g_sum")
      assert(row.getAs[Long]("b_sum") == bs, s"doc $id frame $f b_sum")
    }
  }

  test("real audio decode: hand-computed sample stats on a known WAV") {
    import spark.implicits._
    // four hand-chosen int16 samples through the JDK's own WAVE writer
    val samples = Array[Short](0, 1000, -32768, 32767)
    val pcm = new Array[Byte](8)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val ds = Seq(MultimodalPipeline.Asset(5L, "audio", bos.toByteArray))
      .toDS()
    val f = MultimodalPipeline.audioFeatures(ds).collect().head
    assert(f.sample_rate == 8000L && f.n_samples == 4L)
    assert(f.sample_sum == 0L + 1000 - 32768 + 32767) // 999
    assert(f.s_min == -32768L && f.s_max == 32767L)
    assert(f.feature.toSeq == Seq(999f / 4, 4f, 8000f, 32768f))
  }

  test("WAV payload round-trips: javax.sound decode equals the PCM " +
    "formula; registered audio query matches per doc") {
    for (id <- Seq(1L, 4L, 97L, 54322L)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(
          MultimodalPipeline.audioPayload(id)))
      val bytes = ais.readAllBytes(); ais.close()
      val n = 200 + (id % 100).toInt
      assert(bytes.length == 2 * n)
      for (i <- 0 until n) {
        val got = (((bytes(2 * i + 1) & 0xff) << 8) |
          (bytes(2 * i) & 0xff)).toShort.toLong
        assert(got == (id * 31 + i * 17 + 7) % 65536 - 32768,
          s"doc $id sample $i")
      }
    }
    val got = MultimodalPipeline.multimodalAudio(spark, SparkTestBase.sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val n = 200 + (id % 100).toInt
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      for (i <- 0 until n) {
        val v = id * 31 + i * 17 + 7
        val s = v % 65536 - 32768
        sum += s; mn = math.min(mn, s); mx = math.max(mx, s)
      }
      assert(row.getAs[Long]("n_samples") == n, s"doc $id n")
      assert(row.getAs[Long]("sample_sum") == sum, s"doc $id sum")
      assert(row.getAs[Long]("s_min") == mn && row.getAs[Long]("s_max")
        == mx, s"doc $id min/max")
    }
  }

  test("features() rejects non-PCM16 audio loudly instead of emitting " +
    "silently-wrong numbers (shared kernel with audioFeatures)") {
    import spark.implicits._
    // an 8-bit mono WAV: conforming audio the PCM16 stats cannot read
    val pcm8 = Array.tabulate[Byte](16)(i => (i * 3).toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
      false, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm8), fmt8, 16L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val ds = Seq(MultimodalPipeline.Asset(9L, "audio", bos.toByteArray))
      .toDS()
    val e = intercept[Exception] {
      MultimodalPipeline.features(ds).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")
    assert(msg.contains("16-bit mono signed PCM"), msg)
  }

  test("real image decode: hand-computed pixel stats on a known 2x2 PNG") {
    import spark.implicits._
    // pixels chosen by hand: (0,0)=#010203 (1,0)=#FF0080
    //                        (0,1)=#406080 (1,1)=#000000
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x010203); img.setRGB(1, 0, 0xff0080)
    img.setRGB(0, 1, 0x406080); img.setRGB(1, 1, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(MultimodalPipeline.Asset(7L, "image", bos.toByteArray)).toDS()
    val f = MultimodalPipeline.imageFeatures(ds).collect().head
    assert(f.width == 2 && f.height == 2)
    assert(f.r_sum == 0x01L + 0xff + 0x40 + 0x00)   // 320
    assert(f.g_sum == 0x02L + 0x00 + 0x60 + 0x00)   // 98
    assert(f.b_sum == 0x03L + 0x80 + 0x80 + 0x00)   // 259
    assert(f.feature.toSeq == Seq(320f / 4, 98f / 4, 259f / 4, 4f))
  }

  test("PNG payload round-trips: ImageIO decode equals the pixel formula") {
    for (id <- Seq(0L, 3L, 99L, 123456L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MultimodalPipeline.imagePayload(id)))
      val w = 8 + (id % 9).toInt
      val h = 8 + (id % 7).toInt
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y) & 0xffffff
        val want = ((((id * 7 + x * 3 + y * 5) % 256).toInt << 16) |
          (((id * 11 + x + y * 2) % 256).toInt << 8) |
          ((id * 13 + x * 2 + y) % 256).toInt)
        assert(rgb == want, s"doc $id pixel ($x,$y)")
      }
    }
  }

  test("registered image query matches the closed-form stats per doc") {
    val got = MultimodalPipeline.multimodalImage(spark, SparkTestBase.sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val w = 8 + (id % 9).toInt
      val h = 8 + (id % 7).toInt
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        rs += (id * 7 + x * 3 + y * 5) % 256
        gs += (id * 11 + x + y * 2) % 256
        bs += (id * 13 + x * 2 + y) % 256
      }
      assert(row.getAs[Long]("width") == w && row.getAs[Long]("height") == h)
      assert(row.getAs[Long]("r_sum") == rs, s"doc $id r_sum")
      assert(row.getAs[Long]("g_sum") == gs, s"doc $id g_sum")
      assert(row.getAs[Long]("b_sum") == bs, s"doc $id b_sum")
    }
  }
}
