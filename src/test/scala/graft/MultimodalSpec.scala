package graft

import graft.multimodal.MultimodalPipeline
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("decode stub is deterministic and shape-stable") {
    val f = MultimodalPipeline.decodeStub("abcdefgh".getBytes("UTF-8"))
    assert(f.length == 4)
    assert(f.toSeq == MultimodalPipeline
      .decodeStub("abcdefgh".getBytes("UTF-8")).toSeq)
    assert(MultimodalPipeline.decodeStub(Array.emptyByteArray).toSeq ==
      Seq(0f, 0f, 0f, 0f))
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
    assert(agg.map(_.getAs[String]("media_type")).toSet ==
      Set("image", "audio", "video"))
  }
}
