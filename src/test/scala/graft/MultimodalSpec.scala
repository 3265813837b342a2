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
