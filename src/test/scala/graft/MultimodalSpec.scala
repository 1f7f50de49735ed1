package graft

import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("featurize is deterministic and preserves row count") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Multimodal.featuresDF(docs).orderBy("doc_id").collect().map(_.toString)
    val b = Multimodal.featuresDF(docs).orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
    assert(a.length == docs.count())
  }

  test("resize rewrites payloads to the target budget; frameSample fans out") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "video/fake", Array.tabulate(64)(_.toByte)),
      Multimodal.MediaRecord(2L, "video/fake", Array[Byte]())).toDS()
    val resized = Multimodal.resize(media, 32, 32).collect()
    assert(resized.forall(_.content.length == 32 * 32 / 64))
    val frames = Multimodal.frameSample(media, frameBytes = 16, everyN = 2)
      .collect().map(f => (f.doc_id, f.frame_no))
    assert(frames.toSet == Set((1L, 0L), (1L, 2L))) // 4 chunks, every 2nd
  }

  test("decode stub yields bounded dimensions from bytes") {
    val media = Seq(Multimodal.MediaRecord(1L, "image/fake", Array[Byte](0x42, 0x17, 9)))
      .toDS()
    val f = Multimodal.featurize(media).head()
    assert(f.n_bytes == 3)
    assert(f.width >= 16 && f.width < 272 && f.height >= 16 && f.height < 272)
    assert(f.mime == "image/fake")
  }
}
