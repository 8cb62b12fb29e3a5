package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "src", 11L),
    (2L, "a" * 100, "en", "src", 100L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val media = Multimodal.fromDocuments(docs)

  test("media schema: binary content + typed metadata") {
    assert(media.schema("content").dataType.typeName == "binary")
    val m = media.where($"media_id" === 1).select("meta.format", "meta.n_frames").head()
    assert(m.getString(0) == "fake/rgb8" && m.getInt(1) == 12) // 11 % 16 + 1
  }

  test("extractFeatures: deterministic per-byte features, fixed dim") {
    val f = Multimodal.extractFeatures(spark, media, dim = 8).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).byte_len == 11L)
    assert(f(1L).features.size == 8)
    assert(f(1L).features.forall(v => v >= 0.0 && v <= 1.0))
    // determinism: same bytes → same features
    val again = Multimodal.extractFeatures(spark, media, dim = 8).collect()
      .map(x => x.media_id -> x.features).toMap
    assert(again(1L) == f(1L).features)
  }

  test("sampleFrames: bounded deterministic fan-out") {
    val frames = Multimodal.sampleFrames(spark, media, maxFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 4) // n_frames = 12 → stride 3 → 4 frames
    assert(byId(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(byId.values.forall(_.length <= 4))
  }

  test("resizeAll caps payload size") {
    val r = Multimodal.resizeAll(spark, media, 2, 3).collect()
      .map(row => row.getAs[Long]("media_id") -> row.getAs[Array[Byte]]("resized")).toMap
    assert(r(2L).length == 6) // 100 bytes capped at w*h = 6
    assert(r(1L).length == 6)
  }
}
