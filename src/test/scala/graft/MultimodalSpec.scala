package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("media features: deterministic fake decode over binary column") {
    val media = Multimodal.fakeMediaFromDocuments(Tables.documents(spark, sf0001))
    val feats = Multimodal.extractFeatures(media, Multimodal.FakeMediaDecoder)
    assert(feats.count() === 500)
    val df = feats.toDF()
    assert(df.filter(col("width") < 16 || col("width") > 640).count() === 0)
    assert(df.filter(col("media_type") === "image" && col("n_frames") =!= 1).count() === 0)
    assert(df.select("fingerprint").distinct().count() === 500)
  }

  test("batching: small batch size produces identical results") {
    val media = Multimodal.fakeMediaFromDocuments(
      Tables.documents(spark, sf0001).limit(50))
    val a = Multimodal.extractFeatures(media, Multimodal.FakeMediaDecoder, batchSize = 3)
    val b = Multimodal.extractFeatures(media, Multimodal.FakeMediaDecoder, batchSize = 64)
    assert(a.toDF().exceptAll(b.toDF()).count() === 0)
  }

  test("resize fits inside the box, preserves aspect, never upscales") {
    val df = run("m2_media_resize")
    assert(df.filter(col("new_width") > 320 || col("new_height") > 240).count() === 0)
    assert(df.filter(col("new_width") > col("width") ||
      col("new_height") > col("height")).count() === 0)
    // scaled-down media keeps aspect within integer-rounding tolerance
    val skewed = df.filter(col("new_width") < col("width"))
      .filter(abs(col("new_width") * col("height") - col("new_height") * col("width"))
        > col("width") + col("height"))
    assert(skewed.count() === 0)
  }

  test("frame sampling: images keep one frame, strides cover the clip") {
    val df = run("m3_frame_sample")
    assert(df.filter(col("media_type") === "image" &&
      (col("n_sampled") =!= 1 || col("last_frame") =!= 0)).count() === 0)
    assert(df.filter(col("last_frame") >= col("n_frames")).count() === 0)
    assert(df.filter(col("n_sampled") =!= expr("(n_frames + 9) div 10")).count() === 0)
  }

  test("real decoder seam is a clearly-marked stub") {
    intercept[NotImplementedError] {
      Multimodal.RealMediaDecoder.decodeBatch(Seq(
        Multimodal.MediaRow(1, "image", Array[Byte](1, 2))))
    }
  }
}
