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

  test("real decoder seam is a clearly-marked stub") {
    intercept[NotImplementedError] {
      Multimodal.RealMediaDecoder.decodeBatch(Seq(
        Multimodal.MediaRow(1, "image", Array[Byte](1, 2))))
    }
  }
}
