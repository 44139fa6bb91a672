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

  test("real decoder seam is a clearly-marked stub for audio/video") {
    intercept[NotImplementedError] {
      Multimodal.RealMediaDecoder.decodeBatch(Seq(
        Multimodal.MediaRow(1, "video", Array[Byte](1, 2))))
    }
  }

  test("ImageIO decode: real PNG round-trip recovers geometry and aHash") {
    // 32×16, left quarter black → aHash dark cells = cols 0-1 every row
    val bytes = Multimodal.encodeSplitPng(32, 16, 8)
    val Seq(f) = Multimodal.ImageIoDecoder.decodeBatch(Seq(
      Multimodal.MediaRow(7, "image", bytes)))
    assert(f.width === 32 && f.height === 16)
    assert(f.n_bytes === bytes.length)
    assert(f.fingerprint === f"${3L * 72340172838076673L}%016x")
  }

  test("ImageIO decode: aHash is exact on non-8-aligned dimensions") {
    // 33×17 with the split at x=9: cells straddling the boundary get a
    // mixed mean — the hash must still be deterministic and the clearly
    // dark/bright cells must land on the right side of the global mean
    val bytes = Multimodal.encodeSplitPng(33, 17, 9)
    val a = Multimodal.ImageIoDecoder.decodeBatch(Seq(
      Multimodal.MediaRow(1, "image", bytes))).head.fingerprint
    val b = Multimodal.ImageIoDecoder.decodeBatch(Seq(
      Multimodal.MediaRow(1, "image", bytes))).head.fingerprint
    assert(a === b)
    val bits = java.lang.Long.parseUnsignedLong(a, 16)
    // col 0 (pure black) dark in every row; col 7 (pure white) never
    (0 until 8).foreach { r =>
      assert((bits & (1L << (r * 8))) !== 0L, s"row $r col 0 not dark")
      assert((bits & (1L << (r * 8 + 7))) === 0L, s"row $r col 7 dark")
    }
  }

  test("ImageIO decode: garbage bytes fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decodeBatch(Seq(
        Multimodal.MediaRow(1, "image", Array[Byte](1, 2, 3, 4))))
    }
  }

  test("m5: oracle-shaped image decode query over real codec bytes") {
    val df = run("m5_image_decode")
    assert(df.count() === 200)
    // every row's decoded geometry matches the closed form
    assert(df.filter(col("width") =!= (lit(16) * (lit(1) + col("doc_id") % 4)))
      .count() === 0)
    assert(df.filter(col("new_width") > 32 || col("new_height") > 32)
      .count() === 0)
  }

  test("m6: 4 full frames per doc; energy matches a driver recount") {
    val df = run("m6_audio_frames")
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(df.count() === nDocs * 4)
    assert(df.filter(col("n_samples") =!= 1024 || col("peak") > 32768 ||
      col("energy") <= 0).count() === 0)
    // recount one doc's frame-0 energy with plain Scala ints
    val docId = 7L
    val want = (0 until 1024).map { i =>
      val s = ((docId * 1103515245L + i * 12345L + 104729L) % 65536L) - 32768L
      s * s
    }.sum
    val got = df.filter(col("doc_id") === docId && col("frame") === 0)
      .head().getAs[Long]("energy")
    assert(got === want)
  }

  test("m7: silence runs match a driver gaps-and-islands recount") {
    val df = run("m7_silence_runs")
    // internal consistency on every doc: runs partition the silent set
    assert(df.filter(col("n_runs") < 1 || col("n_silent") < col("n_runs") ||
      col("max_run") > col("n_silent") || col("n_silent") > 16).count() === 0)
    // full recount of one doc with plain Scala ints
    val docId = 7L
    val energies = (0 until 16).map { fr =>
      (0 until 256).map { j =>
        val i = fr * 256 + j
        val s = ((docId * 1103515245L + i * 12345L + 104729L) % 65536L) - 32768L
        s * s
      }.sum
    }
    val tot = energies.sum
    val silent = energies.zipWithIndex.filter { case (e, _) => e * 16 < tot }.map(_._2)
    val runs = silent.foldLeft(List.empty[Int]) {
      case (len :: rest, f) if silent.contains(f - 1) => (len + 1) :: rest
      case (acc, _) => 1 :: acc
    }
    val row = df.filter(col("doc_id") === docId).collect()
    if (silent.isEmpty) assert(row.isEmpty)
    else {
      assert(row.head.getAs[Long]("n_runs") === runs.size.toLong)
      assert(row.head.getAs[Long]("n_silent") === silent.size.toLong)
      assert(row.head.getAs[Long]("max_run") === runs.max.toLong)
    }
  }

  test("m11: a corrupt row between good rows quarantines alone — neighbors decode intact") {
    import spark.implicits._
    // one partition, corrupt row in the MIDDLE: the per-row error path
    // must not poison rows before or after it in the same iterator
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.encodeMaskPng(5L)),
      Multimodal.MediaRow(2L, "image", Array[Byte](0x89.toByte, 'P', 'N', 'G')),
      Multimodal.MediaRow(3L, "image", Multimodal.encodeMaskPng(9L)))
      .toDS().repartition(1)
    val got = Multimodal.extractOrQuarantine(media, Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(got === Set(
      (1L, "ok", f"${5L}%016x"),
      (2L, "quarantined", null),
      (3L, "ok", f"${9L}%016x")))
    // and the strict decoder genuinely throws on those bytes — the
    // quarantine wrapper is catching a real failure, not a no-op
    intercept[Exception] {
      Multimodal.ImageIoDecoder.decodeBatch(Seq(
        Multimodal.MediaRow(9L, "image", Array[Byte](0x89.toByte, 'P', 'N', 'G'))))
    }
    // a WIRING bug (audio routed to the image decoder) is visible in
    // the reason column, not silently identical to corrupt bytes
    val misrouted = Multimodal.extractOrQuarantine(
      Seq(Multimodal.MediaRow(7L, "audio", Array[Byte](1, 2, 3))).toDS(),
      Multimodal.ImageIoDecoder).collect().head
    assert(misrouted.getString(1) === "quarantined")
    assert(misrouted.getString(4).contains("media_type"))
  }
}
