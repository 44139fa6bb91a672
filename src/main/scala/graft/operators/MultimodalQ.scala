package graft.operators

import graft.{Intermediates, QuerySpec, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal query: drives the real mapPartitions batch
  * plumbing with the deterministic fake decoder (md5-derived features),
  * so the DuckDB oracle can reproduce every value from the text bytes.
  */
object MultimodalQ {

  /** Decoded fake-media features, once per (session, dir) through the
    * materialize-once seam — m1 returns the relation and m2/m3/m4
    * derive from it (was: four independent decode passes per session).
    */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Intermediates.cached(s, dir, "mm_features") {
      Multimodal.extractFeatures(
        Multimodal.fakeMediaFromDocuments(Tables.documents(s, dir)),
        Multimodal.FakeMediaDecoder).toDF()
    }

  /** The deterministic 16-bit-PCM-style sample expression shared by
    * m6/m7/m8/m10 and their oracles. doc_id enters the LCG REDUCED MOD
    * 65536: stride-replicated fixture ids start at 2^40, where the raw
    * doc_id·1103515245 product leaves int64 — Spark would wrap silently
    * while DuckDB aborts — so both engines compute the reduced form.
    */
  private def lcgSmp(docId: Column, i: Column): Column =
    (((docId % lit(65536L)) * lit(1103515245L) + i * lit(12345L) + lit(104729L))
      % lit(65536L)) - lit(32768L)

  /** Per-frame energy/peak of the LCG stream at `flen`-sample frames,
    * materialized once per (session, dir, flen): m7/m8/m10 consume the
    * identical 256-sample relation (m6 the 1024 one), which previously
    * re-exploded the corpus ×4096 in each query.
    */
  private def frameEnergy(s: SparkSession, dir: String, flen: Int): DataFrame =
    Intermediates.cached(s, dir, s"mm_frame_energy_$flen") {
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(sequence(lit(0), lit(4095))).as("i"))
        .select(col("doc_id"), expr(s"i div $flen").cast("long").as("frame"),
          lcgSmp(col("doc_id"), col("i")).as("smp"))
        .groupBy("doc_id", "frame")
        .agg(sum(col("smp") * col("smp")).as("energy"),
          max(abs(col("smp"))).as("peak"),
          count(lit(1)).as("n_samples"))
    }

  val mFeatures: QuerySpec = QuerySpec.sql(
    "m1_media_features",
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_type,
      |         text,
      |         CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS h
      |  FROM documents
      |)
      |SELECT doc_id, media_type,
      |       CAST(strlen(text) AS BIGINT) AS n_bytes,
      |       CAST(16 + h % 624 AS INTEGER) AS width,
      |       CAST(16 + (h // 7) % 464 AS INTEGER) AS height,
      |       CAST(CASE WHEN media_type = 'image' THEN 0
      |                 ELSE 1000 + h % 60000 END AS BIGINT) AS duration_ms,
      |       CAST(CASE WHEN media_type = 'image' THEN 1
      |                 ELSE 1 + h % 300 END AS INTEGER) AS n_frames,
      |       md5(text) AS fingerprint
      |FROM m""".stripMargin) { (s, dir) =>
    mediaFeatures(s, dir)
  }

  private val hSql = "CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)"

  /** Resize geometry over the decoded features (fit 320×240, no
    * upscaling) — integer thousandths arithmetic, oracle-reproducible.
    */
  val mResize: QuerySpec = QuerySpec.sql(
    "m2_media_resize",
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |         CAST(16 + $hSql % 624 AS BIGINT) AS w,
       |         CAST(16 + ($hSql // 7) % 464 AS BIGINT) AS h
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, media_type, w, h,
       |         least(1000, least(320000 // w, 240000 // h)) AS sc
       |  FROM m
       |)
       |SELECT doc_id, media_type,
       |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |       CAST(w * sc // 1000 AS INTEGER) AS new_width,
       |       CAST(h * sc // 1000 AS INTEGER) AS new_height
       |FROM s""".stripMargin) { (s, dir) =>
    import s.implicits._
    Multimodal.resize(mediaFeatures(s, dir).as[Multimodal.MediaFeatures],
      maxW = 320, maxH = 240).toDF()
  }

  /** Frame sampling (every 10th frame) over the decoded features. */
  val mFrames: QuerySpec = QuerySpec.sql(
    "m3_frame_sample",
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |         CAST(CASE WHEN doc_id % 3 = 0 THEN 1
       |              ELSE 1 + $hSql % 300 END AS BIGINT) AS n_frames
       |  FROM documents
       |)
       |SELECT doc_id, media_type, CAST(n_frames AS INTEGER) AS n_frames,
       |       CAST((n_frames + 9) // 10 AS INTEGER) AS n_sampled,
       |       CAST(((n_frames + 9) // 10 - 1) * 10 AS INTEGER) AS last_frame
       |FROM m""".stripMargin) { (s, dir) =>
    import s.implicits._
    Multimodal.sampleFrames(mediaFeatures(s, dir).as[Multimodal.MediaFeatures],
      everyN = 10).toDF()
  }

  /** Per-modality corpus report over the decoded features: volume, byte
    * mass, duration, and mean width (centi-pixels, integer div) — the
    * rollup a multimodal training mix is planned from. One aggregation
    * keyed on the 3-value modality column.
    */
  val mModalityReport: QuerySpec = QuerySpec.sql(
    "m4_modality_report",
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |         CAST(strlen(text) AS BIGINT) AS n_bytes,
       |         CAST(16 + $hSql % 624 AS BIGINT) AS w,
       |         CAST(CASE WHEN doc_id % 3 = 0 THEN 0
       |              ELSE 1000 + $hSql % 60000 END AS BIGINT) AS duration_ms
       |  FROM documents
       |)
       |SELECT media_type,
       |       CAST(COUNT(*) AS BIGINT) AS n,
       |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |       CAST(SUM(duration_ms) AS BIGINT) AS total_ms,
       |       CAST(SUM(w) * 100 // COUNT(*) AS BIGINT) AS avg_w_c
       |FROM m GROUP BY 1""".stripMargin) { (s, dir) =>
    mediaFeatures(s, dir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        sum("duration_ms").as("total_ms"),
        sum(col("width").cast("long")).as("sw"))
      .selectExpr("media_type", "n", "total_bytes", "total_ms",
        "sw * 100L div n AS avg_w_c")
  }

  /** REAL image decode under the oracle gate: per doc, synthesize a PNG
    * with analytically-known geometry (w×h from doc_id, left `k` of 8
    * grid columns black), push it through the genuine ImageIO
    * encode→decode→average-hash path, and emit decoded width/height,
    * the 8×8 aHash, and fit-32×32 resize geometry. The oracle reproduces
    * every value in closed form — so a broken decoder, a flipped hash
    * bit, or wrong geometry all fail the hash compare. Split columns are
    * 8-grid-aligned (w is a multiple of 16), so each aHash cell is
    * uniformly black or white and the hash is exactly
    * (2^k − 1) · 0x0101010101010101.
    */
  val mImageDecode: QuerySpec = QuerySpec.sql(
    "m5_image_decode",
    """WITH m AS (
      |  SELECT doc_id,
      |         16 * (1 + doc_id % 4) AS w,
      |         16 * (1 + doc_id % 3) AS h,
      |         2 * (doc_id % 3 + 1) AS k
      |  FROM documents WHERE doc_id < 200
      |), s AS (
      |  SELECT doc_id, w, h, k,
      |         least(1000, least(32000 // w, 32000 // h)) AS sc
      |  FROM m
      |)
      |SELECT doc_id,
      |       CAST(w AS INTEGER) AS width,
      |       CAST(h AS INTEGER) AS height,
      |       printf('%016x', ((CAST(1 AS BIGINT) << k) - 1) * 72340172838076673) AS ahash,
      |       CAST(w * sc // 1000 AS INTEGER) AS new_width,
      |       CAST(h * sc // 1000 AS INTEGER) AS new_height
      |FROM s""".stripMargin) { (s, dir) =>
    import s.implicits._
    val media = Tables.documents(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (16 * (1 + id % 4)).toInt
        val h = (16 * (1 + id % 3)).toInt
        val k = (2 * (id % 3 + 1)).toInt
        Multimodal.MediaRow(id, "image",
          Multimodal.encodeSplitPng(w, h, w * k / 8))
      })
    // decode once: both join inputs read the checkpointed features (the
    // un-materialized lineage ran PNG synthesis + ImageIO decode twice)
    val feats = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .toDF().localCheckpoint()
    val resized = Multimodal.resize(feats.as[Multimodal.MediaFeatures],
        maxW = 32, maxH = 32).toDF()
      .select(col("doc_id"), col("new_width"), col("new_height"))
    feats
      .select(col("doc_id"), col("width"), col("height"),
        col("fingerprint").as("ahash"))
      .join(resized, "doc_id")
  }

  /** Audio-style frame analysis: 16-bit PCM samples framed into
    * 1024-sample windows with per-frame energy (Σ s²) and peak — the
    * windowed-signal aggregation an audio pipeline runs after decode.
    * The sample stream is a deterministic integer LCG standing in for
    * the codec (none in this env — same seam as the image decoders);
    * the framing work is the real engine path: a codegen'd Generate
    * (4096 samples/doc) → integer frame key → partial+final aggregation,
    * all-integer so the oracle is exact. At 100 TB the generate feeds
    * from decoded binary instead; the plan shape is identical.
    */
  val mAudioFrames: QuerySpec = QuerySpec.sql(
    "m6_audio_frames",
    """WITH s AS (
      |  SELECT doc_id, i,
      |         (((doc_id % 65536) * 1103515245 + i * 12345 + 104729) % 65536) - 32768 AS smp
      |  FROM documents CROSS JOIN generate_series(0, 4095) AS g(i)
      |)
      |SELECT doc_id, CAST(i // 1024 AS BIGINT) AS frame,
      |       CAST(SUM(smp * smp) AS BIGINT) AS energy,
      |       CAST(MAX(ABS(smp)) AS BIGINT) AS peak,
      |       COUNT(*) AS n_samples
      |FROM s GROUP BY doc_id, i // 1024""".stripMargin) { (s, dir) =>
    frameEnergy(s, dir, 1024)
  }

  /** m7: silence-run detection — the VAD/trim step an audio curation
    * pipeline runs before transcription: frames whose energy falls
    * below the per-doc average are "silent", and maximal runs of
    * consecutive silent frames (gaps-and-islands: frame − row_number)
    * become the trim segments. Same deterministic LCG sample stream as
    * m6/m8 at 256-sample frames (16 frames/doc), so every window is
    * per-doc bounded at any corpus size; all-integer (energy·16 < Σe
    * avoids division), exact oracle. With a real codec only the sample
    * source changes; the threshold + islands plan is identical.
    */
  val mSilenceRuns: QuerySpec = QuerySpec.sql(
    "m7_silence_runs",
    """WITH s AS (
      |  SELECT doc_id, i,
      |         (((doc_id % 65536) * 1103515245 + i * 12345 + 104729) % 65536) - 32768 AS smp
      |  FROM documents CROSS JOIN generate_series(0, 4095) AS g(i)
      |), f AS (
      |  SELECT doc_id, i // 256 AS frame, CAST(SUM(smp * smp) AS BIGINT) AS energy
      |  FROM s GROUP BY 1, 2
      |), t AS (
      |  SELECT doc_id, frame, energy,
      |         CAST(SUM(energy) OVER (PARTITION BY doc_id) AS BIGINT) AS tot
      |  FROM f
      |), sil AS (
      |  SELECT doc_id, frame,
      |         frame - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame) AS grp
      |  FROM t WHERE energy * 16 < tot
      |), r AS (
      |  SELECT doc_id, grp, COUNT(*) AS len FROM sil GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_runs,
      |       CAST(SUM(len) AS BIGINT) AS n_silent,
      |       CAST(MAX(len) AS BIGINT) AS max_run
      |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id")
    val f = frameEnergy(s, dir, 256).select("doc_id", "frame", "energy")
    f.withColumn("tot", sum("energy").over(byDoc))
      .filter(col("energy") * lit(16L) < col("tot"))
      .withColumn("grp", col("frame") - row_number().over(byDoc.orderBy("frame")))
      .groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"), sum("len").as("n_silent"),
        max("len").as("max_run"))
  }

  /** m8: scene/shot-change detection — frame-over-frame energy deltas
    * (the first step of video shot segmentation: a cut shows as an
    * energy discontinuity) over the same deterministic LCG sample
    * stream as m6, at 256-sample frames so each doc carries 16 frames.
    * LAG within a (doc, frame-order) window — partitioned by doc, so
    * the sort is bounded by frames-per-doc at any corpus size — then
    * integer thresholding; all-integer, exact oracle. With a real
    * decoder the energy column comes from decoded frames; the delta +
    * threshold plan is identical.
    */
  val mSceneChanges: QuerySpec = QuerySpec.sql(
    "m8_scene_changes",
    """WITH s AS (
      |  SELECT doc_id, i,
      |         (((doc_id % 65536) * 1103515245 + i * 12345 + 104729) % 65536) - 32768 AS smp
      |  FROM documents CROSS JOIN generate_series(0, 4095) AS g(i)
      |), f AS (
      |  SELECT doc_id, i // 256 AS frame, SUM(smp * smp) AS energy
      |  FROM s GROUP BY 1, 2
      |), d AS (
      |  SELECT doc_id, frame, energy,
      |         ABS(energy - LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame)) AS delta
      |  FROM f
      |)
      |SELECT doc_id, COUNT(*) AS n_frames,
      |       CAST(SUM(CASE WHEN delta > 5000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
      |       CAST(MAX(delta) AS BIGINT) AS max_delta
      |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val f = frameEnergy(s, dir, 256).select("doc_id", "frame", "energy")
    f.withColumn("delta", abs(col("energy") -
        lag("energy", 1).over(Window.partitionBy("doc_id").orderBy("frame"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > 5000000000L, 1L).otherwise(0L)).as("n_changes"),
        max("delta").as("max_delta"))
  }

  /** m9: image near-duplicate detection — the multimodal pipeline's
    * dedup step: every image flows through the REAL PNG decode +
    * 8×8 average-hash path (m5's `ImageIoDecoder`), and near-dups are
    * pairs within hamming distance 6 of the 60-bit perceptual hash,
    * found by d6's pigeonhole chunk join (exact, never all-pairs).
    * Images are synthesized with analytically-known aHashes — per
    * group of 8 docs, a base 8×8 cell mask (md5 of the group id) plus
    * a NESTED prefix of flipped cells, so within-group hamming is
    * exactly |i−j| — and the oracle reproduces mask arithmetic +
    * all-pairs bit_count in closed form. A decoder that flips a bit, a
    * hash with the wrong cell order, or a banding join that loses a
    * pair all fail the hash compare.
    *
    * Scale shape: decode is batched per partition (cost ∝ corpus, no
    * shuffle); the pair search shuffles the 60-bit hashes once on
    * (chunk_idx, chunk_value) — d6's measured shuffled-hash shape —
    * so 100 TB of images dedup without ever materializing a cross
    * product. Top 4 aHash bits are always clear (60-bit masks), so
    * the 7-chunk layout covers every discriminating bit.
    */
  val mImageNearDup: QuerySpec = QuerySpec.sql(
    "m9_image_neardup",
    """WITH m AS (
      |  SELECT doc_id, doc_id // 8 AS g, CAST(doc_id % 8 AS INT) AS i
      |  FROM documents WHERE doc_id < 400
      |), mk AS (
      |  SELECT doc_id,
      |    xor(CAST(('0x' || substring(md5(CAST(g AS VARCHAR)), 1, 15)) AS BIGINT),
      |        CAST(COALESCE(list_sum(list_transform(generate_series(0, i - 1),
      |          j -> (CAST(1 AS BIGINT) << ((7 * j + 3) % 60)))), 0) AS BIGINT)) AS mask
      |  FROM m
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.mask, b.mask)) AS INTEGER) AS hamming
      |FROM mk a JOIN mk b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.mask, b.mask)) <= 6""".stripMargin) { (s, dir) =>
    import s.implicits._
    // nested flip prefixes: doc i within its group flips the first i of
    // a fixed position list, so hamming(i, j) = |i − j| by construction
    val flips: Seq[Long] = (0 until 8).map(i =>
      (0 until i).map(j => 1L << ((7 * j + 3) % 60)).fold(0L)(_ | _))
    val masks = Tables.documents(s, dir).filter(col("doc_id") < 400)
      .selectExpr("doc_id", "doc_id div 8 AS g", "CAST(doc_id % 8 AS INT) AS i")
      .withColumn("mask", graft.functions.Portable.h60(col("g").cast("string"))
        .bitwiseXOR(element_at(array(flips.map(lit): _*), col("i") + 1)))
    val media = masks.select(col("doc_id"), col("mask")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, m) =>
        Multimodal.MediaRow(id, "image", Multimodal.encodeMaskPng(m))
      })
    val decoded = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .toDF()
      .select(col("doc_id"),
        conv(col("fingerprint"), 16, 10).cast("long").as("ahash"))
    Dedup.hammingPairs60(decoded, "ahash", 6)
  }

  /** m10: the shot TABLE — m8's cut detection carried to its product:
    * per video, the maximal frame runs between energy-discontinuity
    * boundaries (gaps-and-islands: shot id = running boundary count),
    * with each shot's frame span and exact integer energy statistics
    * (mean as `div` milli-exactness is unnecessary — the sum is already
    * exact). This is the relation a video curation pipeline joins
    * against (sample k frames per SHOT, not per video; drop sub-second
    * shots as cut noise). Same deterministic LCG sample stream as
    * m6/m8; with a real decoder only the energy column changes.
    *
    * Scale shape: one (doc, frame) aggregation, then boundary flag +
    * running count + shot rollup all inside the SAME per-doc window
    * partitioning — sorts bounded by frames-per-doc (16) at any corpus
    * size; no joins at all.
    */
  val mShotTable: QuerySpec = QuerySpec.sql(
    "m10_shot_table",
    """WITH s AS (
      |  SELECT doc_id, i,
      |         (((doc_id % 65536) * 1103515245 + i * 12345 + 104729) % 65536) - 32768 AS smp
      |  FROM documents CROSS JOIN generate_series(0, 4095) AS g(i)
      |), f AS (
      |  SELECT doc_id, i // 256 AS frame, SUM(smp * smp) AS energy
      |  FROM s GROUP BY 1, 2
      |), d AS (
      |  SELECT doc_id, frame, energy,
      |         CASE WHEN ABS(energy - LAG(energy) OVER
      |                (PARTITION BY doc_id ORDER BY frame)) > 5000000000
      |              THEN 1 ELSE 0 END AS cut
      |  FROM f
      |), g AS (
      |  SELECT doc_id, frame, energy,
      |         SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot
      |  FROM d
      |)
      |SELECT doc_id, CAST(shot AS BIGINT) AS shot,
      |       CAST(MIN(frame) AS BIGINT) AS start_frame,
      |       CAST(MAX(frame) AS BIGINT) AS end_frame,
      |       CAST(COUNT(*) AS BIGINT) AS n_frames,
      |       CAST(SUM(energy) AS BIGINT) AS energy_sum
      |FROM g GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val f = frameEnergy(s, dir, 256).select("doc_id", "frame", "energy")
    val wLag = Window.partitionBy("doc_id").orderBy("frame")
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.withColumn("cut",
        when(abs(col("energy") - lag("energy", 1).over(wLag)) > 5000000000L, 1L)
          .otherwise(0L))
      .withColumn("shot", sum("cut").over(wRun))
      .groupBy("doc_id", "shot")
      .agg(min("frame").as("start_frame"), max("frame").as("end_frame"),
        count(lit(1)).as("n_frames"), sum("energy").as("energy_sum"))
  }

  /** m11: decode-failure quarantine under the oracle gate — every 7th
    * doc carries deliberately truncated PNG bytes (magic only); the
    * rest are real cell-mask PNGs with analytically-known aHashes
    * (mask = doc_id). The fault-tolerant decode path must quarantine
    * exactly the corrupt rows WITHOUT failing the task — the behavior
    * that separates a pipeline that survives 100 TB of real-world
    * bytes from one that dies on split retry #4 — and decode the rest
    * bit-exactly. The oracle states the whole outcome in closed form,
    * so a swallowed good row, a crash instead of a quarantine, or a
    * hash corrupted by the error path all fail the compare.
    */
  val mDecodeQuarantine: QuerySpec = QuerySpec.sql(
    "m11_decode_quarantine",
    """SELECT doc_id,
      |       CASE WHEN doc_id % 7 = 3 THEN 'quarantined' ELSE 'ok' END AS status,
      |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(16 AS INTEGER) END AS width,
      |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE printf('%016x', doc_id) END AS ahash
      |FROM documents WHERE doc_id < 300""".stripMargin) { (s, dir) =>
    import s.implicits._
    val media = Tables.documents(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val bytes =
          if (id % 7 == 3) Array[Byte](0x89.toByte, 'P', 'N', 'G') // truncated
          else Multimodal.encodeMaskPng(id) // aHash == id (cells uniform)
        Multimodal.MediaRow(id, "image", bytes)
      })
    Multimodal.extractOrQuarantine(media, Multimodal.ImageIoDecoder)
      .drop("reason") // free text (exception message) — spec'd, not hashed
  }

  val all: Seq[QuerySpec] =
    Seq(mFeatures, mResize, mFrames, mModalityReport, mImageDecode,
      mAudioFrames, mSilenceRuns, mSceneChanges, mImageNearDup, mShotTable,
      mDecodeQuarantine)
}
