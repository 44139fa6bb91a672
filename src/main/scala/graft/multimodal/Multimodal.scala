package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt north star): media travels
  * as an opaque `binary` column with typed metadata; decode/
  * feature-extraction runs batched per partition (the Scala analog of a
  * Pandas-UDF-over-mapInPandas stage: iterator-of-batches in, columnar
  * rows out, so a real decoder can amortize model/codec setup per batch).
  *
  * The actual byte→pixels/samples decode is STUBBED — image/audio codecs
  * are not in this container (see RealMediaDecoder). The Spark-side
  * contract (schema, batching, partitioning) is real and tested with the
  * deterministic fake decoder.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, width: Int, height: Int, duration_ms: Long,
      n_frames: Int, fingerprint: String)

  /** Per-batch decoder contract. Implementations must be Serializable
    * (shipped to executors) and stateless across batches.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Deterministic fake: md5-derived pseudo-features. Stands in for a
    * real codec so plumbing, schemas and oracles stay testable.
    */
  object FakeMediaDecoder extends MediaDecoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val hex = md.digest(r.media).map(b => f"${b & 0xff}%02x").mkString
        val h = java.lang.Long.parseLong(hex.take(8), 16)
        MediaFeatures(r.doc_id, r.media_type, r.media.length,
          width = (16 + h % 624).toInt,
          height = (16 + (h / 7) % 464).toInt,
          duration_ms = if (r.media_type == "image") 0L else 1000L + h % 60000L,
          n_frames = if (r.media_type == "image") 1 else (1 + h % 300).toInt,
          fingerprint = hex)
      }
    }
  }

  /** The real decoder seam for audio/video: wire an actual codec here
    * when the runtime has one. Deliberately unimplemented in this
    * environment (no audio/video codec libs). Images have a REAL path:
    * [[ImageIoDecoder]].
    */
  object RealMediaDecoder extends MediaDecoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] =
      throw new NotImplementedError(
        "audio/video codecs are not available in this container — images " +
          "decode for real via ImageIoDecoder; use FakeMediaDecoder for " +
          "non-image plumbing tests")
  }

  /** REAL image decode: javax.imageio ships with the JDK (headless-safe,
    * no native libs), so PNG/JPEG/GIF/BMP bytes decode to actual pixels
    * here — width/height are read from the image, and the fingerprint is
    * a genuine 8×8 average-hash over decoded luminance. Batched like
    * every decoder (codec setup amortizes per partition, memory bounded
    * by batch size × image size at 100 TB).
    */
  object ImageIoDecoder extends MediaDecoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      require(r.media_type == "image",
        s"ImageIoDecoder got media_type=${r.media_type} for doc ${r.doc_id}")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"undecodable image bytes for doc ${r.doc_id}")
      MediaFeatures(r.doc_id, r.media_type, r.media.length,
        img.getWidth, img.getHeight, duration_ms = 0L, n_frames = 1,
        fingerprint = f"${averageHash(img)}%016x")
    }
  }

  /** 8×8 average-hash (aHash): box-mean luminance per grid cell, bit
    * `row*8+col` set where the cell is DARKER than the global mean.
    * Integer arithmetic throughout (sums and cross-multiplied
    * comparisons, no division) so the hash is bit-reproducible across
    * JVMs — no Graphics2D rescale, whose rendering hints are not pinned.
    */
  def averageHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val cr = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // luminance proxy r+g+b — monotonic, division-free
        val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val c = cr * 8 + x * 8 / w
        sums(c) += lum; counts(c) += 1; total += lum
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var bits = 0L
    var i = 0
    while (i < 64) {
      // cellMean < globalMean  ⟺  cellSum * n < total * cellCount —
      // compared in 128 bits: around 0.9 gigapixels the 64-bit products
      // wrap negative and silently flip hash bits (BigInt costs 64
      // multiplications per IMAGE, not per pixel)
      if (counts(i) > 0 &&
        BigInt(sums(i)) * n < BigInt(total) * counts(i)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Test-image generator: w×h PNG, columns left of `splitX` black, the
    * rest white. Encoded through the real ImageIO PNG writer so decode
    * paths exercise genuine codec bytes.
    */
  def encodeSplitPng(w: Int, h: Int, splitX: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < splitX) 0x000000 else 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Test-image generator for perceptual-hash workloads: 16×16 PNG whose
    * 8×8 grid cell `r*8+c` (2×2 px) is black iff bit `r*8+c` of `mask`
    * is set. Cells are uniform, so [[averageHash]] returns exactly
    * `mask` for any mask with at least one clear bit — the aHash is
    * analytically known while still flowing through the real PNG
    * encode→decode path.
    */
  def encodeMaskPng(mask: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val cell = (y / 2) * 8 + (x / 2)
        img.setRGB(x, y, if (((mask >> cell) & 1L) == 1L) 0x000000 else 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Fault-tolerant feature extraction: corrupt or undecodable media
    * must QUARANTINE, not kill the task — at 100 TB some bytes will
    * always be broken, and one bad row failing a 128 MB split four
    * times kills the job. Per-row try around the decoder (decode cost
    * dominates, so row-granular batching loses nothing), one output
    * relation: (doc_id, status ok|quarantined, width·null, ahash·null).
    * The file-ingest quarantine pattern (QuarantineSpec) applied to the
    * media decode seam.
    */
  def extractOrQuarantine(media: Dataset[MediaRow], decoder: MediaDecoder)
      : org.apache.spark.sql.DataFrame = {
    implicit val enc =
      Encoders.product[(Long, String, Option[Int], Option[String], Option[String])]
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val f = decoder.decodeBatch(Seq(r)).head
          (r.doc_id, "ok", Some(f.width), Some(f.fingerprint), None)
        } catch {
          case scala.util.control.NonFatal(e) =>
            // the reason column keeps a misrouted dataset (decoder
            // precondition, e.g. audio rows sent to the image decoder)
            // distinguishable from genuinely broken bytes — a silent
            // all-quarantined run would otherwise mask a wiring bug
            (r.doc_id, "quarantined", None, None,
              Some(e.getMessage).filter(_ != null).orElse(Some(e.getClass.getSimpleName)))
        }
      }
    }.toDF("doc_id", "status", "width", "ahash", "reason")
  }

  /** Batched per-partition feature extraction. `batchSize` bounds decoder
    * working-set memory; partition count (not batch size) governs
    * parallelism, so at 100 TB this scales with input splits while each
    * task stays memory-bounded.
    */
  def extractFeatures(media: Dataset[MediaRow], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decoder.decodeBatch(batch))
    }
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, new_width: Int, new_height: Int)

  /** Resize stage: fit into maxW×maxH preserving aspect ratio, never
    * upscaling. Pure integer arithmetic (scale in thousandths) so the
    * result is engine-reproducible; runs as a batched per-partition
    * stage like the decoder (the real implementation would resample
    * pixels here — the geometry contract is what downstream consumes).
    */
  def resize(features: Dataset[MediaFeatures], maxW: Int,
      maxH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    features.mapPartitions { it =>
      it.map { f =>
        // dimensionless rows (audio from a real decoder carries 0×0)
        // pass through unscaled — a division by zero here would kill
        // the task, the one-bad-row failure mode extractOrQuarantine
        // exists to prevent
        val scale =
          if (f.width <= 0 || f.height <= 0) 1000L
          else math.min(1000L,
            math.min(maxW * 1000L / f.width, maxH * 1000L / f.height))
        ResizedMedia(f.doc_id, f.media_type, f.width, f.height,
          (f.width * scale / 1000L).toInt, (f.height * scale / 1000L).toInt)
      }
    }
  }

  final case class FrameSample(doc_id: Long, media_type: String,
      n_frames: Int, n_sampled: Int, last_frame: Int)

  /** Frame-sampling stage: every `everyN`-th frame starting at 0 (video/
    * audio); images keep their single frame. Integer arithmetic only.
    */
  def sampleFrames(features: Dataset[MediaFeatures],
      everyN: Int): Dataset[FrameSample] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    implicit val enc = Encoders.product[FrameSample]
    features.mapPartitions { it =>
      it.map { f =>
        val n = (f.n_frames + everyN - 1) / everyN
        // a frameless row (empty clip) samples nothing; last_frame = -1
        // marks "none" instead of the nonsense (n-1)*everyN < 0
        val last = if (n <= 0) -1 else (n - 1) * everyN
        FrameSample(f.doc_id, f.media_type, f.n_frames, n, last)
      }
    }
  }

  /** Test/demo fixture: wrap a text table as fake media rows (the bytes
    * are the UTF-8 text — deterministic, no external data needed).
    */
  def fakeMediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("media"))
      .as[MediaRow]
  }
}
