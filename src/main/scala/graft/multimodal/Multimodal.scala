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

  /** The real decoder seam: wire an actual codec here when the runtime
    * has one. Deliberately unimplemented in this environment.
    */
  object RealMediaDecoder extends MediaDecoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] =
      throw new NotImplementedError(
        "media codecs (image/audio/video) are not available in this " +
          "container — use FakeMediaDecoder for plumbing tests; STUB per " +
          "builder contract")
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
        val scale = math.min(1000L,
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
    implicit val enc = Encoders.product[FrameSample]
    features.mapPartitions { it =>
      it.map { f =>
        val n = (f.n_frames + everyN - 1) / everyN
        FrameSample(f.doc_id, f.media_type, f.n_frames, n, (n - 1) * everyN)
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
