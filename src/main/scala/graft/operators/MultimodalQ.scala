package graft.operators

import graft.{QuerySpec, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal query: drives the real mapPartitions batch
  * plumbing with the deterministic fake decoder (md5-derived features),
  * so the DuckDB oracle can reproduce every value from the text bytes.
  */
object MultimodalQ {

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
    val media = Multimodal.fakeMediaFromDocuments(Tables.documents(s, dir))
    Multimodal.extractFeatures(media, Multimodal.FakeMediaDecoder).toDF()
  }

  val all: Seq[QuerySpec] = Seq(mFeatures)
}
