package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. All row-level (embarrassingly
  * parallel — no shuffle), expression-only (whole-stage codegen), so they
  * scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (word pieces and single punctuation marks), aggregated per source.
    */
  val tTokens: QuerySpec = QuerySpec.sql(
    "t1_token_count",
    """SELECT source,
      |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))) AS BIGINT) AS re_tokens,
      |       COUNT(*) AS n_docs
      |FROM documents
      |GROUP BY source""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(
        sum(size(split(col("text"), " "))).as("ws_tokens"),
        sum(size(expr("regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\\\s]', 0)"))).as("re_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Quality scoring: length/stopword/char-class ratios combined into a
    * deterministic score. All arithmetic is integer basis-points (floor
    * division) — double round() disagrees between engines exactly at
    * decimal half-boundaries, so ratio metrics avoid FP entirely.
    */
  val tQuality: QuerySpec = QuerySpec.sql(
    "t2_quality_score",
    """WITH q AS (
      |  SELECT doc_id, lang, n_chars,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_filter(string_split(text, ' '),
      |                         t -> t IN ('the', 'a'))) AS n_stop
      |  FROM documents
      |)
      |SELECT doc_id, lang, n_tokens,
      |       CAST(n_stop * 10000 // n_tokens AS BIGINT) AS stop_bp,
      |       CAST(n_chars * 10000 // n_tokens AS BIGINT) AS tok_len_bp,
      |       CAST((47 * least(n_tokens * 10000 // 64, 10000)
      |           + 31 * (10000 - n_stop * 10000 // n_tokens)
      |           + 22 * least(n_chars * 10000 // 400, 10000)) // 100 AS BIGINT) AS quality_bp
      |FROM q""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long"))
      .selectExpr("doc_id", "lang", "n_tokens",
        "n_stop * 10000L div n_tokens AS stop_bp",
        "n_chars * 10000L div n_tokens AS tok_len_bp",
        """(47 * least(n_tokens * 10000L div 64, 10000)
          | + 31 * (10000 - n_stop * 10000L div n_tokens)
          | + 22 * least(n_chars * 10000L div 400, 10000)) div 100 AS quality_bp""".stripMargin)
  }

  /** Language-ID heuristic: stopword-marker ratio (the corpus shares one
    * vocabulary, so this is the honest n-gram-style heuristic — markers in,
    * threshold out). Integer arithmetic only (see tQuality).
    */
  val tLangId: QuerySpec = QuerySpec.sql(
    "t3_lang_id",
    """WITH q AS (
      |  SELECT doc_id, lang,
      |         len(list_filter(string_split(text, ' '),
      |                         t -> t IN ('the', 'a'))) AS n_stop,
      |         len(string_split(text, ' ')) AS n_tokens
      |  FROM documents
      |)
      |SELECT doc_id, lang,
      |       CASE WHEN n_stop * 20 >= n_tokens THEN 'en' ELSE 'und' END AS predicted,
      |       CAST(n_stop * 10000 // n_tokens AS BIGINT) AS marker_bp
      |FROM q""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long"))
      .selectExpr("doc_id", "lang",
        "CASE WHEN n_stop * 20 >= n_tokens THEN 'en' ELSE 'und' END AS predicted",
        "n_stop * 10000L div n_tokens AS marker_bp")
  }

  /** Document fingerprinting: md5 of whitespace-normalized lowercase text
    * plus a min-shingle-hash (rolling-window hash minimum — the MinHash
    * k=1 special case). Ref intent: lab03 md5 proof (script1.sql:67,70).
    */
  val tFingerprint: QuerySpec = QuerySpec.sql(
    "t4_fingerprint",
    s"""SELECT doc_id,
       |       md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_md5,
       |       CAST(list_min(list_transform(${Portable.shinglesSql(3).replace("\n", " ")},
       |            s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT))) AS BIGINT) AS fp_min
       |FROM documents""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp_md5"),
        array_min(graft.functions.ShingleHash.shingleHashes(col("text"), 3))
          .as("fp_min"))
  }

  val all: Seq[QuerySpec] = Seq(tTokens, tQuality, tLangId, tFingerprint)
}
