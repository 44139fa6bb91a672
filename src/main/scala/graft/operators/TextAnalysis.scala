package graft.operators

import graft.{Intermediates, QuerySpec, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. All row-level (embarrassingly
  * parallel — no shuffle), expression-only (whole-stage codegen), so they
  * scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** The t2 quality formula — THE single copy (was: six, across
    * t2/d8/p1, each with an oracle mirror that had to drift in
    * lockstep). Operands are SQL expressions for the token count,
    * stopword count and char count; `qualityBpSql` is the DuckDB `//`
    * form, `qualityBpSpark` the Spark `div` form.
    */
  private[operators] def qualityBpSql(nTokens: String, nStop: String,
      nChars: String): String =
    s"(47 * least($nTokens * 10000 // 64, 10000)" +
      s" + 31 * (10000 - $nStop * 10000 // $nTokens)" +
      s" + 22 * least($nChars * 10000 // 400, 10000)) // 100"

  private[operators] def qualityBpSpark(nTokens: String, nStop: String,
      nChars: String): String =
    s"(47 * least($nTokens * 10000L div 64, 10000)" +
      s" + 31 * (10000 - $nStop * 10000L div $nTokens)" +
      s" + 22 * least($nChars * 10000L div 400, 10000)) div 100"

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (word pieces and single punctuation marks), aggregated per source.
    */
  val tTokens: QuerySpec = QuerySpec.sql(
    "t1_token_count",
    """SELECT source,
      |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\t\n\x0B\f\r ]'))) AS BIGINT) AS re_tokens,
      |       COUNT(*) AS n_docs
      |FROM documents
      |GROUP BY source""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(
        sum(size(split(col("text"), " "))).as("ws_tokens"),
        // explicit whitespace class: RE2 \s excludes U+000B, Java's
        // includes it (Portable.WsRegex note)
        sum(size(regexp_extract_all(col("text"),
          lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\t\\n\\x0B\\f\\r ]"), lit(0)))).as("re_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Quality scoring: length/stopword/char-class ratios combined into a
    * deterministic score. All arithmetic is integer basis-points (floor
    * division) — double round() disagrees between engines exactly at
    * decimal half-boundaries, so ratio metrics avoid FP entirely.
    */
  val tQuality: QuerySpec = QuerySpec.sql(
    "t2_quality_score",
    s"""WITH q AS (
      |  SELECT doc_id, lang, n_chars,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_filter(string_split(text, ' '),
      |                         t -> t IN ('the', 'a'))) AS n_stop
      |  FROM documents
      |)
      |SELECT doc_id, lang, n_tokens,
      |       CAST(n_stop * 10000 // n_tokens AS BIGINT) AS stop_bp,
      |       CAST(n_chars * 10000 // n_tokens AS BIGINT) AS tok_len_bp,
      |       CAST(${qualityBpSql("n_tokens", "n_stop", "n_chars")} AS BIGINT) AS quality_bp
      |FROM q""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long"))
      .selectExpr("doc_id", "lang", "n_tokens",
        "n_stop * 10000L div n_tokens AS stop_bp",
        "n_chars * 10000L div n_tokens AS tok_len_bp",
        qualityBpSpark("n_tokens", "n_stop", "n_chars") + " AS quality_bp")
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
       |       md5(regexp_replace(lower(text), '${graft.functions.Portable.WsRegex}', ' ', 'g')) AS fp_md5,
       |       CAST(list_min(list_transform(${Portable.shinglesSql(3).replace("\n", " ")},
       |            s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT))) AS BIGINT) AS fp_min
       |FROM documents""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")),
          graft.functions.Portable.WsRegex, " ")).as("fp_md5"),
        array_min(graft.functions.ShingleHash.shingleHashes(col("text"), 3))
          .as("fp_min"))
  }

  /** Repetitiveness filter (the Gopher-style repeated-n-gram signal):
    * distinct-trigram share per document in basis points — boilerplate
    * and degenerate generations repeat shingles, dropping the ratio.
    * Row-level, expression-only, shuffle-free.
    */
  val tRepetition: QuerySpec = QuerySpec.sql(
    "t5_repetition",
    // raw trigram occurrences (duplicates kept — unlike Portable.shingles,
    // which dedups for MinHash)
    """WITH sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(string_split(text, ' ')) >= 3
      |           THEN list_transform(
      |             generate_series(1, len(string_split(text, ' ')) - 2),
      |             i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      |           ELSE [text] END AS sh
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(len(sh) AS BIGINT) AS n_trigrams,
      |       CAST(len(list_distinct(sh)) * 10000 // len(sh) AS BIGINT) AS distinct_bp
      |FROM sh""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("sh", expr(
        """CASE WHEN size(split(text, ' ')) >= 3
          |  THEN transform(sequence(0, size(split(text, ' ')) - 3),
          |    i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))
          |  ELSE array(text) END""".stripMargin))
      .selectExpr("doc_id",
        "CAST(size(sh) AS BIGINT) AS n_trigrams",
        "CAST(size(array_distinct(sh)) * 10000L div size(sh) AS BIGINT) AS distinct_bp")
  }

  /** Corpus vocabulary build: per-token document frequency — explode
    * distinct tokens per doc, aggregate on the token (partial map-side
    * combine; the shuffle key is the token, bounded by vocabulary size,
    * not corpus size). doc_share_bp = df/n_docs in basis points.
    */
  val tVocabDf: QuerySpec = QuerySpec.sql(
    "t6_vocab_df",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      |  FROM documents
      |), n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT token, COUNT(*) AS df,
      |       CAST(COUNT(*) * 10000 // (SELECT n_docs FROM n) AS BIGINT) AS doc_share_bp
      |FROM tok GROUP BY token""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(explode(array_distinct(split(col("text"), " "))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .selectExpr("token", "df", "df * 10000L div n_docs AS doc_share_bp")
  }

  /** Unigram-surprisal proxy (the classifier-free perplexity stand-in):
    * rank every vocabulary token by document frequency (rarest = highest
    * rank), then score each document by its mean token rank. High mean
    * rank = rare-word-heavy (OCR noise, gibberish); low = stopword soup.
    * Integer ranks + basis-point mean keep it engine-exact — a float
    * -log(p) sum would be summation-order-dependent.
    *
    * Scale shape: the rank is global over the VOCABULARY but never runs
    * as a single-partition window — `rankedVocab` range-partitions on the
    * sort key, ranks within each partition, and adds broadcast partition
    * offsets (the standard distributed global-rank shape). The per-doc
    * score then joins tokens against the broadcast vocab and aggregates
    * on doc_id.
    */
  val tSurprisal: QuerySpec = QuerySpec.sql(
    "t7_surprisal",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      |), df AS (
      |  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
      |), v AS (
      |  SELECT token, DENSE_RANK() OVER (ORDER BY df DESC, token) AS rnk FROM df
      |)
      |SELECT doc_id, CAST(SUM(rnk) AS BIGINT) AS rank_sum, COUNT(*) AS n_tok,
      |       CAST(SUM(rnk) * 10000 // COUNT(*) AS BIGINT) AS mean_rank_bp
      |FROM tok JOIN v USING (token) GROUP BY 1""".stripMargin) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val vocab = rankedVocab(s,
      tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df")))
    tok.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(sum("rnk").as("rank_sum"), count(lit(1)).as("n_tok"))
      .selectExpr("doc_id", "rank_sum", "n_tok",
        "rank_sum * 10000L div n_tok AS mean_rank_bp")
  }

  /** Distributed global rank over (df DESC, token): the token tie-break
    * makes the sort key unique, so DENSE_RANK == ROW_NUMBER and the
    * shared two-pass [[GlobalRank]] decomposition applies — no
    * single-partition window anywhere.
    */
  private[graft] def rankedVocab(s: org.apache.spark.sql.SparkSession,
      dfTable: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    GlobalRank.rowNumber(dfTable, Seq(col("df").desc, col("token")), "rnk0")
      // LongType rank end to end: an int cast would silently wrap past
      // 2^31 distinct tokens while the oracle's DENSE_RANK stays BIGINT
      .withColumnRenamed("rnk0", "rnk")
      .select("token", "rnk")

  /** PII-redaction seam: numeric literals in the semi-structured event
    * payload are masked and counted — the scrub stage every training
    * pipeline runs before text ships. The corpus carries no real PII, so
    * digit runs are the demonstrable pattern; production patterns
    * (emails, phones, SSNs) are additional alternations in the same
    * codegen'd regexp_replace, with identical plan shape. Row-level,
    * shuffle-free.
    */
  val tRedact: QuerySpec = QuerySpec.sql(
    "t8_redact",
    """SELECT event_id,
      |       regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
      |       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "#").as("props_redacted"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long")
          .as("n_redacted"))
  }

  /** Keyword extraction: each document's three RAREST tokens by corpus
    * document frequency (full tie-break on token text) — the
    * deterministic integer cousin of TF-IDF top-terms, reusing t6's df
    * relation as a broadcast. One rank window partitioned by doc_id;
    * no floating point anywhere.
    */
  val tKeywords: QuerySpec = QuerySpec.sql(
    "t9_keywords",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      |  FROM documents
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tok GROUP BY 1
      |), r AS (
      |  SELECT tok.doc_id, tok.token, df.df,
      |         ROW_NUMBER() OVER (PARTITION BY tok.doc_id
      |           ORDER BY df.df, tok.token) AS rnk
      |  FROM tok JOIN df USING (token)
      |)
      |SELECT doc_id, token, df, rnk FROM r WHERE rnk <= 3""".stripMargin) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    // t6's materialized relation IS this df aggregation — reuse it
    // instead of re-scanning and re-shuffling the corpus (t6 is
    // memoized in `all`, the p11/p12 seam)
    val df = graft.Intermediates.of(tVocabDf)(s, dir).select("token", "df")
    tok.join(broadcast(df), "token")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("token"))))
      .filter(col("rnk") <= 3)
      .select("doc_id", "token", "df", "rnk")
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1, scaled
    * to this corpus's doc lengths): token-count bounds, mean-word-length
    * bounds, minimum alphabetic-word share, minimum stopword evidence —
    * each an independent 0/1 flag plus the conjunctive pass bit. All
    * arithmetic is integer (scaled centi-chars / basis points) so the
    * flags are engine-exact; row-level and shuffle-free like t2/t3.
    */
  val tGopher: QuerySpec = QuerySpec.sql(
    "t10_gopher_rules",
    """WITH q AS (
      |  SELECT doc_id, n_chars,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS n_stop,
      |         len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '[a-z]'))) AS n_alpha
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS r_len,
      |       CASE WHEN (n_chars - n_tokens + 1) * 100 // n_tokens BETWEEN 150 AND 1000 THEN 1 ELSE 0 END AS r_wlen,
      |       CASE WHEN n_alpha * 10000 // n_tokens >= 8000 THEN 1 ELSE 0 END AS r_alpha,
      |       CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
      |       (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
      |       * (CASE WHEN (n_chars - n_tokens + 1) * 100 // n_tokens BETWEEN 150 AND 1000 THEN 1 ELSE 0 END)
      |       * (CASE WHEN n_alpha * 10000 // n_tokens >= 8000 THEN 1 ELSE 0 END)
      |       * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END) AS pass
      |FROM q""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long"))
      .withColumn("n_alpha",
        size(filter(split(col("text"), " "), t => t.rlike("[a-z]"))).cast("long"))
      .selectExpr("doc_id",
        "CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS r_len",
        "CASE WHEN (n_chars - n_tokens + 1) * 100L div n_tokens BETWEEN 150 AND 1000 THEN 1 ELSE 0 END AS r_wlen",
        "CASE WHEN n_alpha * 10000L div n_tokens >= 8000 THEN 1 ELSE 0 END AS r_alpha",
        "CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop",
        """(CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
          | * (CASE WHEN (n_chars - n_tokens + 1) * 100L div n_tokens BETWEEN 150 AND 1000 THEN 1 ELSE 0 END)
          | * (CASE WHEN n_alpha * 10000L div n_tokens >= 8000 THEN 1 ELSE 0 END)
          | * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END) AS pass""".stripMargin)
  }

  /** Corpus bigram language model (the KenLM-style filter model CCNet
    * scores documents with, built on the engine itself): conditional
    * next-token probability in basis points for every bigram seen >= 5
    * times. Bigram counts shuffle on the (w1,w2) pair — vocabulary-
    * bounded keys, not corpus-bounded — and the conditional divides by
    * the w1 margin via one window over the bigram relation (no second
    * corpus pass).
    */
  val tBigramLm: QuerySpec = QuerySpec.sql(
    "t11_bigram_lm",
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ws FROM documents
      |), bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM toks WHERE len(ws) >= 2
      |), c AS (
      |  SELECT split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM bg GROUP BY 1, 2
      |), m AS (
      |  SELECT w1, w2, cnt, SUM(cnt) OVER (PARTITION BY w1) AS w1_total
      |  FROM c
      |)
      |SELECT w1, w2, cnt,
      |       CAST(cnt * 10000 // w1_total AS BIGINT) AS cond_bp
      |FROM m WHERE cnt >= 5""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))""".stripMargin))
        .as("bigram"))
      .select(substring_index(col("bigram"), " ", 1).as("w1"),
        substring_index(col("bigram"), " ", -1).as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w1_total", sum("cnt").over(Window.partitionBy("w1")))
      .filter(col("cnt") >= 5)
      .selectExpr("w1", "w2", "cnt", "cnt * 10000L div w1_total AS cond_bp")
  }

  /** Language-ID confusion matrix: t3's heuristic predictions crossed
    * with the labeled lang column — the accuracy report that decides
    * whether the cheap classifier is good enough to route the corpus.
    * share_bp is the per-actual-language row share (recall of the
    * diagonal cell). One aggregation on a (langs × predictions)-bounded
    * key.
    */
  val tLangConfusion: QuerySpec = QuerySpec.sql(
    "t12_langid_confusion",
    """WITH q AS (
      |  SELECT doc_id, lang,
      |         len(list_filter(string_split(text, ' '),
      |                         t -> t IN ('the', 'a'))) AS n_stop,
      |         len(string_split(text, ' ')) AS n_tokens
      |  FROM documents
      |), p AS (
      |  SELECT lang,
      |         CASE WHEN n_stop * 20 >= n_tokens THEN 'en' ELSE 'und' END AS predicted
      |  FROM q
      |), c AS (
      |  SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM p GROUP BY 1, 2
      |)
      |SELECT lang, predicted, n,
      |       CAST(n * 10000 // SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS share_bp
      |FROM c""".stripMargin) { (s, dir) =>
    Intermediates.of(tLangId)(s, dir)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .withColumn("share_bp",
        expr("n * 10000L div sum(n) over (partition by lang)"))
  }

  /** Character-level Shannon entropy per document — the compression-
    * style quality signal (gibberish and templated boilerplate sit at
    * the entropy extremes). Explode to (doc, char) → two map-side-
    * combined aggregations keyed by doc; rounding to 4dp absorbs
    * summation-order ULP across engines.
    */
  val tCharEntropy: QuerySpec = QuerySpec.sql(
    "t13_char_entropy",
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
      |), f AS (
      |  SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
      |), tot AS (
      |  SELECT doc_id, SUM(c) AS n FROM f GROUP BY doc_id
      |)
      |SELECT f.doc_id, COUNT(*) AS n_distinct_chars,
      |       ROUND(-SUM((c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS entropy
      |FROM f JOIN tot ON f.doc_id = tot.doc_id
      |GROUP BY f.doc_id""".stripMargin) { (s, dir) =>
    val f = Tables.documents(s, dir)
      // one match per CODEPOINT (a Java regex '.' spans a surrogate
      // pair) to match DuckDB's string_split(text, '') — split(text, "")
      // cuts UTF-16 code units and diverges on supplementary-plane text
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("(?s)."), lit(0))).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    // total chars per doc as a doc-partitioned window, so the window and
    // the final aggregation share one doc_id exchange (no tot-join)
    f.withColumn("n", sum("c").over(Window.partitionBy("doc_id")))
      .withColumn("p", col("c") * lit(1.0) / col("n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_chars"),
        round(-sum(col("p") * log2(col("p"))), 4).as("entropy"))
  }

  /** LM-based document scoring: every doc scored by the t11 corpus
    * bigram model — the CCNet-style quality-filter step (docs whose
    * bigrams the corpus LM finds improbable are the noise you drop).
    * The LM is vocab²-bounded and cnt≥5-pruned, so it broadcasts; the
    * doc side streams through one explode + one broadcast join + one
    * doc-keyed aggregation. All-integer (bp) outputs, exact oracle;
    * the producer is shared through the materialize-once registry.
    */
  val tLmScore: QuerySpec = QuerySpec.sql(
    "t14_lm_score",
    s"""WITH lm AS (${tBigramLm.oracle.get}),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
       |  FROM toks WHERE len(ws) >= 2
       |), bw AS (
       |  SELECT doc_id, split_part(bigram, ' ', 1) AS w1,
       |         split_part(bigram, ' ', 2) AS w2
       |  FROM bg
       |), j AS (
       |  SELECT bw.doc_id, lm.cond_bp
       |  FROM bw LEFT JOIN lm ON bw.w1 = lm.w1 AND bw.w2 = lm.w2
       |)
       |SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(cond_bp) AS n_known,
       |       CAST(COUNT(cond_bp) * 10000 // COUNT(*) AS BIGINT) AS known_bp,
       |       CAST(CASE WHEN COUNT(cond_bp) = 0 THEN NULL
       |                 ELSE SUM(cond_bp) // COUNT(cond_bp) END AS BIGINT) AS mean_cond_bp
       |FROM j GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val lm = Intermediates.of(tBigramLm)(s, dir).select("w1", "w2", "cond_bp")
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))""".stripMargin))
        .as("bigram"))
      .select(col("doc_id"),
        substring_index(col("bigram"), " ", 1).as("w1"),
        substring_index(col("bigram"), " ", -1).as("w2"))
      .join(broadcast(lm), Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), count(col("cond_bp")).as("n_known"),
        sum("cond_bp").as("s"))
      .selectExpr("doc_id", "n_bigrams", "n_known",
        "n_known * 10000L div n_bigrams AS known_bp",
        "CASE WHEN n_known = 0 THEN NULL ELSE s div n_known END AS mean_cond_bp")
  }

  /** t15: BPE merge-pair frequencies — the inner loop of byte-pair-
    * encoding tokenizer training: count adjacent whitespace-token pairs
    * across the corpus and surface the top merge candidates. In-row
    * pair construction (zip of the array with its own tail — no
    * self-join, no explode-then-window), one map-side-combined count on
    * short string keys, then TakeOrderedAndProject for the fully
    * tie-broken top 50. At 100 TB this is a linear scan + one bounded
    * shuffle keyed by distinct pairs — exactly how production BPE
    * trainers shape the count step.
    */
  val tBpePairs: QuerySpec = QuerySpec.sql(
    "t15_bpe_pairs",
    """WITH tok AS (
      |  SELECT string_split(text, ' ') AS t FROM documents
      |), pairs AS (
      |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1])) AS pair
      |  FROM tok
      |)
      |SELECT pair, COUNT(*) AS n FROM pairs
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin) { (s, dir) =>
    val t = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("pair"))
      .limit(50)
  }

  /** t16: collocation strength — for each adjacent token pair, the
    * conditional-probability association in both directions
    * (P(b|a), P(a|b)) as integer basis points; top 50 by combined
    * strength. The PMI-style signal a phrase-mining pass wants, kept in
    * bounded integer arithmetic (each bp <= 10000 regardless of corpus
    * size — no overflow and no float divergence at any scale, unlike a
    * raw lift numerator which grows with total token count). Two
    * vocab-bounded aggregations + a token-keyed join, then
    * TakeOrderedAndProject.
    */
  val tCollocations: QuerySpec = QuerySpec.sql(
    "t16_collocations",
    """WITH tok AS (
      |  SELECT string_split(text, ' ') AS t FROM documents
      |), pairs AS (
      |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |    i -> [t[i], t[i+1]])) AS pr
      |  FROM tok
      |), pc AS (
      |  SELECT pr[1] AS a, pr[2] AS b, COUNT(*) AS n_pair
      |  FROM pairs GROUP BY 1, 2
      |), uc AS (
      |  SELECT w, COUNT(*) AS n FROM (SELECT unnest(t) AS w FROM tok)
      |  GROUP BY 1
      |)
      |SELECT a, b, n_pair,
      |       CAST(n_pair * 10000 // ua.n AS BIGINT) AS fwd_bp,
      |       CAST(n_pair * 10000 // ub.n AS BIGINT) AS bwd_bp
      |FROM pc JOIN uc ua ON ua.w = a JOIN uc ub ON ub.w = b
      |WHERE n_pair >= 3
      |ORDER BY fwd_bp + bwd_bp DESC, a, b LIMIT 50""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val t = split(col("text"), " ")
    val pc = docs
      .select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("pr"))
      .select("pr.a", "pr.b")
      .groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 3)
    val uc = docs.select(explode(t).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    pc
      .join(uc.select(col("w").as("a"), col("n").as("na")), "a")
      .join(uc.select(col("w").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("n_pair"),
        expr("n_pair * 10000 div na").as("fwd_bp"),
        expr("n_pair * 10000 div nb").as("bwd_bp"))
      .orderBy((col("fwd_bp") + col("bwd_bp")).desc, col("a"), col("b"))
      .limit(50)
  }

  /** t17: per-document n-gram novelty — the fraction of a document's
    * distinct trigram shingles whose FIRST corpus occurrence (by
    * doc_id order) is this document. The marginal-contribution metric
    * dedup-aware curation ranks by: a doc that introduces nothing new
    * scores 0 even if it's no exact dup of anything. Operates on the
    * SHARED hashed-shingle relation (also consumed by d2/d7 — the
    * 64-bit hash is the shuffle key, not the shingle string; the
    * oracle hashes identically so a collision affects both engines the
    * same way): a hash-keyed min aggregation (map-side combinable), a
    * join back and a doc-keyed count — unbounded-corpus-safe shuffles.
    */
  val tNgramNovelty: QuerySpec = QuerySpec.sql(
    "t17_ngram_novelty",
    s"""WITH sh0 AS (
       |  SELECT doc_id, unnest(${graft.functions.Portable.shinglesSql(3).replace("\n", " ")}) AS s
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS h FROM sh0
       |), fo AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
       |SELECT sh.doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_sh,
       |       CAST(SUM(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       CAST(SUM(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 10000
       |            // COUNT(*) AS BIGINT) AS novelty_bp
       |FROM sh JOIN fo USING (h)
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    val sh = Dedup.shingleHashRel(s, dir)
    val fo = sh.groupBy("h").agg(min("doc_id").as("first_doc"))
    sh.join(fo, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .selectExpr("doc_id", "n_sh", "n_novel",
        "n_novel * 10000 div n_sh AS novelty_bp")
  }

  /** t18: vocabulary growth (Heaps' law) — cumulative distinct types vs
    * cumulative tokens over corpus-arrival deciles (doc_id order), the
    * curve that tells a corpus builder whether new data still brings
    * new vocabulary or only repeats it (flattening type-token ratio =
    * diminishing lexical returns; an anomalous jump = a contamination
    * or domain-shift signal). Cumulative distinct WITHOUT rescanning
    * prefixes: each type contributes at its FIRST-occurrence decile
    * (min over its docs), so vocab_cum(d) is one 10-row running sum
    * over the per-decile first-occurrence counts.
    *
    * Scale shape: one token-key shuffle (first-occurrence min +
    * occurrence counts, both map-side combined), one |deciles|-row
    * rollup; the running sums order 10 rows. The decile edge is the
    * 1-row broadcast MAX(doc_id).
    */
  val tVocabGrowth: QuerySpec = QuerySpec.sql(
    "t18_vocab_growth",
    """WITH n AS (SELECT MAX(doc_id) AS mx FROM documents),
      |tok AS (
      |  SELECT d.doc_id,
      |         least(d.doc_id * 10 // (n.mx + 1), 9) AS dec,
      |         unnest(string_split(d.text, ' ')) AS t
      |  FROM documents d CROSS JOIN n
      |), per_type AS (
      |  SELECT t, MIN(dec) AS fd FROM tok GROUP BY t
      |), new_types AS (
      |  SELECT fd AS dec, CAST(COUNT(*) AS BIGINT) AS n_new FROM per_type GROUP BY fd
      |), per_dec AS (
      |  SELECT dec, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |  FROM tok GROUP BY dec
      |), cum AS (
      |  SELECT p.dec, p.n_docs, p.n_tok, COALESCE(nt.n_new, 0) AS n_new,
      |         SUM(p.n_tok) OVER (ORDER BY p.dec
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_cum,
      |         SUM(COALESCE(nt.n_new, 0)) OVER (ORDER BY p.dec
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vocab_cum
      |  FROM per_dec p LEFT JOIN new_types nt ON nt.dec = p.dec
      |)
      |SELECT dec, n_docs, n_tok, n_new,
      |       CAST(tok_cum AS BIGINT) AS tok_cum,
      |       CAST(vocab_cum AS BIGINT) AS vocab_cum,
      |       CAST(vocab_cum * 10000 // tok_cum AS BIGINT) AS ttr_bp
      |FROM cum""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val mx = docs.agg(max("doc_id").as("mx"))
    // checkpoint at DOC scale (one row per doc with its token array —
    // the same footprint as the documents table), not the exploded
    // token stream: both consumers share one scan without ever
    // materializing corpus-token-scale rows. The decile rollup is
    // row-level: n_tok = Σ size(toks), n_docs = count(*) (split always
    // yields ≥ 1 token per doc).
    val base = docs.crossJoin(broadcast(mx))
      .select(col("doc_id"),
        least(expr("doc_id * 10 div (mx + 1)"), lit(9L)).as("dec"),
        Portable.tokens(col("text")).as("toks"))
      .localCheckpoint()
    val newTypes = base.select(col("dec"), explode(col("toks")).as("t"))
      .groupBy("t").agg(min("dec").as("fd"))
      .groupBy(col("fd").as("dec")).agg(count(lit(1)).as("n_new"))
    val perDec = base.groupBy("dec")
      .agg(sum(size(col("toks")).cast("long")).as("n_tok"),
        count(lit(1)).as("n_docs"))
    // 10-row running sums: the window domain is |deciles|, bounded by
    // construction (p8's largest-remainder justification applies)
    val w = Window.orderBy("dec")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDec.join(newTypes, Seq("dec"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("tok_cum", sum("n_tok").over(w))
      .withColumn("vocab_cum", sum("n_new").over(w))
      .selectExpr("dec", "n_docs", "n_tok", "n_new", "tok_cum", "vocab_cum",
        "vocab_cum * 10000L div tok_cum AS ttr_bp")
  }

  val all: Seq[QuerySpec] =
    Seq(tTokens, tQuality.memo, tLangId.memo, tFingerprint, tRepetition, tVocabDf.memo,
      tSurprisal, tRedact, tKeywords, tGopher, tBigramLm.memo, tLangConfusion,
      tCharEntropy, tLmScore, tBpePairs, tCollocations, tNgramNovelty,
      tVocabGrowth)
}
