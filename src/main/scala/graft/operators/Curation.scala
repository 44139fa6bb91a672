package graft.operators

import graft.{Intermediates, QuerySpec, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The end-to-end training-corpus curation pipeline as one oracle-checked
  * operator — the composition a 100 TB LLM data pipeline runs nightly:
  *
  *   quality filter → exact dedup (fingerprint) → near-dup dedup
  *   (identical MinHash signature) → per-language stratified cap.
  *
  * Every stage is deterministic integer/string arithmetic (see
  * TextAnalysis / Dedup for the primitives), so the full composition
  * hash-matches the DuckDB oracle. Dedup keeps the smallest doc_id per
  * group (keep-first); the stratified cap is hash-ordered (q25).
  */
object Curation {

  private val QualityMin = 6000 // basis points; keeps ~3/4 of the corpus
  private val PerLangCap = 50

  val pCorpus: QuerySpec = QuerySpec.sql(
    "p1_training_corpus",
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |         ${TextAnalysis.qualityBpSql(
                    "len(string_split(text, ' '))",
                    "len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))",
                    "n_chars")} AS quality_bp
       |  FROM documents
       |), hs AS (
       |  SELECT doc_id, list_transform(${Portable.shinglesSql(3).replace("\n", " ")},
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs
       |  FROM documents
       |), sig AS (
       |  SELECT doc_id, array_to_string(list_transform(generate_series(1, ${Dedup.K}),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % ${Portable.MinHashP}))), ',') AS sigstr
       |  FROM hs
       |), eligible AS (
       |  SELECT s.doc_id, s.lang, s.quality_bp,
       |         md5(regexp_replace(lower(s.text), '${graft.functions.Portable.WsRegex}', ' ', 'g')) AS fp,
       |         g.sigstr
       |  FROM scored s JOIN sig g ON s.doc_id = g.doc_id
       |  WHERE s.quality_bp >= $QualityMin
       |), deduped AS (
       |  SELECT doc_id, lang, quality_bp,
       |         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn_fp,
       |         ROW_NUMBER() OVER (PARTITION BY sigstr ORDER BY doc_id) AS rn_sig
       |  FROM eligible
       |), capped AS (
       |  SELECT doc_id, lang, quality_bp,
       |         ROW_NUMBER() OVER (PARTITION BY lang
       |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn_lang
       |  FROM deduped WHERE rn_fp = 1 AND rn_sig = 1
       |)
       |SELECT doc_id, lang, quality_bp
       |FROM capped WHERE rn_lang <= $PerLangCap""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val nTok = size(split(col("text"), " ")).cast("long")
    val nStop = size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long")
    val scored = docs
      .withColumn("n_tokens", nTok).withColumn("n_stop", nStop)
      .selectExpr("doc_id", "lang", "text",
        TextAnalysis.qualityBpSpark("n_tokens", "n_stop", "n_chars") +
          " AS quality_bp")
    // the one shared MinHash builder (Dedup.signatures), serialized
    val sig = Dedup.signatures(docs)
      .select(col("doc_id").as("sig_doc_id"),
        concat_ws(",", transform(col("sig"), v => v.cast("string"))).as("sigstr"))
    // materialize before the three window passes — each would otherwise
    // recompute the scan + signature aggregation
    val eligible = scored
      .filter(col("quality_bp") >= QualityMin)
      .join(sig, col("doc_id") === col("sig_doc_id"))
      .withColumn("fp", md5(regexp_replace(lower(col("text")),
        graft.functions.Portable.WsRegex, " ")))
      .drop("text")
      .localCheckpoint()
    val deduped = eligible
      .withColumn("rn_fp", row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
      .withColumn("rn_sig", row_number().over(Window.partitionBy("sigstr").orderBy("doc_id")))
      .filter(col("rn_fp") === 1 && col("rn_sig") === 1)
    deduped
      .withColumn("rn_lang", row_number().over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rn_lang") <= PerLangCap)
      .select("doc_id", "lang", "quality_bp")
  }

  /** Deterministic train/val/test split (80/10/10) keyed on a portable
    * document hash — any engine (and any rerun at any scale) assigns the
    * same split, the property that matters for reproducible corpora.
    */
  val pSplit: QuerySpec = QuerySpec.sql(
    "p2_train_test_split",
    """SELECT doc_id, lang,
      |       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
      |            WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM documents""".stripMargin) { (s, dir) =>
    val bucket = Portable.h32(col("doc_id").cast("string")) % 100
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
  }

  /** Eval-contamination detection: eval-split documents whose MinHash
    * signature is identical to any train-split document's — the dedup
    * machinery pointed across corpus boundaries, catching exact AND
    * near-duplicate leakage. At 100 TB this is a shuffle join on short
    * signature strings, never on text.
    */
  val pContamination: QuerySpec = QuerySpec.sql(
    "p3_contamination",
    s"""WITH hs AS (
       |  SELECT doc_id, list_transform(${Portable.shinglesSql(3).replace("\n", " ")},
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs
       |  FROM documents
       |), sig AS (
       |  SELECT doc_id,
       |         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
       |              THEN 'train' ELSE 'eval' END AS split,
       |         array_to_string(list_transform(generate_series(1, ${Dedup.K}),
       |           i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % ${Portable.MinHashP}))), ',') AS sigstr
       |  FROM hs
       |)
       |SELECT e.doc_id AS eval_doc, MIN(t.doc_id) AS train_doc
       |FROM sig e JOIN sig t
       |  ON e.sigstr = t.sigstr AND e.split = 'eval' AND t.split = 'train'
       |GROUP BY e.doc_id""".stripMargin) { (s, dir) =>
    val bucket = Portable.h32(col("doc_id").cast("string")) % 100
    val sig = Dedup.signatures(Tables.documents(s, dir))
      .select(col("doc_id"),
        when(bucket < 80, "train").otherwise("eval").as("split"),
        concat_ws(",", transform(col("sig"), v => v.cast("string"))).as("sigstr"))
      .localCheckpoint()
    val ev = sig.filter(col("split") === "eval")
      .select(col("doc_id").as("eval_doc"), col("sigstr"))
    val tr = sig.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc_id"), col("sigstr"))
    ev.join(tr, "sigstr")
      .groupBy("eval_doc").agg(min("train_doc_id").as("train_doc"))
  }

  /** Data-quality report as a single-row query — the dbt-style schema
    * tests (Checks/D3) surfaced through the oracle gate: violation
    * counts for not_null / uniqueness / accepted_values / referential
    * integrity over the star schema.
    *
    * One lazy plan: the three orders-level checks are a single
    * conditional-aggregation pass over orders; the two referential checks
    * are 1-row anti-join aggregates; the three 1-row frames cross-join
    * (BNLJ over single-row broadcast sides — intended). No driver-side
    * actions, so the report composes lazily like every other QuerySpec
    * and runs as one job.
    */
  val pQualityReport: QuerySpec = QuerySpec.sql(
    "p4_quality_report",
    """SELECT
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS null_orderkeys,
      |  (SELECT CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
      |     FROM orders) AS dup_orderkeys,
      |  (SELECT COUNT(*) FROM orders
      |    WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS bad_status,
      |  (SELECT COUNT(*) FROM orders o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                      WHERE c.c_custkey = o.o_custkey)) AS orphan_orders,
      |  (SELECT COUNT(*) FROM lineitem l
      |    WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                      WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lines""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val ordersChecks = orders.agg(
      count(when(col("o_orderkey").isNull, lit(1))).as("null_orderkeys"),
      (count("o_orderkey") - countDistinct("o_orderkey")).as("dup_orderkeys"),
      count(when(!col("o_orderstatus").isin("O", "F", "P"), lit(1))).as("bad_status"))
    val orphanOrders = orders.join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    val orphanLines = Tables.lineitem(s, dir).join(orders,
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lines"))
    ordersChecks.crossJoin(orphanOrders).crossJoin(orphanLines)
  }

  /** GPT-style sequence packing: documents are concatenated per shard in
    * deterministic doc_id order and chunked into fixed token budgets —
    * pack_id = starting-offset div SeqLen (a doc may span a pack
    * boundary, the standard concat-and-chunk semantics). The shard is a
    * portable hash bucket, so packing parallelizes as one window pass per
    * shard partition — at 100 TB the running sum never leaves the shard.
    */
  val pPacking: QuerySpec = QuerySpec.sql(
    "p5_sequence_packing",
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, shard, n_tok,
      |         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t
      |)
      |SELECT doc_id, shard, n_tok,
      |       CAST(cum - n_tok AS BIGINT) AS offset,
      |       CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id
      |FROM c""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (Portable.h32(col("doc_id").cast("string")) % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .selectExpr("doc_id", "shard", "n_tok",
        "CAST(cum - n_tok AS BIGINT) AS offset",
        "(cum - n_tok) div 512 AS pack_id")
  }

  /** Domain mixing: per-source sampling rates (the data-mixture knob every
    * pretraining corpus tunes — upweight curated sources, downsample the
    * crawl). Deterministic: a doc is kept iff its salted portable hash
    * falls under its source's rate in basis points, so the same mixture
    * reproduces on any engine, any rerun, any scale. Row-level filter —
    * no shuffle, scales with input splits.
    */
  val pDomainMix: QuerySpec = QuerySpec.sql(
    "p6_domain_mix",
    """WITH r AS (
      |  SELECT doc_id, source, lang,
      |         CASE WHEN CAST(substring(source, 4) AS INT) < 5 THEN 10000
      |              WHEN CAST(substring(source, 4) AS INT) < 10 THEN 5000
      |              ELSE 2500 END AS rate_bp,
      |         CAST(('0x' || substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
      |  FROM documents
      |)
      |SELECT doc_id, source, lang, CAST(rate_bp AS BIGINT) AS rate_bp
      |FROM r WHERE bucket < rate_bp""".stripMargin) { (s, dir) =>
    // substring(source, 4) with no length cap, matching the oracle — an
    // 8-char cap would silently parse a different prefix than DuckDB on
    // source ids longer than 8 digits
    val srcIdx = expr("substring(source, 4)").cast("int")
    val rate = when(srcIdx < 5, 10000L).when(srcIdx < 10, 5000L)
      .otherwise(2500L)
    val bucket = Portable.h32(concat(lit("mix"), col("doc_id").cast("string"))) % 10000
    Tables.documents(s, dir)
      .withColumn("rate_bp", rate)
      .filter(bucket < col("rate_bp"))
      .select("doc_id", "source", "lang", "rate_bp")
  }

  /** N-gram decontamination (the GPT-3-style 13-gram scrub, scaled to
    * 5-grams for this corpus's doc lengths): an eval document is
    * contaminated if ANY of its distinct word 5-grams also occurs in any
    * train document. Both sides reduce to 60-bit portable shingle hashes,
    * so the join shuffles fixed-width longs — never text — and the
    * train side dedups to the distinct n-gram set before the join.
    * Complements p3 (whole-doc signature match) with passage-level leaks.
    */
  val pNgramDecontam: QuerySpec = QuerySpec.sql(
    "p7_ngram_decontam",
    s"""WITH g AS (
       |  SELECT doc_id,
       |         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
       |              THEN 'train' ELSE 'eval' END AS split,
       |         unnest(${Portable.shinglesSql(5).replace("\n", " ")}) AS g
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, split, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h FROM g
       |), tr AS (SELECT DISTINCT h FROM h WHERE split = 'train')
       |SELECT e.doc_id AS eval_doc, COUNT(*) AS n_shared
       |FROM h e JOIN tr USING (h) WHERE e.split = 'eval'
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    // materialize (doc_id, split, h) once — both join sides would
    // otherwise rescan the text and re-explode the shingles (the
    // dominant cost at scale); the checkpoint holds fixed-width longs
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(Portable.h32(col("doc_id").cast("string")) % 100 < 80, "train")
          .otherwise("eval").as("split"),
        // native single-pass shingle→h60 (value-identical to the
        // explode(shingles)+h60 composition; one tight loop per row)
        explode(graft.functions.ShingleHash.shingleHashes60(col("text"), 5)).as("h"))
      .localCheckpoint()
    val train = grams.filter(col("split") === "train").select("h").distinct()
    grams.filter(col("split") === "eval")
      .select(col("doc_id").as("eval_doc"), col("h"))
      .join(train, "h")
      .groupBy("eval_doc").agg(count(lit(1)).as("n_shared"))
  }

  /** Proportional stratified sampling with an EXACT total: a fixed
    * budget of 100 documents allocated across languages by the
    * largest-remainder method (floor quotas, then +1 to the largest
    * remainders until the budget is spent) — all integer arithmetic, so
    * the allocation is identical in any engine — then a deterministic
    * hash-ordered take per stratum. Unlike rate-based sampling (p6/q25)
    * the output size is exact, which is what an eval-set budget needs.
    * The quota relations are |langs|-sized broadcasts; the only
    * corpus-scale pass is the per-stratum rank.
    */
  val pProportional: QuerySpec = QuerySpec.sql(
    "p8_proportional_sample",
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
      |), tot AS (SELECT SUM(n) AS t FROM c),
      |alloc AS (
      |  SELECT lang, n,
      |         CAST(100 * n // t AS BIGINT) AS base,
      |         ROW_NUMBER() OVER (ORDER BY (100 * n % t) DESC, lang) AS rr
      |  FROM c CROSS JOIN tot
      |), quota AS (
      |  SELECT lang,
      |         base + CASE WHEN rr <= 100 - (SELECT SUM(base) FROM alloc)
      |                     THEN 1 ELSE 0 END AS k
      |  FROM alloc
      |), ranked AS (
      |  SELECT d.doc_id, d.lang,
      |         ROW_NUMBER() OVER (PARTITION BY d.lang
      |           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
      |  FROM documents d
      |)
      |SELECT r.doc_id, r.lang FROM ranked r JOIN quota q USING (lang)
      |WHERE r.rn <= q.k""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("t"))
    val alloc = counts.crossJoin(broadcast(tot))
      .selectExpr("lang", "n", "100 * n div t AS base", "100 * n % t AS rem")
      .withColumn("rr",
        row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
    val baseSum = alloc.agg(sum("base").as("bs"))
    val quota = alloc.crossJoin(broadcast(baseSum))
      .selectExpr("lang",
        "base + CASE WHEN rr <= 100 - bs THEN 1 ELSE 0 END AS k")
    docs
      .withColumn("rn", row_number().over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .join(broadcast(quota), "lang")
      .filter(col("rn") <= col("k"))
      .select("doc_id", "lang")
  }

  /** Document-length histogram: fixed character-count boundaries (no
    * floating-point bucketing — log2 rounds differently across engines
    * near integer boundaries) with each bucket's corpus share in basis
    * points. One hash aggregation; the share divides by an unpartitioned
    * window sum over the handful of bucket rows, not a second scan.
    */
  val pLengthHist: QuerySpec = QuerySpec.sql(
    "p9_length_histogram",
    """WITH b AS (
      |  SELECT CASE WHEN n_chars < 100 THEN 'lt100' WHEN n_chars < 200 THEN 'lt200'
      |              WHEN n_chars < 400 THEN 'lt400' WHEN n_chars < 800 THEN 'lt800'
      |              ELSE 'ge800' END AS bucket
      |  FROM documents
      |), c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1)
      |SELECT bucket, n,
      |       CAST(n * 10000 // (SELECT SUM(n) FROM c) AS BIGINT) AS share_bp
      |FROM c""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .selectExpr(
        """CASE WHEN n_chars < 100 THEN 'lt100' WHEN n_chars < 200 THEN 'lt200'
          |     WHEN n_chars < 400 THEN 'lt400' WHEN n_chars < 800 THEN 'lt800'
          |     ELSE 'ge800' END AS bucket""".stripMargin)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("share_bp", expr("n * 10000L div sum(n) over ()"))
  }

  /** Curation filter funnel: the end-to-end keep/drop accounting a
    * corpus build publishes — survivors after each cumulative stage
    * (Gopher quality gate → repetition gate → per-source budget cap).
    * One text pass computes every flag; the stage counts are lazy 1-row
    * aggregates unioned together (the p4 lesson: no driver-side actions
    * inside a query builder). The only corpus-keyed shuffle is the
    * per-source rank for the cap.
    */
  val pFilterFunnel: QuerySpec = QuerySpec.sql(
    "p10_filter_funnel",
    """WITH f AS (
      |  SELECT doc_id, source, n_chars,
      |         len(string_split(text,' ')) AS n_tokens,
      |         len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS n_stop,
      |         len(list_filter(string_split(text,' '), t -> regexp_matches(t,'[a-z]'))) AS n_alpha,
      |         CASE WHEN len(string_split(text,' ')) >= 3
      |           THEN len(list_distinct(list_transform(
      |                  generate_series(1, len(string_split(text,' ')) - 2),
      |                  i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))) * 10000
      |                // (len(string_split(text,' ')) - 2)
      |           ELSE 10000 END AS distinct_bp
      |  FROM documents
      |), flags AS (
      |  SELECT doc_id, source,
      |    CASE WHEN n_tokens BETWEEN 20 AND 1000
      |          AND (n_chars - n_tokens + 1) * 100 // n_tokens BETWEEN 150 AND 1000
      |          AND n_alpha * 10000 // n_tokens >= 8000
      |          AND n_stop >= 2 THEN 1 ELSE 0 END AS g,
      |    CASE WHEN distinct_bp >= 9800 THEN 1 ELSE 0 END AS r
      |  FROM f
      |), s2 AS (SELECT doc_id, source FROM flags WHERE g = 1 AND r = 1),
      |s3 AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id) AS rn
      |    FROM s2) WHERE rn <= 15)
      |SELECT 's0_all' AS stage, CAST(COUNT(*) AS BIGINT) AS survivors FROM flags
      |UNION ALL SELECT 's1_gopher', CAST(SUM(g) AS BIGINT) FROM flags
      |UNION ALL SELECT 's2_repetition', CAST(COUNT(*) AS BIGINT) FROM s2
      |UNION ALL SELECT 's3_source_cap', CAST(COUNT(*) AS BIGINT) FROM s3""".stripMargin) { (s, dir) =>
    val flags = Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long"))
      .withColumn("n_alpha",
        size(filter(split(col("text"), " "), t => t.rlike("[a-z]"))).cast("long"))
      // native distinct-trigram count (ShingleHash32 dedups on the
      // shingle string, identical to the list_distinct the oracle runs)
      .withColumn("n_distinct_tri",
        size(graft.functions.ShingleHash.shingleHashes(col("text"), 3)).cast("long"))
      .withColumn("distinct_bp", expr(
        """CASE WHEN size(split(text, ' ')) >= 3
          |  THEN n_distinct_tri * 10000L div (size(split(text, ' ')) - 2)
          |  ELSE 10000L END""".stripMargin))
      .selectExpr("doc_id", "source",
        """CASE WHEN n_tokens BETWEEN 20 AND 1000
          |      AND (n_chars - n_tokens + 1) * 100L div n_tokens BETWEEN 150 AND 1000
          |      AND n_alpha * 10000L div n_tokens >= 8000
          |      AND n_stop >= 2 THEN 1L ELSE 0L END AS g""".stripMargin,
        "CASE WHEN distinct_bp >= 9800 THEN 1L ELSE 0L END AS r")
      .localCheckpoint()
    val s2 = flags.filter(col("g") === 1 && col("r") === 1)
    val s3 = s2
      .withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(Portable.h32(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rn") <= 15)
    flags.agg(count(lit(1)).as("survivors")).select(lit("s0_all").as("stage"), col("survivors"))
      .unionAll(flags.agg(sum(col("g")).as("survivors")).select(lit("s1_gopher").as("stage"), col("survivors")))
      .unionAll(s2.agg(count(lit(1)).as("survivors")).select(lit("s2_repetition").as("stage"), col("survivors")))
      .unionAll(s3.agg(count(lit(1)).as("survivors")).select(lit("s3_source_cap").as("stage"), col("survivors")))
  }

  /** Combined contamination report: every eval-split document with both
    * leak signals side by side — whole-doc near-duplication (p3's
    * signature match) and passage-level overlap (p7's shared 5-gram
    * count) — resolved into one verdict. Composes the two registered
    * operators' run functions, then left-joins their doc-keyed outputs
    * onto the eval universe; all joins key on doc_id.
    */
  val pContaminationReport: QuerySpec = QuerySpec.sql(
    "p11_contamination_report",
    s"""WITH sp AS (
       |  SELECT doc_id,
       |         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
       |              THEN 'train' ELSE 'eval' END AS split
       |  FROM documents
       |), hs AS (
       |  SELECT doc_id, list_transform(${Portable.shinglesSql(3).replace("\n", " ")},
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs
       |  FROM documents
       |), sig AS (
       |  SELECT h.doc_id, sp.split,
       |         array_to_string(list_transform(generate_series(1, ${Dedup.K}),
       |           i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % ${Portable.MinHashP}))), ',') AS sigstr
       |  FROM hs h JOIN sp ON sp.doc_id = h.doc_id
       |), sigm AS (
       |  SELECT DISTINCT e.doc_id FROM sig e JOIN sig t
       |    ON e.sigstr = t.sigstr AND e.split = 'eval' AND t.split = 'train'
       |), g AS (
       |  SELECT d.doc_id, sp.split, unnest(${Portable.shinglesSql(5).replace("\n", " ")}) AS g
       |  FROM documents d JOIN sp ON sp.doc_id = d.doc_id
       |), gh AS (
       |  SELECT doc_id, split, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h FROM g
       |), tr AS (SELECT DISTINCT h FROM gh WHERE split = 'train'),
       |shared AS (
       |  SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM gh e JOIN tr USING (h) WHERE e.split = 'eval' GROUP BY 1
       |)
       |SELECT sp.doc_id AS eval_doc,
       |       CAST(CASE WHEN sigm.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS sig_match,
       |       CAST(COALESCE(shared.n_shared, 0) AS BIGINT) AS n_shared_grams,
       |       CASE WHEN sigm.doc_id IS NOT NULL THEN 'near_dup'
       |            WHEN COALESCE(shared.n_shared, 0) >= 3 THEN 'passage_leak'
       |            WHEN COALESCE(shared.n_shared, 0) >= 1 THEN 'minor_overlap'
       |            ELSE 'clean' END AS verdict
       |FROM sp LEFT JOIN sigm ON sigm.doc_id = sp.doc_id
       |        LEFT JOIN shared ON shared.doc_id = sp.doc_id
       |WHERE sp.split = 'eval'""".stripMargin) { (s, dir) =>
    val bucket = Portable.h32(col("doc_id").cast("string")) % 100
    val evalDocs = Tables.documents(s, dir)
      .filter(bucket >= 80).select(col("doc_id").as("eval_doc"))
    val sigMatches = Intermediates.of(pContamination)(s, dir)
      .select(col("eval_doc").as("sm_doc"), lit(1L).as("sig_match"))
    val shared = Intermediates.of(pNgramDecontam)(s, dir)
      .select(col("eval_doc").as("sh_doc"), col("n_shared"))
    evalDocs
      .join(sigMatches, col("eval_doc") === col("sm_doc"), "left")
      .join(shared, col("eval_doc") === col("sh_doc"), "left")
      .select(col("eval_doc"),
        coalesce(col("sig_match"), lit(0L)).as("sig_match"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_grams"))
      .withColumn("verdict",
        when(col("sig_match") === 1, "near_dup")
          .when(col("n_shared_grams") >= 3, "passage_leak")
          .when(col("n_shared_grams") >= 1, "minor_overlap")
          .otherwise("clean"))
  }

  /** Curriculum assignment: per-language quality quartiles over the t2
    * quality score, best first — the staged-training data ordering
    * (clean buckets early, noisy late). The quality producer is shared
    * through the materialize-once registry; the NTILE window is
    * partitioned by lang, so bucketing distributes across the language
    * dimension (per-language row counts bound each partition's sort).
    */
  val pCurriculum: QuerySpec = QuerySpec.sql(
    "p12_curriculum",
    s"""WITH q AS (${TextAnalysis.tQuality.oracle.get})
       |SELECT doc_id, lang, quality_bp,
       |       NTILE(4) OVER (PARTITION BY lang
       |                      ORDER BY quality_bp DESC, doc_id) AS bucket
       |FROM q""".stripMargin) { (s, dir) =>
    Intermediates.of(TextAnalysis.tQuality)(s, dir)
      .select(col("doc_id"), col("lang"), col("quality_bp"),
        ntile(4).over(Window.partitionBy("lang")
          .orderBy(col("quality_bp").desc, col("doc_id"))).as("bucket"))
  }

  /** p13: language-mix rebalancing — given an equal-share token target
    * across languages, the per-language sampling rate (integer basis
    * points, capped at 10000: downsample the over-represented, never
    * upsample) and the resulting kept-token budget. The static version
    * of the data-mixture reweighting every multilingual corpus build
    * runs; two aggregations (one lang-keyed, one 1-row total) and a
    * broadcast — no per-doc work until the rate is applied.
    */
  val pMixRebalance: QuerySpec = QuerySpec.sql(
    "p13_mix_rebalance",
    """WITH a AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(tokens) AS BIGINT) AS tot, COUNT(*) AS nl FROM a
      |)
      |SELECT lang, n_docs, tokens,
      |       CAST(t.tot // t.nl AS BIGINT) AS target_tokens,
      |       CAST(least(10000, (t.tot // t.nl) * 10000 // tokens) AS BIGINT) AS rate_bp,
      |       CAST(tokens * least(10000, (t.tot // t.nl) * 10000 // tokens) // 10000
      |            AS BIGINT) AS kept_tokens
      |FROM a CROSS JOIN t""".stripMargin) { (s, dir) =>
    val a = Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("tokens"))
    val t = a.agg(sum("tokens").as("tot"), count(lit(1)).as("nl"))
    a.crossJoin(broadcast(t))
      .selectExpr("lang", "n_docs", "tokens",
        "tot div nl AS target_tokens",
        "least(10000L, (tot div nl) * 10000 div tokens) AS rate_bp",
        "tokens * least(10000L, (tot div nl) * 10000 div tokens) div 10000 AS kept_tokens")
  }

  /** p14: token-budget corpus selection — the highest-quality prefix of
    * each language that fits an equal-share token budget (greedy
    * selection under constraint, the final step a data-mixture plan
    * actually executes; composes the memoized t2 quality producer and
    * p13's budget arithmetic). One per-lang rank + running-sum window
    * — partitioned, scale-safe — and a 1-row broadcast budget.
    */
  val pBudgetSelect: QuerySpec = QuerySpec.sql(
    "p14_budget_select",
    s"""WITH q AS (${TextAnalysis.tQuality.oracle.get}),
       |tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
       |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl
       |  FROM q
       |), r AS (
       |  SELECT lang, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY lang
       |           ORDER BY quality_bp DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM q
       |)
       |SELECT lang, COUNT(*) AS n_selected,
       |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
       |       CAST(MAX(t // nl) AS BIGINT) AS budget_tokens
       |FROM r CROSS JOIN tot
       |WHERE cum <= t // nl
       |GROUP BY lang""".stripMargin) { (s, dir) =>
    val q = Intermediates.of(TextAnalysis.tQuality)(s, dir)
      .select("doc_id", "lang", "n_tokens", "quality_bp")
    val tot = q.agg(sum("n_tokens").as("t"),
      countDistinct("lang").as("nl"))
    q.withColumn("cum", sum("n_tokens").over(
        Window.partitionBy("lang")
          .orderBy(col("quality_bp").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .filter(col("cum") <= expr("t div nl"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_selected"),
        sum("n_tokens").as("tokens_selected"),
        max(expr("t div nl")).as("budget_tokens"))
  }

  /** p15: leakage-safe train/eval split — p2's hash split upgraded to
    * the unit a careful eval pipeline actually needs: the assignment
    * unit is the NEAR-DUP CLUSTER (d5's connected components over the
    * MinHash-LSH pair graph; singletons are their own unit), so two
    * near-duplicate documents can never straddle the boundary and leak
    * eval content into training. The output carries its own audit: the
    * global count of near-dup pairs whose endpoints landed on different
    * sides (leaked_pairs — 0 by construction, and the ORACLE recomputes
    * it from the raw closure, so a wrong label or a per-doc hash slip
    * fails the gate, not just the invariant).
    *
    * Scale shape: the pair graph and labels come from the shared
    * materialize-once seam (built once for d3/d5/d18/s10); the split is
    * a per-row hash of the unit id; the audit is two narrow equi-joins
    * on doc_id; the scalar leak count broadcasts as a 1-row frame.
    */
  val pLeakageSplit: QuerySpec = QuerySpec.sql(
    "p15_leakage_split",
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Portable.shinglesSql(3).replace("\n", " ")} AS sh FROM documents
       |), hs AS (
       |  SELECT doc_id, list_transform(sh,
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs FROM sh
       |), sig AS (
       |  SELECT doc_id, list_transform(generate_series(1, ${Dedup.K}),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % ${Dedup.P}))) AS sig
       |  FROM hs
       |), bands AS (
       |  SELECT doc_id, sig, unnest(list_transform(generate_series(0, ${Dedup.Bands - 1}),
       |    j -> j || ':' || array_to_string(sig[j*4+1:j*4+4], ','))) AS bk
       |  FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.doc_a
       |  JOIN sig sb ON sb.doc_id = cand.doc_b
       |  WHERE len(list_filter(generate_series(1, ${Dedup.K}),
       |        i -> sa.sig[i] = sb.sig[i])) * 1.0 / ${Dedup.K} >= 0.5
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS t FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |), reach(s, t) AS (
       |  SELECT s, t FROM edges
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
       |), labels AS (
       |  SELECT s AS doc_id, least(s, MIN(t)) AS cluster_id FROM reach GROUP BY s
       |), sides AS (
       |  SELECT d.doc_id, d.n_chars, COALESCE(l.cluster_id, d.doc_id) AS unit,
       |         CASE WHEN CAST(('0x' || substring(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
       |              THEN 'train' ELSE 'eval' END AS split
       |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
       |), leaks AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS leaked_pairs
       |  FROM pairs p
       |  JOIN sides a ON a.doc_id = p.doc_a
       |  JOIN sides b ON b.doc_id = p.doc_b
       |  WHERE a.split <> b.split
       |)
       |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT unit) AS n_units,
       |       CAST(SUM(n_chars) AS BIGINT) AS chars,
       |       (SELECT leaked_pairs FROM leaks) AS leaked_pairs
       |FROM sides GROUP BY split""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "n_chars")
    val pairs = Intermediates.of(Dedup.dMinHash)(s, dir)
      .select("doc_a", "doc_b")
    val labels = ConnectedComponents.labels(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("label"))
    val sides = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("unit", coalesce(col("label"), col("doc_id")))
      .withColumn("split",
        when(Portable.h32(col("unit").cast("string")) % 100 < 90, "train")
          .otherwise("eval"))
      .localCheckpoint() // feeds the rollup and both sides of the audit
    val leaked = pairs
      .join(sides.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(sides.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .agg(count(lit(1)).as("leaked_pairs"))
    sides.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("unit")).as("n_units"),
        sum("n_chars").as("chars"))
      .crossJoin(broadcast(leaked))
  }

  /** p16: dedup ATTRIBUTION — per document, which dedup algorithm
    * would drop or flag it: exact (a lower-id doc shares its md5 text),
    * MinHash near-dup (appears as the higher id in a d3 pair —
    * keep-first semantics), SimHash near-dup (higher id in a d6
    * hamming-≤6 pair), substring (≥ half its d19 fingerprint windows
    * are cross-document). The "why was this document removed"
    * provenance relation a production pipeline needs before anyone
    * trusts the dedup stack — and the overlap between algorithms
    * (n_verdicts ≥ 2) is the redundancy audit that says whether a
    * cheaper subset would catch the same mass. Composes the four
    * REGISTERED operators through the materialize-once seam; the
    * oracle re-derives each verdict from its own proven CTE chain.
    */
  val pDedupAttribution: QuerySpec = QuerySpec.sql(
    "p16_dedup_attribution",
    s"""WITH ex0 AS (
       |${Dedup.dExact.oracle.get}
       |), ex AS (SELECT doc_id FROM ex0 WHERE NOT is_canonical),
       |mh0 AS (
       |${Dedup.dMinHash.oracle.get}
       |), mh AS (SELECT DISTINCT doc_b AS doc_id FROM mh0),
       |sm0 AS (
       |${Dedup.dSimHashPairs.oracle.get}
       |), sm AS (SELECT DISTINCT doc_b AS doc_id FROM sm0),
       |sub0 AS (
       |${Dedup.dSubstring.oracle.get}
       |), sub AS (SELECT doc_id FROM sub0 WHERE share_bp >= 5000),
       |flags AS (
       |  SELECT doc_id, 'exact' AS a FROM ex
       |  UNION ALL SELECT doc_id, 'minhash' FROM mh
       |  UNION ALL SELECT doc_id, 'simhash' FROM sm
       |  UNION ALL SELECT doc_id, 'substr' FROM sub
       |)
       |SELECT doc_id,
       |       CAST(MAX(CASE WHEN a = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS exact_dup,
       |       CAST(MAX(CASE WHEN a = 'minhash' THEN 1 ELSE 0 END) AS BIGINT) AS minhash_dup,
       |       CAST(MAX(CASE WHEN a = 'simhash' THEN 1 ELSE 0 END) AS BIGINT) AS simhash_dup,
       |       CAST(MAX(CASE WHEN a = 'substr' THEN 1 ELSE 0 END) AS BIGINT) AS substr_flag,
       |       CAST(COUNT(DISTINCT a) AS BIGINT) AS n_verdicts
       |FROM flags GROUP BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.DataFrame
    // every verdict comes from the REGISTERED operator through the seam
    // — and the oracle above interpolates those operators' own oracle
    // texts (the d13 pattern), so neither side can drift from the
    // algorithms it attributes
    val ex = Intermediates.of(Dedup.dExact)(s, dir)
      .filter(!col("is_canonical"))
      .select(col("doc_id"), lit("exact").as("a"))
    def dropped(pairs: DataFrame, tag: String): DataFrame =
      pairs.select(col("doc_b").as("doc_id")).distinct()
        .withColumn("a", lit(tag))
    val mh = dropped(Intermediates.of(Dedup.dMinHash)(s, dir), "minhash")
    val sm = dropped(Intermediates.of(Dedup.dSimHashPairs)(s, dir), "simhash")
    val sub = Intermediates.of(Dedup.dSubstring)(s, dir)
      .filter(col("share_bp") >= 5000)
      .select(col("doc_id"), lit("substr").as("a"))
    ex.unionByName(mh).unionByName(sm).unionByName(sub)
      .groupBy("doc_id")
      .agg(
        max(when(col("a") === "exact", 1L).otherwise(0L)).as("exact_dup"),
        max(when(col("a") === "minhash", 1L).otherwise(0L)).as("minhash_dup"),
        max(when(col("a") === "simhash", 1L).otherwise(0L)).as("simhash_dup"),
        max(when(col("a") === "substr", 1L).otherwise(0L)).as("substr_flag"),
        countDistinct("a").as("n_verdicts"))
  }

  /** p17: INCREMENTAL curation maintenance via the change feed — the
    * growth shape of a production training corpus: the curated
    * (quality-filtered) view is maintained from the table's row-level
    * CDF instead of re-filtering the corpus. The documents snapshot
    * suffers an update-merge (+500 chars on every %11 doc) and a
    * language purge (DELETE lang='de' — the oracle keeps NULL-lang
    * rows, mirroring SQL DELETE's NULL-predicate-survives rule that
    * deleteWhere implements); the curated view starts from
    * v1 and absorbs the feed algebraically — minus the deletes that
    * passed the filter, plus the inserts that pass it. The oracle
    * recomputes the curated view from the FINAL state from scratch:
    * incremental == recompute, proven by hash (the same identity as
    * q69-71/d15, now through changeFeed). At 100 TB the refresh cost
    * is the feed's touched files, never a corpus re-filter.
    */
  val pIncrementalCuration: QuerySpec = QuerySpec.sql(
    "p17_incremental_curation",
    """WITH st AS (
      |  SELECT doc_id, lang, source,
      |         CASE WHEN doc_id % 11 = 0 THEN n_chars + 500
      |              ELSE n_chars END AS n_chars
      |  FROM documents),
      |fin AS (SELECT * FROM st WHERE lang <> 'de' OR lang IS NULL),
      |cur AS (SELECT * FROM fin WHERE n_chars >= 300)
      |SELECT lang, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM cur GROUP BY lang""".stripMargin) { (s, dir) =>
    import graft.sources.Snapshots
    val root = graft.operators.Incremental.snapRoot(s, dir, "curcdf")
    val docs = Tables.documents(s, dir)
      .select("doc_id", "lang", "source", "n_chars")
    graft.operators.Incremental.ensureBuilt(s, root, 3) {
      Snapshots.commit(docs.repartitionByRange(8, col("doc_id")), root)
      Snapshots.merge(s, root, docs.filter(col("doc_id") % 11 === 0)
        .withColumn("n_chars", col("n_chars") + 500), "doc_id")
      Snapshots.deleteWhere(s, root, col("lang") === "de")
    }
    val quality = col("n_chars") >= 300
    val curatedV1 = Snapshots.read(s, root, asOf = Some(1L)).filter(quality)
    val feed = Snapshots.changeFeed(s, root, from = 1L, to = 3L)
    val curated = curatedV1
      .exceptAll(feed.filter(col("_change_type") === "delete" && quality)
        .drop("_change_type"))
      .unionByName(feed.filter(col("_change_type") === "insert" && quality)
        .drop("_change_type"))
    curated.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
  }

  val all: Seq[QuerySpec] =
    Seq(pCorpus, pSplit, pContamination.memo, pQualityReport, pPacking,
      pDomainMix, pNgramDecontam.memo, pProportional, pLengthHist, pFilterFunnel,
      pContaminationReport, pCurriculum, pMixRebalance, pBudgetSelect,
      pLeakageSplit, pDedupAttribution, pIncrementalCuration)
}
