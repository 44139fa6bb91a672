package graft.operators

import graft.{Intermediates, QuerySpec, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column

/** Deduplication operators over `documents` — the training-data-pipeline
  * workhorses: exact (hash groupBy), word-n-gram Jaccard (shingle join),
  * MinHash+LSH (signature → band → bucket join), SimHash (bitwise
  * signature).
  *
  * Scale posture: exact dedup partitions by md5(text) (uniform, bounded
  * key width — never by raw text). MinHash signatures are computed purely
  * with array expressions (no explode, no shuffle, codegen'd); only the
  * band→bucket join shuffles, on short band-key strings. The exact-Jaccard
  * shingle self-join is the quadratic verifier — at 100 TB it runs only on
  * LSH candidates, which is exactly how d3 composes (candidates → est).
  */
object Dedup {

  private[operators] val K = 16      // minhash permutations
  private[operators] val Bands = 4   // 4 bands × 4 rows
  private[operators] val P = Portable.MinHashP

  /** Exact dedup: copies + canonical flag per identical-text group.
    * Ref intent: S21/T7 idempotent dedup (ON CONFLICT DO NOTHING ≡
    * keep-first-by-key).
    */
  val dExact: QuerySpec = QuerySpec.sql(
    "d1_dedup_exact",
    """SELECT doc_id,
      |       COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
      |       (doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
      |FROM documents""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(md5(col("text")))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        count(lit(1)).over(w).as("n_copies"),
        (col("doc_id") === min("doc_id").over(w)).as("is_canonical"))
  }

  /** Shared exploded shingle-hash relation (doc_id, h): d2, d7 and t17
    * join and aggregate over the IDENTICAL relation — materialized once
    * per session+dir through the Intermediates seam instead of per
    * query. Hashes are DISTINCT per doc (row-local array_distinct, no
    * shuffle; oracles mirror with SELECT DISTINCT): ShingleHash32 dedups
    * shingle STRINGS, so a within-doc 32-bit hash collision would
    * otherwise leave duplicate h values — which breaks the i ≤ min(na,
    * nb) invariant d2/d7's size-ratio prunes are derived from (a pair
    * the oracle emits could then be pruned). Hash-distinct restores the
    * invariant and keeps both engines on the same set semantics.
    */
  private[operators] def shingleHashRel(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Intermediates.cached(s, dir, "dedup_sh3") {
      Tables.documents(s, dir).select(col("doc_id"),
        explode(array_distinct(
          graft.functions.ShingleHash.shingleHashes(col("text"), 3))).as("h"))
    }

  /** Exact word-trigram Jaccard near-dup pairs (j >= 0.6): distinct
    * shingles → hash → self-join on the 64-bit hash (narrow shuffle key;
    * the oracle joins on the identical md5-derived hash so any collision
    * affects both engines the same way) → |∩| / |∪|.
    */
  val dJaccard: QuerySpec = QuerySpec.sql(
    "d2_ngram_jaccard",
    s"""WITH sh0 AS (
       |  SELECT doc_id, unnest(${Portable.shinglesSql(3).replace("\n", " ")}) AS s
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS h FROM sh0
       |), cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |       ROUND(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.6""".stripMargin) { (s, dir) =>
    // the hashed-shingle relation feeds the count aggregate and BOTH
    // sides of the self-join; it comes from the shared materialized
    // relation (d7 reads the same one)
    val sh = shingleHashRel(s, dir)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // size-ratio prefilter: j >= 0.6 implies min(na,nb)/max(na,nb) >= 0.6
    // (i <= min and j <= min/max), so pairs failing 5·min >= 3·max can be
    // pruned before the heavy pair aggregation. Sound — never drops a
    // qualifying pair — BECAUSE shingleHashRel is hash-distinct per doc
    // (i <= min needs set semantics on h); the oracle needs no mirror
    // (its final filter is the same predicate).
    val shn = sh.join(broadcast(cnt), "doc_id")
    val a = shn.as("a"); val b = shn.as("b")
    val inter = a.join(b, col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") * 5 >= col("b.n") * 3 && col("b.n") * 5 >= col("a.n") * 3)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val j = col("i") * lit(1.0) /
      (col("ca.n") + col("cb.n") - col("i"))
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .filter(j >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
  }

  /** MinHash signatures (sig[i] = min over shingle hashes x of
    * (2i+1)·x + 104729·i mod P) via the native MinHashSig expression:
    * one row-level pass, no explode, no aggregation, NO shuffle — the
    * signature build is an embarrassingly parallel projection. (History:
    * HOF lambdas were ~30× slower; the explode + K min-aggs shape fixed
    * that but still shuffled one row per shingle — this removes the
    * shuffle entirely.)
    */
  private[operators] def signatures(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      graft.functions.ShingleHash.minHashSig(col("text"), 3, K, P).as("sig"))

  /** MinHash + LSH near-dup candidates: band buckets → pair join →
    * signature-agreement estimate (est >= 0.5).
    */
  val dMinHash: QuerySpec = QuerySpec.sql(
    "d3_minhash_lsh",
    s"""WITH sh AS (
       |  SELECT doc_id, ${Portable.shinglesSql(3).replace("\n", " ")} AS sh FROM documents
       |), hs AS (
       |  SELECT doc_id, list_transform(sh,
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs FROM sh
       |), sig AS (
       |  SELECT doc_id, list_transform(generate_series(1, $K),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % $P))) AS sig
       |  FROM hs
       |), bands AS (
       |  SELECT doc_id, sig, unnest(list_transform(generate_series(0, ${Bands - 1}),
       |    j -> j || ':' || array_to_string(sig[j*4+1:j*4+4], ','))) AS bk
       |  FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |       ROUND(len(list_filter(generate_series(1, $K),
       |             i -> sa.sig[i] = sb.sig[i])) * 1.0 / $K, 4) AS est_jaccard
       |FROM cand
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b
       |WHERE len(list_filter(generate_series(1, $K),
       |      i -> sa.sig[i] = sb.sig[i])) * 1.0 / $K >= 0.5""".stripMargin) { (s, dir) =>
    // signatures feed the band explode and both est-join sides — one
    // materialization instead of three recomputes
    val docs = signatures(Tables.documents(s, dir)).localCheckpoint()
    val bands = docs.select(col("doc_id"), col("sig"),
      explode(bandKeyArray(col("sig"), Bands, 4)).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val est = size(filter(zip_with(col("sa.sig"), col("sb.sig"), (x, y) => x === y),
      b => b)) * lit(1.0) / K
    cand
      .join(docs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(docs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(est >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(est, 4).as("est_jaccard"))
  }

  /** SimHash: 60-bit signature from distinct-token hash bit votes.
    * Pure expression (no shuffle); hamming-join composes downstream.
    */
  val dSimHash: QuerySpec = QuerySpec.sql(
    "d4_simhash",
    """WITH th AS (
      |  SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
      |    t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)) AS th
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(list_sum(list_transform(generate_series(0, 59),
      |         b -> CASE WHEN list_sum(list_transform(th,
      |                h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |              THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
      |FROM th""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.SimHash.simhash60(col("text")).as("simhash"))
  }

  /** Near-dup clustering: connected components over the MinHash candidate
    * pairs (est >= 0.5) via ConnectedComponents.labels — alternating
    * large-star/small-star rounds (O(log² n) over the LARGEST component,
    * not its diameter; min-label propagation was abandoned after the 10×
    * scale tier outran its round cap — see ConnectedComponents scaladoc).
    * Each doc converges to the smallest doc_id in its component, giving
    * keep-one-per-cluster dedup without any driver-side union-find.
    * Output: one row per doc that belongs to a multi-doc cluster. The
    * oracle computes the same components via a recursive-CTE transitive
    * closure over the identical candidate-pair set.
    */
  val dClusters: QuerySpec = QuerySpec.sql(
    "d5_dedup_clusters",
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Portable.shinglesSql(3).replace("\n", " ")} AS sh FROM documents
       |), hs AS (
       |  SELECT doc_id, list_transform(sh,
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs FROM sh
       |), sig AS (
       |  SELECT doc_id, list_transform(generate_series(1, $K),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % $P))) AS sig
       |  FROM hs
       |), bands AS (
       |  SELECT doc_id, sig, unnest(list_transform(generate_series(0, ${Bands - 1}),
       |    j -> j || ':' || array_to_string(sig[j*4+1:j*4+4], ','))) AS bk
       |  FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.doc_a
       |  JOIN sig sb ON sb.doc_id = cand.doc_b
       |  WHERE len(list_filter(generate_series(1, $K),
       |        i -> sa.sig[i] = sb.sig[i])) * 1.0 / $K >= 0.5
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS t FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |), reach(s, t) AS (
       |  SELECT s, t FROM edges
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
       |)
       |SELECT s AS doc_id, least(s, MIN(t)) AS cluster_id
       |FROM reach GROUP BY s""".stripMargin) { (s, dir) =>
    val pairs = Intermediates.of(dMinHash)(s, dir).select("doc_a", "doc_b")
    ConnectedComponents.labels(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("cluster_id", "doc_id")
  }

  /** SimHash near-dup pairs: hamming distance ≤ 6 over the 60-bit
    * signatures (the d4 signature put to its intended use).
    *
    * Candidate generation is pigeonhole banding: two signatures within
    * hamming 6 differ in at most 6 of 7 disjoint chunks, so at least
    * one chunk is bit-identical; candidates come from an equi-join on
    * (chunk_idx, chunk_value) and the exact hamming verify reproduces
    * the all-pairs result EXACTLY (lossless, unlike LSH), so the
    * oracle keeps the straightforward all-pairs formulation.
    *
    * Chunk widths are BALANCED (4×9 + 3×8 bits), not 6×9+6: the
    * round-4 10× profile measured the old 6-bit seventh chunk owning
    * the candidate count — 2⁶ buckets over 50k docs put ~6k sigs in
    * one bucket (~18M comparisons from a single key). Equalizing
    * widths caps every chunk's bucket space at ≥2⁸. (A two-level MIH
    * recursion was measured and REJECTED: simhash bits are correlated
    * — bucket mass is skew-dominated, not random-collision-dominated —
    * so sub-chunking barely splits hot buckets while similar pairs
    * re-join once per agreeing (chunk, sub-chunk), a measured 17×
    * regression at 10×.)
    */
  val dSimHashPairs: QuerySpec = QuerySpec.sql(
    "d6_simhash_pairs",
    """WITH th AS (
      |  SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
      |    t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)) AS th
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |         CAST(list_sum(list_transform(generate_series(0, 59),
      |           b -> CASE WHEN list_sum(list_transform(th,
      |                  h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |                THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
      |  FROM th
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""".stripMargin) { (s, dir) =>
    hammingPairs60(Intermediates.of(dSimHash)(s, dir), "simhash", 6)
  }

  /** Exact hamming-distance self-join over 60-bit signatures via
    * pigeonhole banding: a pair within distance `maxD` ≤ 6 agrees on at
    * least one of 7 disjoint chunks, so candidates come from an
    * equi-join on (chunk_idx, chunk_value) and the exact bit_count
    * verify reproduces the all-pairs result EXACTLY (lossless, unlike
    * LSH). `sigs` needs (doc_id, `sigCol`); returns
    * (doc_a, doc_b, hamming) with doc_a < doc_b, each pair once.
    * Shared by d6 (text simhash) and m9 (image perceptual hash).
    */
  private[graft] def hammingPairs60(sigs: org.apache.spark.sql.DataFrame,
      sigCol: String, maxD: Int): org.apache.spark.sql.DataFrame = {
    // balanced chunk layout over 60 bits: widths 9,9,9,9,8,8,8
    val offsets = Seq(0, 9, 18, 27, 36, 44, 52)
    val widths  = Seq(9, 9, 9, 9, 8, 8, 8)
    def chunkOf(v: Column, i: Int): Column =
      shiftright(v, offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    val chunkVals = array((0 until 7).map(i => chunkOf(col(sigCol), i)): _*)
    val chunks = sigs.select(col("doc_id"), col(sigCol),
      posexplode(chunkVals).as(Seq("ci", "cv")))
    // dedup WITHOUT a distinct: a near-identical pair matches on most of
    // its 7 chunks, so a distinct would shuffle every duplicate
    // candidate. Instead each pair is emitted exactly once, at its FIRST
    // equal chunk — the codegen'd filter `no earlier chunk equal` kills
    // duplicates as the join streams, no second exchange
    val x = col(s"a.$sigCol").bitwiseXOR(col(s"b.$sigCol"))
    val firstEqualChunk = (0 until 6).map(i =>
      when(col("a.ci") > i, chunkOf(x, i) =!= 0L).otherwise(lit(true)))
      .reduce(_ && _)
    val hamming = bit_count(x)
    // shuffled-hash, not sort-merge: equal-key groups here are large
    // (bit-correlated buckets run to thousands of rows) and SMJ streams
    // each group through its spillable row buffer, which dominated the
    // 10× runtime; a per-partition hash build keeps the group scan flat
    chunks.as("a").hint("shuffle_hash")
      .join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(hamming <= maxD && firstEqualChunk)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.cast("int").as("hamming"))
  }

  /** Containment dedup (c = |A∩B| / |A| ≥ 0.9): doc_a's shingles nearly
    * all appear in doc_b — catches truncated copies and
    * subset/superset boilerplate that symmetric Jaccard misses (a short
    * doc inside a long one has low Jaccard but containment ≈ 1).
    * Same shingle-hash equi-join as d2; the prune is one-sided
    * (i ≤ min(na, nb) and i ≥ 0.9·na force nb·10 ≥ na·9 — b may be
    * arbitrarily larger but not much smaller), sound for the 0.9
    * threshold. Emitted per direction: (contained, container).
    */
  val dContainment: QuerySpec = QuerySpec.sql(
    "d7_containment",
    s"""WITH sh0 AS (
       |  SELECT doc_id, unnest(${Portable.shinglesSql(3).replace("\n", " ")}) AS s
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS h FROM sh0
       |), cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a AS contained, doc_b AS container,
       |       CAST(i * 10000 // ca.n AS BIGINT) AS containment_bp
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = doc_a
       |WHERE i * 10 >= ca.n * 9""".stripMargin) { (s, dir) =>
    val sh = shingleHashRel(s, dir)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shn = sh.join(broadcast(cnt), "doc_id")
    val a = shn.as("a"); val b = shn.as("b")
    a.join(b, col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id") &&
        col("b.n") * 10 >= col("a.n") * 9) // sound one-sided prune
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"))
      .agg(count(lit(1)).as("i"))
      .filter(col("i") * 10 >= col("na") * 9)
      .select(col("doc_a").as("contained"), col("doc_b").as("container"),
        expr("i * 10000 div na").as("containment_bp"))
  }

  /** Quality-aware canonical selection: within each near-dup cluster
    * (d5's connected components) keep the HIGHEST-QUALITY member, not the
    * first — production dedup discards boilerplate copies in favor of the
    * cleanest one. Composes the cluster labels with the t2 quality score;
    * the argmax is one window pass partitioned by cluster_id (cluster
    * sizes are near-dup groups — small by construction, no skew risk).
    */
  val dKeepBest: QuerySpec = QuerySpec.sql(
    "d8_keep_best",
    s"""WITH labels AS (
       |${dClusters.oracle.get}
       |), q AS (
       |  SELECT doc_id,
       |         ${TextAnalysis.qualityBpSql(
                    "len(string_split(text, ' '))",
                    "len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))",
                    "n_chars")} AS quality_bp
       |  FROM documents
       |), r AS (
       |  SELECT l.cluster_id, l.doc_id, q.quality_bp,
       |         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |           ORDER BY q.quality_bp DESC, l.doc_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY l.cluster_id) AS n_members
       |  FROM labels l JOIN q USING (doc_id)
       |)
       |SELECT cluster_id, doc_id AS kept_doc, quality_bp AS kept_quality_bp,
       |       n_members
       |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
    val labels = Intermediates.of(dClusters)(s, dir)
    val docs = Tables.documents(s, dir)
    val quality = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("long"))
      .selectExpr("doc_id",
        TextAnalysis.qualityBpSpark("n_tokens", "n_stop", "n_chars") +
          " AS quality_bp")
    val w = Window.partitionBy("cluster_id")
    labels.join(quality, "doc_id")
      .withColumn("rn", row_number().over(
        w.orderBy(col("quality_bp").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("kept_doc"),
        col("quality_bp").as("kept_quality_bp"), col("n_members"))
  }

  /** Boilerplate n-gram coverage (the CCNet/RefinedWeb-style corpus-level
    * repetition signal, distinct from t5's within-document repetition):
    * a trigram is boilerplate when it occurs in >= 5 documents; each
    * document reports how much of its distinct-trigram set is boilerplate.
    * The gram relation reduces to 60-bit portable hashes before any
    * shuffle, so the doc-frequency aggregation and the coverage join move
    * fixed-width longs — never text. Materialized once (localCheckpoint)
    * for its two consumers, exactly like p7's decontamination grams.
    */
  val dBoilerplate: QuerySpec = QuerySpec.sql(
    "d9_boilerplate",
    s"""WITH g AS (
       |  SELECT doc_id, unnest(${Portable.shinglesSql(3).replace("\n", " ")}) AS g
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h FROM g
       |), df AS (
       |  SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM h GROUP BY 1
       |)
       |SELECT doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_grams,
       |       CAST(COUNT(*) FILTER (df >= 5) AS BIGINT) AS n_boiler,
       |       CAST(COUNT(*) FILTER (df >= 5) * 10000 // COUNT(*) AS BIGINT) AS boiler_bp
       |FROM h JOIN df USING (h)
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash.shingleHashes60(col("text"), 3)).as("h"))
      .localCheckpoint()
    val dfreq = grams.groupBy("h").agg(count(lit(1)).as("df"))
    grams.join(dfreq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 5, 1L).otherwise(0L)).as("n_boiler"))
      .selectExpr("doc_id", "n_grams", "n_boiler",
        "n_boiler * 10000L div n_grams AS boiler_bp")
  }

  /** Sketch-error audit: for every LSH candidate pair, the MinHash
    * signature-agreement estimate next to the EXACT shingle-set Jaccard
    * and their absolute gap — the accuracy report that justifies (or
    * indicts) the K=16 sketch before a corpus-wide dedup run trusts it.
    * Exact Jaccard is computed only on the LSH-bounded candidate set
    * (array intersect per pair), never all pairs; both joins key on
    * doc_id. Integer basis points throughout.
    */
  val dSketchError: QuerySpec = QuerySpec.sql(
    "d10_sketch_error",
    s"""WITH sh AS (
       |  SELECT doc_id, ${Portable.shinglesSql(3).replace("\n", " ")} AS sh FROM documents
       |), hs AS (
       |  SELECT doc_id, list_distinct(list_transform(sh,
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT))) AS hs FROM sh
       |), sig AS (
       |  SELECT doc_id, hs, list_transform(generate_series(1, $K),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % $P))) AS sig
       |  FROM hs
       |), bands AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(0, ${Bands - 1}),
       |    j -> j || ':' || array_to_string(sig[j*4+1:j*4+4], ','))) AS bk
       |  FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |       CAST(len(list_filter(generate_series(1, $K), i -> sa.sig[i] = sb.sig[i])) * 10000 // $K AS BIGINT) AS est_bp,
       |       CAST(len(list_intersect(sa.hs, sb.hs)) * 10000
       |            // (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS BIGINT) AS exact_bp,
       |       CAST(abs(len(list_filter(generate_series(1, $K), i -> sa.sig[i] = sb.sig[i])) * 10000 // $K
       |            - len(list_intersect(sa.hs, sb.hs)) * 10000
       |            // (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))) AS BIGINT) AS err_bp
       |FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b""".stripMargin) { (s, dir) =>
    val base = Tables.documents(s, dir)
      .select(col("doc_id"),
        // native shingle-hash pass (ShingleHash32 dedups shingle strings;
        // the outer distinct collapses hash-value collisions to match the
        // oracle's list_distinct-over-hashes semantics)
        array_distinct(graft.functions.ShingleHash.shingleHashes(col("text"), 3)).as("hs"),
        graft.functions.ShingleHash.minHashSig(col("text"), 3, K, P).as("sig"))
      .localCheckpoint()
    val bands = base.select(col("doc_id"),
      explode(bandKeyArray(col("sig"), Bands, 4)).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val agree = size(filter(zip_with(col("sa.sig"), col("sb.sig"), (x, y) => x === y),
      b => b)).cast("long")
    val inter = size(array_intersect(col("sa.hs"), col("sb.hs"))).cast("long")
    val union = size(col("sa.hs")) + size(col("sb.hs")) - inter
    cand
      .join(base.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(base.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        agree.as("agree"), inter.as("inter"), union.as("uni"))
      .selectExpr("doc_a", "doc_b",
        s"agree * 10000L div $K AS est_bp",
        "inter * 10000L div uni AS exact_bp",
        s"abs(agree * 10000L div $K - inter * 10000L div uni) AS err_bp")
  }

  /** Dedup-rate report by source: per source, document count, distinct
    * normalized-text count, and the duplicate share in basis points —
    * the per-provider summary a corpus intake pipeline publishes. One
    * aggregation on (source, md5) then one on source; both shuffle
    * bounded-width keys.
    */
  val dDupRateBySource: QuerySpec = QuerySpec.sql(
    "d11_dup_rate_by_source",
    """WITH d AS (
      |  SELECT source, md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp
      |  FROM documents
      |), g AS (
      |  SELECT source, fp, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1, 2
      |)
      |SELECT source,
      |       CAST(SUM(n) AS BIGINT) AS n_docs,
      |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |       CAST((SUM(n) - COUNT(*)) * 10000 // SUM(n) AS BIGINT) AS dup_bp
      |FROM g GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("source"),
        // explicit class == Portable.WsRegex (RE2 \s excludes U+000B)
        md5(regexp_replace(lower(col("text")),
          graft.functions.Portable.WsRegex, " ")).as("fp"))
      .groupBy("source", "fp")
      .agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(sum("n").as("n_docs"), count(lit(1)).as("n_distinct"))
      .selectExpr("source", "n_docs", "n_distinct",
        "(n_docs - n_distinct) * 10000L div n_docs AS dup_bp")
  }

  /** Cluster-quality audit: for every near-dup cluster (d5), its member
    * count, edge count, and the mean/min signature-agreement of its
    * edges — the cohesion report that tells a dedup run whether its
    * clusters are tight duplicates or chained false positives before it
    * deletes anything. est_bp = agreement×625 is exact in both engines
    * (agreement/16 is a dyadic rational, 4 decimal digits exact), so the
    * stats stay integer. Pair and label relations join on doc ids.
    */
  val dClusterQuality: QuerySpec = QuerySpec.sql(
    "d12_cluster_quality",
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Portable.shinglesSql(3).replace("\n", " ")} AS sh FROM documents
       |), hs AS (
       |  SELECT doc_id, list_transform(sh,
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs FROM sh
       |), sig AS (
       |  SELECT doc_id, list_transform(generate_series(1, $K),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % $P))) AS sig
       |  FROM hs
       |), bands AS (
       |  SELECT doc_id, sig, unnest(list_transform(generate_series(0, ${Bands - 1}),
       |    j -> j || ':' || array_to_string(sig[j*4+1:j*4+4], ','))) AS bk
       |  FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |), pe AS (
       |  SELECT doc_a, doc_b,
       |         CAST(len(list_filter(generate_series(1, $K),
       |              i -> sa.sig[i] = sb.sig[i])) * 625 AS BIGINT) AS est_bp
       |  FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.doc_a
       |  JOIN sig sb ON sb.doc_id = cand.doc_b
       |  WHERE len(list_filter(generate_series(1, $K),
       |        i -> sa.sig[i] = sb.sig[i])) * 1.0 / $K >= 0.5
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS t FROM pe
       |  UNION ALL SELECT doc_b, doc_a FROM pe
       |), reach(s, t) AS (
       |  SELECT s, t FROM edges
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
       |), clusters AS (
       |  SELECT s AS doc_id, least(s, MIN(t)) AS cluster_id FROM reach GROUP BY s
       |), memb AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
       |  FROM clusters GROUP BY 1
       |), pstats AS (
       |  SELECT c.cluster_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_edges,
       |         CAST(SUM(est_bp) AS BIGINT) AS sum_est,
       |         CAST(MIN(est_bp) AS BIGINT) AS min_est_bp
       |  FROM pe JOIN clusters c ON pe.doc_a = c.doc_id GROUP BY 1
       |)
       |SELECT m.cluster_id, m.n_members, p.n_edges,
       |       CAST(p.sum_est // p.n_edges AS BIGINT) AS avg_est_bp,
       |       p.min_est_bp
       |FROM memb m JOIN pstats p ON p.cluster_id = m.cluster_id""".stripMargin) { (s, dir) =>
    val labels = Intermediates.of(dClusters)(s, dir)
    val pairs = Intermediates.of(dMinHash)(s, dir)
      .select(col("doc_a"), col("doc_b"),
        (col("est_jaccard") * 10000).cast("long").as("est_bp"))
    val memb = labels.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    val pstats = pairs
      .join(labels.select(col("doc_id").as("doc_a"), col("cluster_id")), "doc_a")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_edges"), sum("est_bp").as("sum_est"),
        min("est_bp").as("min_est_bp"))
    memb.join(pstats, "cluster_id")
      .selectExpr("cluster_id", "n_members", "n_edges",
        "sum_est div n_edges AS avg_est_bp", "min_est_bp")
  }

  /** Triangle census of the near-dup candidate graph (d3's LSH pairs as
    * canonical a<b edges): triangle count, wedge count, and the global
    * clustering coefficient 3·Δ/wedges in basis points. True near-dup
    * clusters are transitive, so their candidate subgraphs are cliques
    * and gcc sits near 10000 — a falling gcc is the canary for LSH
    * banding that fabricates edges between unrelated docs (the graph
    * diagnostic production dedup watches next to d10's sketch error).
    *
    * Scale shape: triangles enumerate via two equi-joins on canonically
    * ordered edges (a<b<c — each triangle counted exactly once, never an
    * all-pairs product); degrees are one aggregation on the exploded
    * endpoint list. The edge relation is the memoized d3 result.
    */
  val dTriangles: QuerySpec = QuerySpec.sql(
    "d13_triangles",
    s"""WITH pairs AS (
       |${dMinHash.oracle.get}
       |), e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
       |tri AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b
       |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
       |), deg AS (
       |  SELECT v, COUNT(*) AS d
       |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
       |  GROUP BY 1
       |), wed AS (
       |  SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg
       |)
       |SELECT t.n_triangles, w.n_wedges,
       |       CAST(t.n_triangles * 3 * 10000 // w.n_wedges AS BIGINT) AS gcc_bp
       |FROM tri t, wed w""".stripMargin) { (s, dir) =>
    val e = Intermediates.of(dMinHash)(s, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("v"))
      .union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val wed = deg.agg(sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    tri.crossJoin(wed)
      .selectExpr("n_triangles", "n_wedges",
        // n_wedges = 0 (isolated pairs only) must yield NULL like the
        // oracle's `// 0`, not an ANSI DIVIDE_BY_ZERO abort
        """CASE WHEN n_wedges = 0 THEN CAST(NULL AS BIGINT)
          |     ELSE n_triangles * 3 * 10000 div n_wedges END AS gcc_bp""".stripMargin)
  }

  /** d16: corpus-overlap between SOURCES via set-level MinHash — each
    * source's sketch is the elementwise MIN of the permuted hashes of
    * its (distinct) shingle set, which is exactly why it scales: the
    * min is a mergeable aggregate, so per-partition partial sketches
    * combine map-side and a 100 TB source's sketch is still K numbers.
    * Signature agreement estimates Jaccard; the exact set Jaccard (in
    * integer basis points) rides along as the accuracy audit. The pair
    * fan-out crosses the |sources|-row SKETCH relation, never shingles.
    */
  val dSourceOverlap: QuerySpec = QuerySpec.sql(
    "d16_source_overlap", {
      val mins = (1 to K).map(i =>
        s"MIN((${2 * i + 1}*x + ${104729L * i}) % $P) AS m$i").mkString(", ")
      val agree = (1 to K).map(i =>
        s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sh0 AS (
         |  SELECT source, unnest(${Portable.shinglesSql(3).replace("\n", " ")}) AS s
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT source,
         |         CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS x
         |  FROM sh0
         |), sig AS (SELECT source, $mins FROM sh GROUP BY source),
         |sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
         |inter AS (
         |  SELECT u.source AS sa, v.source AS sb, COUNT(*) AS n_int
         |  FROM sh u JOIN sh v ON u.x = v.x AND u.source < v.source
         |  GROUP BY 1, 2
         |)
         |SELECT a.source AS sa, b.source AS sb,
         |       CAST($agree AS BIGINT) AS agree16,
         |       CAST(COALESCE(i.n_int, 0) AS BIGINT) AS n_int,
         |       CAST(COALESCE(i.n_int, 0) * 10000
         |            // (za.n + zb.n - COALESCE(i.n_int, 0)) AS BIGINT) AS exact_bp
         |FROM sig a JOIN sig b ON a.source < b.source
         |LEFT JOIN inter i ON i.sa = a.source AND i.sb = b.source
         |JOIN sz za ON za.source = a.source
         |JOIN sz zb ON zb.source = b.source""".stripMargin
    }) { (s, dir) =>
    val sh = Tables.documents(s, dir)
      .select(col("source"), explode(Portable.shingles(col("text"), 3)).as("sg"))
      .select(col("source"), Portable.h32(col("sg")).as("x"))
      .distinct()
      .localCheckpoint() // feeds sketch build, sizes, and the exact audit
    val minAggs = (1 to K).map(i =>
      min((lit(2L * i + 1) * col("x") + lit(104729L * i)) % lit(P)).as(s"m$i"))
    val sig = sh.groupBy("source").agg(minAggs.head, minAggs.tail: _*)
    val sz = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.as("u")
      .join(sh.as("v"), col("u.x") === col("v.x") && col("u.source") < col("v.source"))
      .groupBy(col("u.source").as("sa"), col("v.source").as("sb"))
      .agg(count(lit(1)).as("n_int"))
    val agree = (1 to K).map(i =>
      when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0)).reduce(_ + _)
    sig.as("a").join(sig.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"),
        agree.cast("long").as("agree16"))
      .join(inter, Seq("sa", "sb"), "left")
      .na.fill(0L, Seq("n_int"))
      .join(sz.select(col("source").as("sa"), col("n").as("na")), "sa")
      .join(sz.select(col("source").as("sb"), col("n").as("nb")), "sb")
      .selectExpr("sa", "sb", "agree16", "CAST(n_int AS BIGINT) AS n_int",
        "CAST(n_int * 10000 div (na + nb - n_int) AS BIGINT) AS exact_bp")
  }

  /** d17: Bloom-prefiltered incremental exact dedup — the runtime-filter
    * pattern made explicit with the custom BloomAgg
    * TypedImperativeAggregate: the index's text-hashes build one 64 Kbit
    * filter (OR-merged partials, one 1 KB-row broadcast); batch docs the
    * filter rejects are DEFINITELY novel and skip the join entirely;
    * only probe-positives (true dupes + the filter's few false
    * positives) reach the exact anti-join. The oracle is plain exact
    * semantics — the Bloom is a pure prefilter, so false positives are
    * scrubbed by the join and false negatives are impossible: the
    * result CANNOT diverge, only the plan gets cheaper. At 100 TB this
    * is the shape that turns an ingest-dedup join from corpus-sized to
    * dupe-sized.
    */
  val dBloomDedup: QuerySpec = QuerySpec.sql(
    "d17_bloom_dedup",
    """SELECT lang, COUNT(*) AS n_kept,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
      |FROM documents d
      |WHERE doc_id % 5 = 4 AND NOT EXISTS (
      |  SELECT 1 FROM documents i
      |  WHERE i.doc_id % 5 <> 4 AND md5(i.text) = md5(d.text))
      |GROUP BY lang""".stripMargin) { (s, dir) =>
    import graft.functions.BloomAgg
    val docs = Tables.documents(s, dir)
    val isBatch = col("doc_id") % 5 === 4
    // idx feeds the filter build AND the anti-join; probed feeds both
    // maybe-branches — materialize each once (q73's sk pattern)
    val idx = docs.filter(!isBatch).select(md5(col("text")).as("h"))
      .localCheckpoint()
    val bf = idx.agg(BloomAgg.bloom_build(col("h"), words = 1024).as("bf"))
    val probed = docs.filter(isBatch)
      .withColumn("h", md5(col("text")))
      .crossJoin(broadcast(bf))
      .withColumn("maybe", BloomAgg.bloom_probe(col("bf"), col("h"), words = 1024))
      .select("doc_id", "lang", "n_chars", "h", "maybe")
      .localCheckpoint()
    val confirmedNovel = probed.filter(col("maybe"))
      .join(idx.distinct(), Seq("h"), "left_anti")
    probed.filter(!col("maybe"))
      .unionByName(confirmedNovel)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
  }

  /** d18: INCREMENTAL cluster maintenance — when the new batch
    * (doc_id % 5 = 4) arrives, existing cluster labels are NOT
    * recomputed: the index-only components keep their labels; the
    * batch's candidate pairs are contracted onto those labels (each
    * endpoint replaced by its existing label, or itself if unlabeled)
    * and connected components runs on the CONTRACTED graph — whose size
    * is bounded by the labels the batch touches, not the corpus. A
    * batch doc bridging two old components merges them through their
    * label nodes. The oracle is d5's FULL transitive closure over all
    * pairs: incremental maintenance must be indistinguishable from the
    * full recompute — the same identity q70 proves for aggregates,
    * proven here for graph clustering.
    */
  val dIncrementalClusters: QuerySpec = QuerySpec.sql(
    "d18_incremental_clusters", dClusters.oracle.get) { (s, dir) =>
    val pairs = graft.Intermediates.of(dMinHash)(s, dir).select("doc_a", "doc_b")
    val isBatch = (c: org.apache.spark.sql.Column) => c % 5 === 4
    val oldPairs = pairs
      .filter(!isBatch(col("doc_a")) && !isBatch(col("doc_b")))
    val newPairs = pairs
      .filter(isBatch(col("doc_a")) || isBatch(col("doc_b")))
      .localCheckpoint() // feeds two contraction joins + the part2 scan
    // the "materialized" state a production pipeline would have on disk
    val oldLabels = ConnectedComponents.labels(oldPairs, "doc_a", "doc_b")
      .localCheckpoint()
    val contractedEdges = newPairs
      .join(oldLabels.select(col("id").as("doc_a"), col("label").as("la")),
        Seq("doc_a"), "left")
      .join(oldLabels.select(col("id").as("doc_b"), col("label").as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("c_a"),
        coalesce(col("lb"), col("doc_b")).as("c_b"))
    val merged = ConnectedComponents.labels(contractedEdges, "c_a", "c_b")
      .localCheckpoint() // bounded by touched labels, not corpus size
    // docs already labeled: relabel only if their component merged
    val part1 = oldLabels
      .join(merged.select(col("id").as("label"), col("label").as("mlabel")),
        Seq("label"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("mlabel"), col("label")).as("cluster_id"))
    // docs first seen in the new pairs (batch docs + previously
    // singleton index docs): their contracted node is themselves
    val fresh = newPairs.select(col("doc_a").as("doc_id"))
      .union(newPairs.select(col("doc_b").as("doc_id"))).distinct()
      .join(oldLabels.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
    val part2 = fresh
      .join(merged.select(col("id").as("doc_id"), col("label").as("cluster_id")),
        Seq("doc_id"))
    part1.unionByName(part2).orderBy("cluster_id", "doc_id")
  }

  /** Band keys of a (doc_id, sig) frame: Bands keys per doc, each a
    * short `j:v1,v2,v3,v4` string — the LSH bucket identity shared by
    * d3/d15 and the streaming ingest index.
    */
  /** Band-key array expression — one "j:v1,v2,.." string per band over a
    * signature column. THE single source of the band-key wire format:
    * d3's builder, the d14/d15 index rows, and d20's config sweep all
    * join on strings this expression produces, and each has an oracle
    * mirroring it as `j || ':' || array_to_string(sig[a:b], ',')` — a
    * format change here must change all of them together, which is the
    * point of having exactly one copy.
    */
  private[graft] def bandKeyArray(sig: Column, bands: Int, rpb: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => concat_ws(":", j.cast("string"),
        concat_ws(",", transform(slice(sig, j * rpb + 1, lit(rpb)),
          v => v.cast("string")))))

  private[graft] def bandKeys(sigs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sigs.select(col("doc_id"), explode(bandKeyArray(col("sig"), Bands, 4)).as("bk"))

  /** d20: the LSH band/row tradeoff MEASURED — for each banding of the
    * 16-permutation signature ((16 bands × 1 row), (8×2), (4×4, d3's
    * production config), (2×8)), the candidate-pair count, how many
    * candidates are true near-dups (signature agreement ≥ 0.5), and
    * precision/recall in basis points. The table that justifies d3's
    * parameters with numbers instead of folklore: wider bands cut
    * candidates (shuffle volume) at the cost of recall.
    *
    * Ground truth WITHOUT an all-pairs scan: agreement ≥ 0.5 means ≥ 8
    * of 16 positions match, so every true pair shares at least one
    * single-position band — the (16×1) candidate set provably contains
    * ALL true pairs, and truth = its agreement-filtered subset. Scope
    * capped at doc_id < 1000 (audit convention, like m5/m9): 1-row
    * bands bucket by a single minhash value, and a corpus-wide
    * boilerplate shingle would make those buckets quadratic — the
    * pathology this table exists to show, bounded.
    */
  val dLshTradeoff: QuerySpec = QuerySpec.sql(
    "d20_lsh_tradeoff",
    s"""WITH sh AS (
       |  SELECT doc_id, ${Portable.shinglesSql(3).replace("\n", " ")} AS sh
       |  FROM documents WHERE doc_id < 1000
       |), hs AS (
       |  SELECT doc_id, list_transform(sh,
       |    s -> CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)) AS hs FROM sh
       |), sig AS (
       |  SELECT doc_id, list_transform(generate_series(1, $K),
       |    i -> list_min(list_transform(hs, x -> ((2*i+1)*x + 104729*i) % $P))) AS sig
       |  FROM hs
       |), cfg AS (
       |  SELECT unnest([16, 8, 4, 2]) AS b
       |), bands AS (
       |  SELECT s.doc_id, c.b,
       |         unnest(list_transform(generate_series(0, c.b - 1),
       |           j -> j || ':' || array_to_string(
       |             s.sig[j * (16 // c.b) + 1 : j * (16 // c.b) + (16 // c.b)], ','))) AS bk
       |  FROM sig s CROSS JOIN cfg c
       |), cand AS (
       |  SELECT DISTINCT a.b, a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM bands a JOIN bands b2
       |    ON a.b = b2.b AND a.bk = b2.bk AND a.doc_id < b2.doc_id
       |), scored AS (
       |  SELECT c.b, c.doc_a, c.doc_b,
       |         len(list_filter(generate_series(1, $K),
       |           i -> sa.sig[i] = sb.sig[i])) >= 8 AS is_true
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b
       |), truth AS (
       |  SELECT COUNT(*) AS n_truth FROM scored WHERE b = 16 AND is_true
       |), agg AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |         CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true
       |  FROM scored GROUP BY b
       |)
       |SELECT b AS n_bands, CAST(16 // b AS BIGINT) AS rows_per_band,
       |       n_cand, n_true,
       |       CAST(n_true * 10000 // n_cand AS BIGINT) AS precision_bp,
       |       CAST(n_true * 10000 // (SELECT n_truth FROM truth) AS BIGINT) AS recall_bp
       |FROM agg""".stripMargin) { (s, dir) =>
    val sigs = signatures(
      Tables.documents(s, dir).filter(col("doc_id") < 1000))
      .localCheckpoint() // one build feeds all four configs + both join sides
    val bands = Seq(16, 8, 4, 2).map { b =>
      val r = 16 / b
      sigs.select(lit(b).as("b"), col("doc_id"),
        explode(bandKeyArray(col("sig"), b, r)).as("bk"))
    }.reduce(_ unionByName _)
    val cand = bands.as("a").hint("shuffle_hash")
      .join(bands.as("b2"),
        col("a.b") === col("b2.b") && col("a.bk") === col("b2.bk") &&
          col("a.doc_id") < col("b2.doc_id"))
      .select(col("a.b").as("b"), col("a.doc_id").as("doc_a"),
        col("b2.doc_id").as("doc_b"))
      .distinct()
    val agree = size(filter(zip_with(col("sa.sig"), col("sb.sig"),
      (x, y) => x === y), v => v))
    val scored = cand
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("b"), (agree >= 8).as("is_true"))
      .localCheckpoint() // feeds the per-config rollup and the truth scalar
    val truth = scored.filter(col("b") === 16 && col("is_true"))
      .agg(count(lit(1)).as("n_truth"))
    scored.groupBy("b")
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true"))
      .crossJoin(broadcast(truth))
      .selectExpr("b AS n_bands", "CAST(16 div b AS BIGINT) AS rows_per_band",
        "n_cand", "n_true",
        // n_cand >= 1 by construction (the group exists), but n_truth
        // can be 0 — NULL like the oracle's `// 0`, not an ANSI abort
        "n_true * 10000L div n_cand AS precision_bp",
        """CASE WHEN n_truth = 0 THEN CAST(NULL AS BIGINT)
          |     ELSE n_true * 10000L div n_truth END AS recall_bp""".stripMargin)
  }

  /** Streaming-ingest dedup core (the foreachBatch body of
    * `Streams.dedupSink`, callable directly on a static batch): dedupe
    * the batch within itself (exact text hash, keep the lowest doc_id),
    * drop batch docs whose text hash or MinHash band (signature
    * agreement >= 0.5, d3's estimator) collides with the
    * ALREADY-COMMITTED corpus, then transactionally append the
    * survivors to `table` and their fingerprint + band rows to the
    * `<table>/_index` sidecar snapshot table — both commits carry the
    * batch token, so a replayed micro-batch (crash before the engine
    * committed offsets, or between the two commits) re-commits exactly
    * once per table and converges.
    *
    * Scale shape: the corpus is probed ONLY through the narrow index —
    * band rows are (bk, doc_id) and each doc carries ONE fp row with
    * its signature — so the wide main table is never rescanned and
    * per-batch cost is (batch size) × (index join on short keys), the
    * d15 growth shape made continuous. At 100 TB the index would
    * additionally be bucketed by bk so each micro-batch touches only
    * its colliding buckets; the join below is already the bucket-join
    * shape that layout accelerates.
    */
  def ingestBatch(table: String, batch: org.apache.spark.sql.DataFrame,
      token: String): Unit = {
    val spark = batch.sparkSession
    val snaps = graft.sources.Snapshots
    val index = s"$table/_index"
    // within-batch exact dedup: doc_id is the contract's primary key,
    // so the lowest doc_id deterministically represents each text
    val b0 = batch.withColumn("__fp", md5(col("text")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__fp").orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    val (survivors, sigsPre) =
      if (snaps.versions(spark, index).isEmpty) (b0.localCheckpoint(), None)
      else {
        val idx = snaps.read(spark, index)
        val fpRows = idx.filter(col("sig").isNotNull)
        val afterExact = b0.join(fpRows.select(col("bk")),
          concat(lit("fp:"), col("__fp")) === col("bk"), "left_anti")
          .localCheckpoint() // one materialization feeds sig build + result
        val sigs = signatures(afterExact.select(col("doc_id"), col("text")))
          .localCheckpoint()
        val cand = bandKeys(sigs)
          .join(idx.filter(col("sig").isNull)
            .select(col("bk"), col("doc_id").as("iid")), "bk")
          .select(col("doc_id"), col("iid")).distinct()
        val agree = size(filter(zip_with(col("sig"), col("isig"),
          (x, y) => x === y), b => b)) * lit(1.0) / K
        val nearHit = cand
          .join(sigs, "doc_id")
          .join(fpRows.select(col("doc_id").as("iid"), col("sig").as("isig")), "iid")
          .filter(agree >= 0.5)
          .select(col("doc_id")).distinct()
        (afterExact.join(nearHit, Seq("doc_id"), "left_anti").localCheckpoint(),
          Some(sigs))
      }
    snaps.commit(survivors.drop("__fp"), table, token = Some(s"$token-data"))
    // survivors ⊆ afterExact, whose signatures were already computed and
    // checkpointed above — reuse them (a join) instead of re-running the
    // md5-per-shingle MinHash pass over every surviving doc
    val oSigs = sigsPre match {
      case Some(sigs) => sigs.join(survivors.select("doc_id"), "doc_id")
      case None => signatures(survivors.select(col("doc_id"), col("text")))
    }
    val fpNew = survivors
      .select(col("doc_id"), concat(lit("fp:"), col("__fp")).as("bk"))
      .join(oSigs, "doc_id")
      .select(col("bk"), col("doc_id"), col("sig"))
    val bandNew = bandKeys(oSigs)
      .select(col("bk"), col("doc_id"), lit(null).cast("array<bigint>").as("sig"))
    snaps.commit(fpNew.unionByName(bandNew), index, token = Some(s"$token-idx"))
  }

  /** d19: substring-level dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better") — the dedup family
    * that catches documents sharing long VERBATIM character runs
    * (boilerplate headers, quoted passages, templated pages) that
    * document-level MinHash misses when the rest of the text differs.
    * Fingerprints are 40-char windows at content-defined anchor
    * positions (see [[graft.functions.SubstringFp]] — offset-invariant
    * by construction, ~1 anchor per 32 chars); a window hash appearing
    * in >= 2 distinct documents marks both as sharing a run. Output:
    * per affected document, its fingerprint count, how many of those
    * fingerprints are cross-document, and that share in basis points.
    *
    * Scale posture: the fingerprint build is an embarrassingly parallel
    * per-row projection (no shuffle); the exploded relation is
    * ~len/32 rows per doc and shuffles ONCE on the 60-bit fingerprint
    * (window count-over-partition), then once more on doc_id for the
    * per-doc rollup — 2 exchanges total, both on narrow integer keys.
    * Positions are code-unit arithmetic; the corpus is ASCII so both
    * engines agree (a multibyte corpus would pin code-point semantics
    * on the expression side instead).
    * Ref intent: the dedup pipeline family (COVERAGE d-family).
    */
  val dSubstring: QuerySpec = QuerySpec.sql(
    "d19_substring_dedup",
    """WITH pos AS (
      |  SELECT doc_id, text, unnest(generate_series(1, len(text) - 39)) AS p
      |  FROM documents
      |), fps AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(('0x' || substring(md5(substring(text, CAST(p AS INT), 40)), 1, 15)) AS BIGINT) AS f
      |  FROM pos
      |  WHERE CAST(('0x' || substring(md5(substring(text, CAST(p AS INT), 8)), 1, 8)) AS BIGINT) % 32 = 0
      |), marked AS (
      |  SELECT doc_id, COUNT(*) OVER (PARTITION BY f) AS nd FROM fps
      |)
      |SELECT doc_id, COUNT(*) AS n_fp,
      |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS share_bp
      |FROM marked GROUP BY doc_id
      |HAVING SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) > 0""".stripMargin) { (s, dir) =>
    val fps = Tables.documents(s, dir).select(col("doc_id"),
      explode(graft.functions.SubstringFp.fingerprints(col("text"))).as("f"))
    fps.withColumn("nd", count(lit(1)).over(Window.partitionBy("f")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .filter(col("n_shared") > 0)
      .selectExpr("doc_id", "n_fp", "n_shared",
        "n_shared * 10000L div n_fp AS share_bp")
  }

  val all: Seq[QuerySpec] =
    // dExact/dSimHashPairs/dSubstring memoized: p16_dedup_attribution
    // consumes all three through Intermediates.of — un-memoized, each
    // heavy pipeline (d19 is a scale-tier query) ran twice per session
    Seq(dExact.memo, dJaccard, dMinHash.memo, dSimHash.memo, dClusters.memo,
      dSimHashPairs.memo,
      dContainment, dKeepBest, dBoilerplate, dSketchError, dDupRateBySource,
      dClusterQuality, dTriangles, dSourceOverlap, dBloomDedup,
      dIncrementalClusters, dSubstring.memo, dLshTradeoff)
}
