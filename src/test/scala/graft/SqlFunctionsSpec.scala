package graft

import graft.functions.{ShingleHash, SimHash, ZOrder}
import org.apache.spark.sql.functions._

/** The SQL-registered native functions must be the same operators the
  * DataFrame layer uses — each is checked against its column-API twin
  * (or a closed-form reference) through spark.sql text.
  */
class SqlFunctionsSpec extends SparkTestBase {

  test("graft_vec_dot / graft_zorder2 match references from SQL text") {
    val r = spark.sql(
      "SELECT graft_vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d, " +
        "graft_zorder2(3, 5) AS z").head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getLong(1) === ZOrder.zorderRef(3, 5))
  }

  test("graft_simhash60 / shingle / minhash equal the column API on real docs") {
    Tables.documents(spark, sf0001).limit(50).createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash60(text) AS sh,
        |       graft_shingle_hashes(text) AS sg,
        |       graft_minhash_sig(text) AS mh
        |FROM docs_sqlfn""".stripMargin)
    val viaCols = Tables.documents(spark, sf0001).limit(50)
      .select(col("doc_id"), SimHash.simhash60(col("text")).as("sh"),
        ShingleHash.shingleHashes(col("text")).as("sg"),
        ShingleHash.minHashSig(col("text")).as("mh"))
    assert(viaSql.exceptAll(viaCols).count() === 0)
    assert(viaCols.exceptAll(viaSql).count() === 0)
  }

  test("graft_from_avro_safe quarantines corrupt bytes from pure SQL") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"long"},{"name":"b","type":"string"}]}"""
        .stripMargin.replace("\n", "")
    val out = spark.sql(
      s"""SELECT graft_from_avro_safe(
         |  CASE WHEN id = 2 THEN X'FFFFFFFFFFFFFFFFFFFF'
         |       ELSE graft_to_avro(named_struct('a', id, 'b', concat('v', id)), '$schema')
         |  END, '$schema') AS r
         |FROM range(4)""".stripMargin)
      .select("r.data.a", "r.data.b", "r._error").collect()
    val byA = out.map(r => (Option(r.get(0)), Option(r.getString(2)).isDefined))
    assert(byA.count(_._2) === 1) // exactly the poisoned row quarantined
    assert(out.count(r => !r.isNullAt(0)) === 3)
  }

  test("graft_shingle_hashes60 / graft_substring_fps equal the column API on real docs") {
    import graft.functions.SubstringFp
    Tables.documents(spark, sf0001).limit(50).createOrReplaceTempView("docs_sqlfn60")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_shingle_hashes60(text) AS sg60,
        |       graft_shingle_hashes60(text, 4) AS sg60n4,
        |       graft_substring_fps(text) AS fps,
        |       graft_substring_fps(text, 8, 40, 16) AS fps16
        |FROM docs_sqlfn60""".stripMargin)
    val viaCols = Tables.documents(spark, sf0001).limit(50)
      .select(col("doc_id"),
        ShingleHash.shingleHashes60(col("text")).as("sg60"),
        ShingleHash.shingleHashes60(col("text"), 4).as("sg60n4"),
        SubstringFp.fingerprints(col("text")).as("fps"),
        SubstringFp.fingerprints(col("text"), mod = 16).as("fps16"))
    assert(viaSql.exceptAll(viaCols).count() === 0)
    assert(viaCols.exceptAll(viaSql).count() === 0)
  }

  test("graft_bloom_build aggregates and graft_bloom_probe probes from pure SQL") {
    import graft.functions.BloomAgg
    // build over half the keys, probe all: every built key must hit
    // (no false negatives — the defining Bloom property), and the SQL
    // build must be bit-identical to the column-API build
    val sqlRow = spark.sql(
      """WITH ks AS (SELECT concat('k', id) AS k FROM range(100) WHERE id % 2 = 0),
        |bf AS (SELECT graft_bloom_build(k, 64, 3, 'sqltest') AS f FROM ks)
        |SELECT f,
        |  (SELECT count(*) FROM range(100)
        |   WHERE graft_bloom_probe((SELECT f FROM bf), concat('k', id), 64, 3, 'sqltest')
        |     AND id % 2 = 0) AS built_hits
        |FROM bf""".stripMargin).head()
    val viaCols = spark.range(100).where(col("id") % 2 === 0)
      .select(concat(lit("k"), col("id")).as("k"))
      .agg(BloomAgg.bloom_build(col("k"), words = 64, hashes = 3,
        salt = "sqltest").as("f")).head().getSeq[Long](0)
    assert(sqlRow.getSeq[Long](0) === viaCols)
    assert(sqlRow.getLong(1) === 50) // all 50 built keys probe true
  }

  test("graft_topk_words heavy-hitters from pure SQL (exact under capacity)") {
    spark.sql(
      """SELECT explode(split('a a a b b c', ' ')) AS w""")
      .createOrReplaceTempView("topk_sqlfn")
    val top = spark.sql(
      "SELECT graft_topk_words(w) AS top FROM topk_sqlfn")
      .select(explode(col("top")).as("e")).select("e._1", "e._2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("graft_to_avro -> graft_from_avro round-trips in pure SQL") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"long"},{"name":"b","type":"string"}]}"""
        .stripMargin.replace("\n", "")
    val out = spark.sql(
      s"""SELECT graft_from_avro(
         |  graft_to_avro(named_struct('a', id, 'b', concat('v', id)), '$schema'),
         |  '$schema') AS r
         |FROM range(5)""".stripMargin)
      .select("r.a", "r.b").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      (0L to 4L).map(i => (i, s"v$i")))
  }
}
