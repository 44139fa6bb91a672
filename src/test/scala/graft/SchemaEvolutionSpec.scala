package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Metadata-only ALTER TABLE ADD COLUMNS on the snapshot format: the
  * declared-schema override, typed-NULL reads of pre-ALTER files on
  * both read paths, post-ALTER inserts, the refusal set, override
  * retirement on overwrite, and carry-through fork.
  */
class SchemaEvolutionSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val wh: String = {
    val w = java.nio.file.Files.createTempDirectory("evowh").toString
    spark.conf.set("spark.sql.catalog.evo_cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo_cat.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo_cat.ns")
    w
  }

  test("ADD COLUMNS: old files read as typed NULLs, new inserts carry values, both read paths agree") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.e AS SELECT * FROM VALUES (1L), (2L) AS v(id)")
    spark.sql("ALTER TABLE evo_cat.ns.e ADD COLUMNS (score BIGINT, note STRING)")
    // pre-ALTER rows surface the new columns as NULLs
    val pre = spark.sql("SELECT * FROM evo_cat.ns.e ORDER BY id").collect()
    assert(pre.map(_.isNullAt(1)).forall(identity) &&
      pre.map(_.isNullAt(2)).forall(identity))
    // post-ALTER insert with the full shape
    spark.sql("INSERT INTO evo_cat.ns.e VALUES (3L, 30L, 'x')")
    val got = spark.sql(
      """SELECT count(*) AS n, count(score) AS n_score,
        |       sum(coalesce(score, 0)) AS s FROM evo_cat.ns.e""".stripMargin)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((3L, 1L, 30L)))
    // the V1 read path projects onto the same declared schema
    val v1 = Snapshots.read(spark, s"$wh/ns/e")
    assert(v1.columns.toSeq === Seq("id", "score", "note"))
    assert(v1.filter(col("score").isNotNull).count() === 1)
    // time travel reads under the declared schema too (documented rule:
    // the override governs ALL reads of the table, like Delta's
    // column-mapping-free evolution)
    assert(spark.sql("SELECT * FROM evo_cat.ns.e VERSION AS OF 1").columns.length === 3)
  }

  test("refusals: rename/drop/type-change, nested adds, duplicate adds") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.r AS SELECT * FROM VALUES (1L) AS v(id)")
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r RENAME COLUMN id TO id2"))
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r DROP COLUMN id"))
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r ALTER COLUMN id TYPE INT"))
    spark.sql("ALTER TABLE evo_cat.ns.r ADD COLUMNS (x BIGINT)")
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r ADD COLUMNS (x BIGINT)"))
    assert(dup.getMessage.toLowerCase.contains("exist"), dup.getMessage)
  }

  test("INSERT OVERWRITE retires the override; fork carries it") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.o AS SELECT * FROM VALUES (1L) AS v(id)")
    spark.sql("ALTER TABLE evo_cat.ns.o ADD COLUMNS (y BIGINT)")
    assert(Snapshots.declaredSchema(spark, s"$wh/ns/o").isDefined)
    // a fork inherits the declared shape
    Snapshots.fork(spark, s"$wh/ns/o", s"$wh/ns/o_b")
    assert(Snapshots.read(spark, s"$wh/ns/o_b").columns.toSeq === Seq("id", "y"))
    Snapshots.drop(spark, s"$wh/ns/o_b")
    // a shape-changing replacement re-bases the table; the override
    // must not ghost 'y' onto the replacement files. RTAS is the SQL
    // route for a new shape (INSERT OVERWRITE stays by-position
    // validated, stock Spark semantics)...
    spark.sql("REPLACE TABLE evo_cat.ns.o AS SELECT * FROM VALUES (7L, 'z') AS v(id, tag)")
    assert(Snapshots.declaredSchema(spark, s"$wh/ns/o").isEmpty)
    assert(spark.sql("SELECT * FROM evo_cat.ns.o").columns.toSeq === Seq("id", "tag"))
    // ...and the programmatic overwrite commit retires it the same way
    spark.sql("ALTER TABLE evo_cat.ns.o ADD COLUMNS (z BIGINT)")
    assert(Snapshots.declaredSchema(spark, s"$wh/ns/o").isDefined)
    Snapshots.commit(Seq((1L, 2L)).toDF("a", "b"), s"$wh/ns/o", overwrite = true)
    assert(Snapshots.declaredSchema(spark, s"$wh/ns/o").isEmpty)
    assert(Snapshots.read(spark, s"$wh/ns/o").columns.toSeq === Seq("a", "b"))
  }

  test("TYPE WIDENING: int32 files upcast at scan, post-widen inserts exceed int range, both read paths agree") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.w (id BIGINT, v INT)")
    spark.sql("INSERT INTO evo_cat.ns.w VALUES (1L, 10), (2L, 20)")
    val pre = Snapshots.dataFiles(spark, s"$wh/ns/w").toSet
    spark.sql("ALTER TABLE evo_cat.ns.w ALTER COLUMN v TYPE BIGINT")
    // metadata-only: no file rewritten
    assert(Snapshots.dataFiles(spark, s"$wh/ns/w").toSet === pre)
    // the committed INT32 files now read as BIGINT
    assert(spark.sql("SELECT * FROM evo_cat.ns.w").schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    spark.sql("INSERT INTO evo_cat.ns.w VALUES (3L, 3000000000)")
    val got = spark.sql(
      "SELECT sum(v) AS s, max(v) AS m FROM evo_cat.ns.w").collect().head
    assert((got.getLong(0), got.getLong(1)) === ((3000000030L, 3000000000L)))
    // V1 read path projects onto the same widened shape
    val v1 = Snapshots.read(spark, s"$wh/ns/w")
    assert(v1.schema("v").dataType === org.apache.spark.sql.types.LongType)
    assert(v1.agg(sum("v")).head.getLong(0) === 3000000030L)
    // COW DML across the mixed physical layouts
    spark.sql("UPDATE evo_cat.ns.w SET v = v + 1 WHERE id = 1")
    assert(spark.sql("SELECT v FROM evo_cat.ns.w WHERE id = 1")
      .head.getLong(0) === 11L)
  }

  test("widening refusals: narrowing, non-numeric, bucket column; decimal precision growth allowed") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.wr (id BIGINT, f FLOAT, d DECIMAL(10,2), s STRING)")
    spark.sql("INSERT INTO evo_cat.ns.wr VALUES (1L, CAST(1.5 AS FLOAT), CAST(12.34 AS DECIMAL(10,2)), 'x')")
    // a scale-growing change Spark's canUpCast ADMITS ((10,2)→(18,4)
    // is "wider") but footer-projection cannot serve (scale growth
    // rescales the stored unscaled value) hits OUR guard
    val sc = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.wr ALTER COLUMN d TYPE DECIMAL(18,4)"))
    assert(sc.getMessage.contains("lossless"), sc.getMessage)
    // lossless widenings pass
    spark.sql("ALTER TABLE evo_cat.ns.wr ALTER COLUMN f TYPE DOUBLE")
    spark.sql("ALTER TABLE evo_cat.ns.wr ALTER COLUMN d TYPE DECIMAL(18,2)")
    val r = spark.sql("SELECT f, d FROM evo_cat.ns.wr").collect().head
    assert(r.getDouble(0) === 1.5)
    assert(r.getDecimal(1).toPlainString === "12.34")
    // outright narrowings/kind changes are rejected by Spark's analyzer
    // before the catalog (NOT_SUPPORTED_CHANGE_COLUMN)
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.wr ALTER COLUMN id TYPE INT"))
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.wr ALTER COLUMN s TYPE BIGINT"))
    // the bucket column's hash is type-sensitive: any type change on
    // it would split keys across buckets — refused even for a change
    // Spark's canUpCast admits (BIGINT → DECIMAL(20,0)); the non-bucket
    // column of the same table still widens
    spark.sql("CREATE TABLE evo_cat.ns.wb (k BIGINT, v INT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO evo_cat.ns.wb VALUES (1L, 10), (2L, 20)")
    val bk = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.wb ALTER COLUMN k TYPE DECIMAL(20,0)"))
    assert(bk.getMessage.contains("bucket column"), bk.getMessage)
    spark.sql("ALTER TABLE evo_cat.ns.wb ALTER COLUMN v TYPE BIGINT")
    assert(spark.sql("SELECT sum(v) AS s FROM evo_cat.ns.wb")
      .head.getLong(0) === 30L)
  }

  test("COW DML preserves evolved reads (update a table with a NULL-backed column)") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.d AS SELECT * FROM VALUES (1L), (2L), (3L) AS v(id)")
    spark.sql("ALTER TABLE evo_cat.ns.d ADD COLUMNS (score BIGINT)")
    spark.sql("INSERT INTO evo_cat.ns.d VALUES (4L, 40L)")
    // row-level UPDATE rewrites only matched files; the rewritten rows
    // materialize the declared shape, untouched old files stay NULL-backed
    spark.sql("UPDATE evo_cat.ns.d SET score = 99 WHERE id = 1")
    val rows = spark.sql("SELECT id, score FROM evo_cat.ns.d ORDER BY id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq === Seq((1L, 99L), (2L, -1L), (3L, -1L), (4L, 40L)))
  }
}
