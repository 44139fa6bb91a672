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

  test("refusals: type-change, duplicate adds, rename/drop guard rails") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.r AS SELECT * FROM VALUES (1L) AS v(id)")
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r ALTER COLUMN id TYPE INT"))
    spark.sql("ALTER TABLE evo_cat.ns.r ADD COLUMNS (x BIGINT)")
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r ADD COLUMNS (x BIGINT)"))
    assert(dup.getMessage.toLowerCase.contains("exist"), dup.getMessage)
    // rename to an existing name refuses
    val clash = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r RENAME COLUMN id TO x"))
    assert(clash.getMessage.toLowerCase.contains("exist"), clash.getMessage)
    // reserved internal prefixes refuse
    intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r RENAME COLUMN id TO __gr_file"))
    // dropping the only DATA column of a 1-column table refuses
    spark.sql("CREATE TABLE evo_cat.ns.r1 AS SELECT * FROM VALUES (1L) AS v(id)")
    val only = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.r1 DROP COLUMN id"))
    assert(only.getMessage.contains("only column"), only.getMessage)
    // a LEGACY table (no field-id state — predates the assignment)
    // refuses renames/drops, naming the adoption remedy
    spark.sql("CREATE TABLE evo_cat.ns.rl AS SELECT * FROM VALUES (1L, 2L) AS v(id, v)")
    graft.sources.FieldIds.deleteState(spark, s"$wh/ns/rl")
    val legacy = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.rl RENAME COLUMN v TO w"))
    assert(legacy.getMessage.contains("per-field id"), legacy.getMessage)
    // the bucket column refuses rename/drop (the layout routes by it)
    spark.sql("CREATE TABLE evo_cat.ns.rb (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO evo_cat.ns.rb VALUES (1L, 10L)")
    val bkt = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.rb RENAME COLUMN k TO kk"))
    assert(bkt.getMessage.contains("bucket column"), bkt.getMessage)
    // outstanding equality deletes refuse (their keys match by NAME)
    spark.sql("CREATE TABLE evo_cat.ns.re AS SELECT * FROM VALUES (1L, 10L) AS v(id, v)")
    Snapshots.upsertEq(spark, s"$wh/ns/re", Seq((1L, 11L)).toDF("id", "v"), Seq("id"))
    val eq = intercept[Exception](
      spark.sql("ALTER TABLE evo_cat.ns.re RENAME COLUMN v TO w"))
    assert(eq.getMessage.contains("purge_eq_deletes"), eq.getMessage)
  }

  test("RENAME COLUMN: metadata-only, old footers resolve by field id, inserts + filters + both read paths agree") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.m AS SELECT * FROM VALUES " +
      "(1L, 10L, 'a'), (2L, 20L, 'b') AS v(id, v, tag)")
    val pre = Snapshots.dataFiles(spark, s"$wh/ns/m").toSet
    spark.sql("ALTER TABLE evo_cat.ns.m RENAME COLUMN v TO amount")
    // metadata-only: no file rewritten
    assert(Snapshots.dataFiles(spark, s"$wh/ns/m").toSet === pre)
    // pre-rename files serve their values under the NEW name
    assert(spark.sql("SELECT id, amount FROM evo_cat.ns.m ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 10L), (2L, 20L)))
    // post-rename insert under the new shape; filter on the renamed
    // column spans both epochs' files
    spark.sql("INSERT INTO evo_cat.ns.m VALUES (3L, 30L, 'c')")
    assert(spark.sql("SELECT sum(amount) AS s FROM evo_cat.ns.m WHERE amount >= 20")
      .head.getLong(0) === 50L)
    // V1 read path agrees
    val v1 = Snapshots.read(spark, s"$wh/ns/m")
    assert(v1.columns.toSeq === Seq("id", "amount", "tag"))
    assert(v1.agg(sum("amount")).head.getLong(0) === 60L)
    // time travel reads under the CURRENT names (the override governs
    // all reads, same documented rule as ADD COLUMNS)
    assert(spark.sql("SELECT amount FROM evo_cat.ns.m VERSION AS OF 1 ORDER BY amount")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 20L))
    // rename CHAIN: a second rename over the same identity still
    // resolves the original footers
    spark.sql("ALTER TABLE evo_cat.ns.m RENAME COLUMN amount TO price")
    assert(spark.sql("SELECT sum(price) AS s FROM evo_cat.ns.m").head.getLong(0) === 60L)
  }

  test("RENAME COLUMN: COW and MOR DML across mixed-epoch files") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.md AS SELECT * FROM VALUES " +
      "(1L, 10L), (2L, 20L), (3L, 30L) AS v(id, v)")
    spark.sql("ALTER TABLE evo_cat.ns.md RENAME COLUMN v TO qty")
    // COW UPDATE targets the renamed column on pre-rename files
    spark.sql("UPDATE evo_cat.ns.md SET qty = qty + 1 WHERE id = 2")
    assert(spark.sql("SELECT qty FROM evo_cat.ns.md ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 21L, 30L))
    // MOR delete through a position sidecar, read back across epochs
    // (merge mode too: the later MERGE must run as a position delta —
    // COW DML refuses under outstanding sidecars by design)
    spark.sql("ALTER TABLE evo_cat.ns.md SET TBLPROPERTIES " +
      "('write.delete.mode' = 'merge-on-read', " +
      " 'write.merge.mode' = 'merge-on-read')")
    spark.sql("DELETE FROM evo_cat.ns.md WHERE qty = 10")
    assert(Snapshots.deleteFiles(spark, s"$wh/ns/md").nonEmpty)
    assert(spark.sql("SELECT id FROM evo_cat.ns.md ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // MERGE with the new name; change feed across the whole epoch chain
    // speaks the current names
    spark.sql("MERGE INTO evo_cat.ns.md t USING (SELECT 9L AS id, 90L AS qty) s " +
      "ON t.id = s.id WHEN NOT MATCHED THEN INSERT *")
    val feed = Snapshots.changeFeed(spark, s"$wh/ns/md", 1,
      Snapshots.versions(spark, s"$wh/ns/md").last)
    assert(feed.columns.contains("qty") && !feed.columns.contains("v"))
    val ins = feed.filter(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ins.contains(9L))
  }

  test("DROP COLUMN is metadata-only; a re-added name gets a fresh id and never resurrects old bytes") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.dr AS SELECT * FROM VALUES " +
      "(1L, 'classified', 10L), (2L, 'secret', 20L) AS v(id, note, v)")
    val pre = Snapshots.dataFiles(spark, s"$wh/ns/dr").toSet
    spark.sql("ALTER TABLE evo_cat.ns.dr DROP COLUMN note")
    assert(Snapshots.dataFiles(spark, s"$wh/ns/dr").toSet === pre)
    assert(spark.sql("SELECT * FROM evo_cat.ns.dr").columns.toSeq === Seq("id", "v"))
    // re-add the NAME: a fresh field id — the dropped column's bytes in
    // the old files must NOT resurrect under it
    spark.sql("ALTER TABLE evo_cat.ns.dr ADD COLUMNS (note STRING)")
    val back = spark.sql("SELECT note FROM evo_cat.ns.dr").collect()
    assert(back.forall(_.isNullAt(0)),
      s"dropped column resurrected: ${back.mkString(",")}")
    // and the re-added column takes values going forward
    spark.sql("INSERT INTO evo_cat.ns.dr VALUES (3L, 30L, 'fresh')")
    assert(spark.sql("SELECT note FROM evo_cat.ns.dr WHERE id = 3")
      .head.getString(0) === "fresh")
  }

  test("fast-forward refuses a branch whose rename diverged the field-id mapping") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.ff AS SELECT * FROM VALUES (1L, 10L) AS v(id, v)")
    Snapshots.fork(spark, s"$wh/ns/ff", s"$wh/ns/ff_b")
    // the branch renames v -> v_b while the parent keeps v: the carried
    // schema would claim id 2 under two names — refuse loudly
    spark.conf.set("spark.sql.catalog.evo_cat.warehouse", wh) // unchanged; keep ctx
    val cat = new graft.sources.v2.SnapshotCatalog
    // rename on the branch through the engine API (catalog points at the
    // parent namespace; drive the branch rename via a second catalog load)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS evo_cat.ns") // no-op anchor
    // branch rename via direct state + declare (what a branch-side
    // catalog would do)
    graft.sources.FieldIds.mutate(spark, s"$wh/ns/ff_b", opt =>
      graft.sources.FieldIds.rename(opt.get, "v", "v_b"))
    val sch = Snapshots.read(spark, s"$wh/ns/ff_b").schema
    val renamed = org.apache.spark.sql.types.StructType(sch.fields.map(f =>
      if (f.name == "v") f.copy(name = "v_b") else f))
    Snapshots.declareSchema(spark, s"$wh/ns/ff_b",
      graft.sources.FieldIds.attach(
        graft.sources.FieldIds.load(spark, s"$wh/ns/ff_b").get, renamed))
    // stage something so fastForward has a publish to attempt
    Snapshots.commit(Seq((5L, 50L)).toDF("id", "v_b"), s"$wh/ns/ff_b")
    val e = intercept[Exception](
      Snapshots.fastForward(spark, s"$wh/ns/ff", s"$wh/ns/ff_b"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    Snapshots.drop(spark, s"$wh/ns/ff_b")
    val _ = cat
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

  test("column defaults: initial default for pre-ADD files, explicit NULL stays NULL, SET DEFAULT is future-only") {
    wh
    spark.sql("CREATE TABLE evo_cat.ns.cd AS SELECT * FROM VALUES (1L), (2L) AS v(id)")
    spark.sql("ALTER TABLE evo_cat.ns.cd ADD COLUMNS (tag STRING DEFAULT 'unknown')")
    // epoch-1 files: metadata-only — nothing rewritten
    val files1 = Snapshots.dataFiles(spark, s"$wh/ns/cd").toSet
    assert(files1 === Snapshots.dataFiles(spark, s"$wh/ns/cd").toSet)
    // post-ALTER inserts: omitted column takes the CURRENT default,
    // explicit NULL stays NULL (files carry the column — a lazy
    // coalesce would corrupt this)
    spark.sql("INSERT INTO evo_cat.ns.cd (id) VALUES (3L)")
    spark.sql("INSERT INTO evo_cat.ns.cd VALUES (4L, NULL), (5L, 'real')")
    def rows() = spark.sql("SELECT id, tag FROM evo_cat.ns.cd ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "<null>" else r.getString(1))).toSeq
    assert(rows() === Seq((1L, "unknown"), (2L, "unknown"), (3L, "unknown"),
      (4L, "<null>"), (5L, "real")))
    // both read paths agree
    assert(Snapshots.read(spark, s"$wh/ns/cd").filter(col("tag") === "unknown")
      .count() === 3L)
    // SET DEFAULT changes FUTURE inserts only; old files keep reading
    // the initial default (rewriting history's meaning is what
    // defaults must never do)
    spark.sql("ALTER TABLE evo_cat.ns.cd ALTER COLUMN tag SET DEFAULT 'later'")
    spark.sql("INSERT INTO evo_cat.ns.cd (id) VALUES (6L)")
    assert(rows() === Seq((1L, "unknown"), (2L, "unknown"), (3L, "unknown"),
      (4L, "<null>"), (5L, "real"), (6L, "later")))
    // CREATE-time defaults work the same
    spark.sql("CREATE TABLE evo_cat.ns.cd2 (id BIGINT, s STRING DEFAULT 'born')")
    spark.sql("INSERT INTO evo_cat.ns.cd2 (id) VALUES (1L)")
    assert(spark.sql("SELECT s FROM evo_cat.ns.cd2").head.getString(0) === "born")
    // a COW rewrite (DELETE) materializes the default into survivors
    // without changing what they serve
    spark.sql("DELETE FROM evo_cat.ns.cd WHERE id = 2")
    assert(rows() === Seq((1L, "unknown"), (3L, "unknown"),
      (4L, "<null>"), (5L, "real"), (6L, "later")))
    // non-constant defaults refuse loudly (not metadata-sound for
    // existing files)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE evo_cat.ns.cd ADD COLUMNS (r DOUBLE DEFAULT rand())"))
    assert(e.getMessage.toLowerCase.contains("default"), e.getMessage)
  }

  test("concurrent field-id extensions never allocate one id to two names (CAS)") {
    import graft.sources.FieldIds
    val dir = java.nio.file.Files.createTempDirectory("fid-cas").toString + "/t"
    Snapshots.commit(Seq((1L, 2L)).toDF("id", "v"), dir)
    val st0 = FieldIds.load(spark, dir).get
    // 16 writers race to allocate ids for 16 DIFFERENT new columns —
    // under the old last-writer-wins save, racers routinely persisted
    // the same `next` for different names (one id naming two columns =
    // a later id-matched read silently serving one column's bytes as
    // the other)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(
                s"c$i", org.apache.spark.sql.types.LongType)))
            FieldIds.extendAndAttach(spark, dir, st0, schema)
              ._1.fields(s"c$i")
          }
        })
      }
      val got = tasks.map(_.get())
      assert(got.distinct.size === 16, s"duplicate ids allocated: $got")
      val fin = FieldIds.load(spark, dir).get
      (0 until 16).foreach(i => assert(fin.fields(s"c$i") === got(i),
        s"persisted state lost c$i's allocation"))
      assert(fin.next > st0.next + 15)
    } finally pool.shutdown()
  }

  test("legacy fieldids.json with a truncated trailing escape loads without throwing") {
    import graft.sources.FieldIds
    val dir = java.nio.file.Files.createTempDirectory("fid-esc").toString + "/t"
    new java.io.File(dir).mkdirs()
    // hand-crafted legacy file whose last name ends in '\u12' (cut off
    // mid-escape) — tolerated like any other malformed escape, never a
    // StringIndexOutOfBounds
    // the name bytes are x, backslash, u, 1, 2 — assembled by concat
    // because the Scala lexer would otherwise eat a literal \ u escape
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/fieldids.json"),
      """{"next":3,"fields":{"id":1,"x""" + "\\" + """u12":2}}""")
    val st = FieldIds.load(spark, dir).get
    assert(st.next === 3)
    assert(st.fields.values.toSet === Set(1, 2))
  }
}
