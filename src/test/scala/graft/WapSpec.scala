package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Named refs (immutable tags) + write-audit-publish forks over the
  * snapshot format: metadata-only fork, staged-write isolation,
  * audit-fix on the branch, single-commit fast-forward with data-dir
  * relocation, conflict refusal, tag retention through vacuum, and the
  * SQL surfaces (VERSION AS OF 'tag', CALL tag/fork/fast_forward).
  */
class WapSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"wap-$tag").toString + "/t"

  test("fork is metadata-only and reads identically to the parent") {
    val parent = freshDir("fork")
    val branch = parent + "-b"
    Snapshots.commit((1L to 1000L).toDF("id").withColumn("v", col("id") * 2), parent)
    Snapshots.fork(spark, parent, branch)
    // no data file was copied or written under the branch
    val bData = new java.io.File(s"$branch/data")
    assert(!bData.exists() || bData.listFiles().isEmpty,
      "fork must not copy or write data files")
    assert(Snapshots.read(spark, branch).orderBy("id").collect().toSeq ===
      Snapshots.read(spark, parent).orderBy("id").collect().toSeq)
    assert(Snapshots.forkPoint(spark, branch) === Some(1L))
  }

  test("staged writes and audit deletes stay invisible to the parent until fast-forward") {
    val parent = freshDir("iso")
    val branch = parent + "-b"
    Snapshots.commit((1L to 100L).toDF("id"), parent)
    Snapshots.fork(spark, parent, branch)
    Snapshots.commit((101L to 200L).toDF("id"), branch)
    Snapshots.deleteWhere(spark, branch, col("id") > 150)
    // parent still reads exactly v1
    assert(Snapshots.read(spark, parent).count() === 100)
    val v = Snapshots.fastForward(spark, parent, branch)
    assert(v === 2L)
    val ids = Snapshots.read(spark, parent).as[Long].collect().sorted
    assert(ids === (1L to 150L).toArray)
    // the branch was consumed; its dir is gone and every published file
    // lives under the parent (self-contained gc/vacuum lifecycle)
    assert(!new java.io.File(branch).exists(), "branch must be dropped on publish")
    val parentNorm = new org.apache.hadoop.fs.Path(parent).toUri.getPath
    Snapshots.dataFiles(spark, parent).foreach { p =>
      assert(new org.apache.hadoop.fs.Path(p).toUri.getPath.startsWith(parentNorm),
        s"published file $p escaped the parent dir")
    }
    // the change feed across the wap commit is exactly the audited batch
    val feed = Snapshots.changeFeed(spark, parent, 1L, 2L)
    assert(feed.filter(col("_change_type") === "insert").count() === 50)
    assert(feed.filter(col("_change_type") === "delete").count() === 0)
  }

  test("fast-forward refuses when the parent advanced past the fork point") {
    val parent = freshDir("conflict")
    val branch = parent + "-b"
    Snapshots.commit((1L to 10L).toDF("id"), parent)
    Snapshots.fork(spark, parent, branch)
    Snapshots.commit((11L to 20L).toDF("id"), branch)
    Snapshots.commit((21L to 30L).toDF("id"), parent) // concurrent advance
    val e = intercept[IllegalArgumentException] {
      Snapshots.fastForward(spark, parent, branch)
    }
    assert(e.getMessage.contains("re-fork"))
    // parent unharmed, branch intact for inspection
    assert(Snapshots.read(spark, parent).count() === 20)
    assert(Snapshots.read(spark, branch).count() === 20)
  }

  test("tags are immutable, resolve through the reader, and survive vacuum") {
    val t = freshDir("tags")
    Snapshots.commit((1L to 10L).toDF("id"), t)
    Snapshots.commit((11L to 20L).toDF("id"), t)
    Snapshots.commit((21L to 30L).toDF("id"), t)
    Snapshots.tag(spark, t, "audited", 2L)
    Snapshots.tag(spark, t, "audited", 2L) // same version: idempotent
    intercept[IllegalStateException] { Snapshots.tag(spark, t, "audited", 3L) }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, t, "42", 2L) }
    assert(Snapshots.tags(spark, t) === Seq("audited" -> 2L))
    // V2 reader option
    val viaTag = spark.read.format("graft-snapshot")
      .option("path", t).option("asOfTag", "audited").load().count()
    assert(viaTag === 20)
    intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("path", t).option("asOfTag", "nope").load().count()
    }
    // vacuum keeps the tagged version alive alongside the head
    Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(Snapshots.versions(spark, t) === Seq(2L, 3L))
    assert(Snapshots.read(spark, t, asOf = Some(2L)).count() === 20)
  }

  test("SQL surface: VERSION AS OF 'tag' and CALL tag/fork/fast_forward") {
    val wh = java.nio.file.Files.createTempDirectory("wapwh").toString
    val cat = s"wapcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t AS SELECT * FROM VALUES (1L), (2L) AS v(id)")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3L)")
    spark.sql(s"CALL $cat.system.tag(table => 'ns.t', name => 'first', version => 1)")
    assert(spark.sql(s"SELECT * FROM $cat.ns.t VERSION AS OF 'first'").count() === 2)
    assert(spark.sql(s"SELECT * FROM $cat.ns.t VERSION AS OF 2").count() === 3)
    // CALL tags lists every ref (name-ascending)
    spark.sql(s"CALL $cat.system.tag(table => 'ns.t', name => 'second', version => 2)")
    val listed = spark.sql(s"CALL $cat.system.tags(table => 'ns.t')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(listed === Seq("first" -> 1L, "second" -> 2L))
    spark.sql(s"CALL $cat.system.fork(table => 'ns.t', branch => 'ns.t_wap')")
    spark.sql(s"INSERT INTO $cat.ns.t_wap VALUES (4L), (5L)")
    // audit on the branch via SQL DML, then publish (the WAP-named
    // alias of fast_forward)
    spark.sql(s"DELETE FROM $cat.ns.t_wap WHERE id = 5")
    val v = spark.sql(
      s"CALL $cat.system.publish(table => 'ns.t', branch => 'ns.t_wap')")
      .collect().head.getLong(0)
    assert(v === 3L)
    assert(spark.sql(s"SELECT * FROM $cat.ns.t").as[Long].collect().sorted ===
      Array(1L, 2L, 3L, 4L))
  }

  test("change feed across a wap publish that deleted parent rows: exact delete set, carried rows cancel") {
    val parent = freshDir("cfdel")
    val branch = parent + "-b"
    Snapshots.commit((1L to 100L).toDF("id"), parent)
    Snapshots.fork(spark, parent, branch)
    // the audit drops parent rows ON THE BRANCH (COW rewrite of the
    // touched file into a survivor file under the branch)
    Snapshots.deleteWhere(spark, branch, col("id") <= 10)
    Snapshots.fastForward(spark, parent, branch)
    val feed = Snapshots.changeFeed(spark, parent, 1L, 2L)
    val dels = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted
    assert(dels === (1L to 10L).toArray,
      "feed must report exactly the audited-away rows as deletes")
    // survivors were physically rewritten into a new file, but the feed
    // is a row-level multiset diff — carried rows cancel algebraically
    assert(feed.filter(col("_change_type") === "insert").count() === 0)
  }

  test("fast-forward of an untouched fork is a semantic no-op (no empty wap version)") {
    val parent = freshDir("noop")
    val branch = parent + "-b"
    Snapshots.commit((1L to 10L).toDF("id"), parent)
    Snapshots.fork(spark, parent, branch)
    val v = Snapshots.fastForward(spark, parent, branch)
    assert(v === 1L)
    assert(Snapshots.versions(spark, parent) === Seq(1L))
    assert(!new java.io.File(branch).exists(), "branch still consumed on no-op")
  }

  test("fast-forward racing a concurrent append: exactly one wins the version, no rows lost") {
    // Either interleaving must leave a consistent table: if the append
    // claims the version first, fast-forward fails loudly AND rolls the
    // staged data dirs back under the branch (re-fork starts clean); if
    // fast-forward wins, the append's optimistic retry rebases on top
    // of the published wap manifest.
    (1 to 5).foreach { round =>
      val parent = freshDir(s"race$round")
      val branch = parent + "-b"
      Snapshots.commit((1L to 100L).toDF("id"), parent)
      Snapshots.fork(spark, parent, branch)
      Snapshots.commit((101L to 150L).toDF("id"), branch)
      val appendRows = (1001L to 1010L).toDF("id")
      val start = new java.util.concurrent.CountDownLatch(1)
      var ffOk = false
      var ffErr: Throwable = null
      val t1 = new Thread(() => {
        start.await()
        try { Snapshots.fastForward(spark, parent, branch); ffOk = true }
        catch { case e: Throwable => ffErr = e }
      })
      val t2 = new Thread(() => {
        start.await()
        Snapshots.commit(appendRows, parent): Unit
      })
      t1.start(); t2.start(); start.countDown()
      t1.join(120000); t2.join(120000)
      if (ffOk) {
        // wap published, append rebased on top (or landed first at v2
        // is impossible here since ff succeeded at fp+1)
        assert(Snapshots.read(spark, parent).count() === 160,
          s"round $round: rows lost with ff winning")
        assert(Snapshots.versions(spark, parent) === Seq(1L, 2L, 3L))
      } else {
        assert(ffErr != null &&
          ffErr.getMessage.contains("re-fork"), s"round $round: $ffErr")
        assert(Snapshots.read(spark, parent).count() === 110,
          s"round $round: parent corrupted by failed ff")
        // rollback restored the branch: still reads its staged state
        assert(Snapshots.read(spark, branch).count() === 150,
          s"round $round: branch not restored after lost race")
        // stats are recorded only AFTER a successful publish, so the
        // append-only sidecar must carry no dead lines for the
        // rolled-back staged paths
        graft.sources.FileStats.load(spark, parent).keySet.foreach { p =>
          assert(new java.io.File(p).exists(),
            s"round $round: dead stats line for rolled-back path $p")
        }
      }
    }
  }

  test("fork + staged DML + fast-forward equals the same DML applied directly (random histories)") {
    // The WAP detour must be semantically invisible: for any op
    // sequence (append / COW delete / COW merge-upsert), staging it on
    // a fork and publishing gives byte-for-byte the rows of applying it
    // straight to the table. Randomized over op mixes and predicates.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    val opGen: Gen[(Int, Long)] =
      Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(1L, 9L))
    val caseGen: Gen[(Long, List[(Int, Long)])] =
      Gen.zip(Gen.chooseNum(50L, 200L), Gen.listOfN(3, opGen))
    samples(caseGen, 8).zipWithIndex.foreach { case ((n0, ops), ci) =>
      val parent = freshDir(s"prop$ci")
      val direct = freshDir(s"propd$ci")
      val branch = parent + "-b"
      val base = (1L to n0).toDF("id").withColumn("v", col("id") * 2)
      Snapshots.commit(base, parent)
      Snapshots.commit(base, direct)
      Snapshots.fork(spark, parent, branch)
      ops.zipWithIndex.foreach { case ((kind, p), oi) =>
        def apply(t: String): Unit = kind match {
          case 0 => // append a fresh disjoint batch
            Snapshots.commit((1L to 20L).map(_ + 10000L * (oi + 1))
              .toDF("id").withColumn("v", col("id") + p), t): Unit
          case 1 => // COW delete by residue predicate
            Snapshots.deleteWhere(spark, t, col("id") % (p + 2) === p % (p + 2)): Unit
          case 2 => // COW merge-upsert: rewrite a key slice, add one new
            Snapshots.merge(spark, t,
              (1L to 15L).map(_ * p).toDF("id")
                .withColumn("v", col("id") * 100), "id"): Unit
        }
        apply(branch); apply(direct)
      }
      Snapshots.fastForward(spark, parent, branch)
      val got = Snapshots.read(spark, parent)
        .orderBy("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = Snapshots.read(spark, direct)
        .orderBy("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === want, s"case $ci (n0=$n0 ops=$ops): WAP detour changed the rows")
    }
  }

  test("fork carries the bucket layout and the stats sidecar") {
    val parent = freshDir("bfork")
    val branch = parent + "-b"
    Snapshots.commitBucketed((1L to 512L).toDF("k")
      .withColumn("v", col("k") % 7), parent, "k", 8)
    Snapshots.fork(spark, parent, branch)
    assert(Snapshots.bucketSpec(spark, branch) === Some(("k", 8)))
    // pruning parity: the copied sidecar lets the branch skip files on
    // a selective predicate exactly like the parent
    val pf = graft.sources.FileStats.prune(spark, parent,
      Snapshots.dataFiles(spark, parent), col("k") === 1L)
    val bf = graft.sources.FileStats.prune(spark, branch,
      Snapshots.dataFiles(spark, branch), col("k") === 1L)
    assert(pf.map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet ===
      bf.map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet)
    assert(bf.size < Snapshots.dataFiles(spark, branch).size,
      "sidecar copy should allow actual pruning on the branch")
  }
}
