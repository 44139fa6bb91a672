package graft

import java.nio.file.Files

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Kill-mid-commit recovery, property-swept across commit types: for
  * EVERY control-plane filesystem mutation a commit performs, inject a
  * crash right there (and at every later write — a dead process stops
  * writing entirely, so in-process failure handlers cannot quietly
  * repair state) and assert the snapshot format's ACID story:
  *
  *  1. the table READS after any crash point — either the old version
  *     or the new one, never a torn state;
  *  2. a RETRY of the operation (the next session's move) heals the
  *     table to exactly the clean-run end state.
  *
  * The sweep advances the allowed-mutation budget one step at a time
  * until the operation completes with budget left over, so every
  * prefix of the mutation sequence is exercised — append, equality-
  * delete upsert, MOR delete (the delta-commit protocol), purge,
  * compact, restore, fork+fastForward (WAP publish), and gc. Data-job
  * staging churn (`_temporary`/`_SUCCESS`) is excluded from the budget:
  * Spark's committer owns those crash windows, and a crash anywhere in
  * them is equivalent to the budget point at the job boundary (no
  * manifest referenced anything yet).
  */
class CrashRecoverySpec extends SparkTestBase {

  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.crash.impl", classOf[CrashFs].getName)

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  /** Full observable state: committed versions + live rows. */
  private def stateOf(root: String): (Seq[Long], Seq[(Long, String)]) =
    (Snapshots.versions(spark, root),
      Snapshots.read(spark, root).select("id", "v").as[(Long, String)]
        .collect().sortBy(_._1).toSeq)

  /** Sweep crash points over `op` on a fresh `build`-built table per
    * point. Returns the number of distinct crash points exercised.
    */
  private def sweep(tag: String, maxSteps: Int = 80,
      finalCheck: String => Unit = _ => ())(build: String => Unit)(
      op: String => Unit): Int = {
    val parent = Files.createTempDirectory(s"crash-$tag").toString
    // clean reference run pins the expected end state (versions are
    // deterministic across identical builds; rows likewise)
    val ref = s"crash:$parent/ref"
    build(ref)
    op(ref)
    val after = stateOf(ref)
    val filter = (p: String) =>
      p.contains(parent) && !p.contains("_temporary") && !p.contains("_SUCCESS")
    var k = 0
    var completed = false
    var crashPoints = 0
    while (!completed && k <= maxSteps) {
      val root = s"crash:$parent/t$k"
      CrashFsHook.disable()
      build(root)
      val before = stateOf(root)
      CrashFsHook.arm(k, filter)
      // a fired hook counts as a crash point even when the op RETURNED:
      // best-effort walks (gc) swallow per-dir IO failures by design,
      // and the mutations after the injection were still all blocked —
      // exactly the state a real crash leaves
      val threw =
        try { op(root); false }
        catch {
          case _: Throwable if CrashFsHook.fired => true
          case t: Throwable => CrashFsHook.disable(); throw t
        }
      val crashed = threw || CrashFsHook.fired
      CrashFsHook.disable()
      if (crashed) crashPoints += 1 else completed = true
      // invariant 1: never a torn read — old state or new state
      val now = stateOf(root)
      assert(now == before || now == after,
        s"$tag crash@$k: torn state\n  before=$before\n  after=$after\n  now=$now")
      // invariant 2: retry heals to the clean-run end state
      if (now != after) {
        op(root)
        val healed = stateOf(root)
        assert(healed == after, s"$tag crash@$k: retry did not heal\n" +
          s"  healed=$healed\n  after=$after")
      }
      finalCheck(root)
      k += 1
    }
    assert(completed,
      s"$tag: op still crashing after $maxSteps budget steps — widen maxSteps")
    crashPoints
  }

  test("append commit survives a crash at every control-plane step") {
    val pts = sweep("append")(r => Snapshots.commit(df(1 to 4), r): Unit) {
      r => Snapshots.commit(df(5 to 8), r): Unit
    }
    assert(pts > 0)
  }

  test("equality-delete upsert survives a crash at every step") {
    val pts = sweep("upserteq")(r => Snapshots.commit(df(1 to 4), r): Unit) {
      r => Snapshots.upsertEq(spark, r,
        Seq((2L, "B!"), (9L, "i")).toDF("id", "v"), Seq("id")): Unit
    }
    assert(pts > 0)
  }

  test("MOR delete (position-delta commit) survives a crash at every step") {
    val pts = sweep("mordel")(r => Snapshots.commit(df(1 to 4), r): Unit) {
      r => Snapshots.deleteWhereMor(spark, r, col("id") >= 3): Unit
    }
    assert(pts > 0)
  }

  test("purgeDeletes survives a crash at every step") {
    val pts = sweep("purge") { r =>
      Snapshots.commit(df(1 to 4), r)
      Snapshots.deleteWhereMor(spark, r, col("id") === 2): Unit
    } { r => Snapshots.purgeDeletes(spark, r): Unit }
    assert(pts > 0)
  }

  test("compact survives a crash at every step") {
    val pts = sweep("compact") { r =>
      Snapshots.commit(df(1 to 4), r)
      Snapshots.commit(df(5 to 8), r): Unit
    } { r => Snapshots.compact(spark, r, 1): Unit }
    assert(pts > 0)
  }

  test("restore survives a crash at every step") {
    val pts = sweep("restore") { r =>
      Snapshots.commit(df(1 to 4), r)
      Snapshots.commit(df(5 to 8), r): Unit
    } { r => Snapshots.restore(spark, r, 1L): Unit }
    assert(pts > 0)
  }

  test("fork + fastForward (WAP publish) survives a crash at every step") {
    // each attempt forks a FRESH branch (the documented recovery story:
    // a crashed publish is retried by re-fork + re-stage — the parent
    // table must stay intact through every crash point regardless)
    val attempt = new java.util.concurrent.atomic.AtomicInteger()
    val pts = sweep("wap", maxSteps = 120)(
      r => Snapshots.commit(df(1 to 4), r): Unit) { r =>
      val b = s"$r-branch${attempt.incrementAndGet()}"
      Snapshots.fork(spark, r, b)
      Snapshots.commit(df(5 to 8), b)
      Snapshots.fastForward(spark, r, b): Unit
    }
    assert(pts > 0)
  }

  test("vacuum survives a crash at every step: head always readable, retry completes expiry") {
    // vacuum needs its own invariants: a crash mid-expiry legitimately
    // leaves a SUBSET of the old manifests (and possibly expired
    // versions whose files are already gone — vacuumed history has no
    // read contract), so full state equality is wrong. What must hold
    // at every crash point: the LATEST version reads exactly the same
    // rows, it is never expired itself, and a retry finishes the expiry
    // to exactly the clean-run end state.
    val parent = Files.createTempDirectory("crash-vacuum").toString
    def build(r: String): Unit = {
      Snapshots.commit(df(1 to 4), r)
      Snapshots.commit(df(5 to 8), r)
      Snapshots.compact(spark, r, 1): Unit // v3: v1/v2 files become expirable
    }
    def headRows(r: String): Seq[(Long, String)] =
      Snapshots.read(spark, r).select("id", "v").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
    val ref = s"crash:$parent/ref"
    build(ref)
    Snapshots.vacuum(spark, ref, keepVersions = 1)
    val afterRows = headRows(ref)
    val afterVersions = Snapshots.versions(spark, ref)
    assert(afterVersions === Seq(3L))
    val filter = (p: String) =>
      p.contains(parent) && !p.contains("_temporary") && !p.contains("_SUCCESS")
    var k = 0
    var completed = false
    var crashPoints = 0
    while (!completed && k <= 80) {
      val root = s"crash:$parent/t$k"
      CrashFsHook.disable()
      build(root)
      CrashFsHook.arm(k, filter)
      val threw =
        try { Snapshots.vacuum(spark, root, keepVersions = 1); false }
        catch {
          case _: Throwable if CrashFsHook.fired => true
          case t: Throwable => CrashFsHook.disable(); throw t
        }
      val crashed = threw || CrashFsHook.fired
      CrashFsHook.disable()
      if (crashed) crashPoints += 1 else completed = true
      val vs = Snapshots.versions(spark, root)
      assert(vs.nonEmpty && vs.last == 3L && vs.toSet.subsetOf(Set(1L, 2L, 3L)),
        s"vacuum crash@$k: latest version lost or alien versions appeared: $vs")
      assert(headRows(root) === afterRows,
        s"vacuum crash@$k: the latest snapshot's rows changed")
      Snapshots.vacuum(spark, root, keepVersions = 1) // retry
      assert(Snapshots.versions(spark, root) === afterVersions,
        s"vacuum crash@$k: retry did not finish the expiry")
      assert(headRows(root) === afterRows)
      k += 1
    }
    assert(completed && crashPoints > 0)
  }

  test("gc survives a crash at every step and a retry reclaims the orphan") {
    // negative grace puts the cutoff in the future (a freshly-written
    // orphan would otherwise sit INSIDE the default grace window); the
    // finalCheck reruns gc crash-free and pins that the orphan is gone
    // at EVERY crash point — a swallowed mid-sweep failure may defer
    // reclaim, never lose it
    def orphanGone(r: String): Unit = {
      Snapshots.gc(spark, r, graceMs = -60000L): Unit
      val f = new org.apache.hadoop.fs.Path(r)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!f.exists(new org.apache.hadoop.fs.Path(s"$r/data/orphan-dir")),
        s"orphan not reclaimed under $r")
    }
    val pts = sweep("gc", finalCheck = orphanGone) { r =>
      Snapshots.commit(df(1 to 4), r)
      // an orphan write root: the aborted-writer shape gc reclaims
      df(90 to 93).write.parquet(s"$r/data/orphan-dir")
    } { r => Snapshots.gc(spark, r, graceMs = -60000L): Unit }
    assert(pts > 0)
  }
}
