package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Random

/** Concurrency hammer for the snapshot table format (round-4
  * prescription): many random interleavings of concurrent committers,
  * a merger, pinned readers, gc, and vacuum on ONE table, asserting
  * the format's core invariants after every trial:
  *
  *  - no lost rows: every commit that RETURNED is readable in full;
  *  - monotonic, gap-free version history;
  *  - no dangling references: every file a surviving manifest lists
  *    exists on disk;
  *  - gc never reclaims a live writer's work;
  *  - snapshot isolation: a pinned reader re-reads the same rows while
  *    writers land;
  *  - vacuumed history fails loudly, never serves partial data.
  *
  * Interleavings come from real thread scheduling (3 writer threads +
  * 1 reader thread per trial) across many seeded trials — the
  * scalacheck-style "≥100 random interleavings" bar, with the seed in
  * the failure message for replay.
  */
class SnapshotHammerSpec extends SparkTestBase {

  import spark.implicits._

  private val trials = 100
  private val writers = 3
  private val opsPerWriter = 2

  test(s"$trials random interleavings: commits, merges, compactions, pinned reads, gc, vacuum") {
    val pool = Executors.newFixedThreadPool(writers + 1)
    try {
      (0 until trials).foreach { trial =>
        val rnd = new Random(1000L + trial)
        val table = java.nio.file.Files
          .createTempDirectory(s"hammer$trial").resolve("t").toString
        // seed so merges always have a base version; one thread-owned
        // seed row per writer for the SQL UPDATE racer
        Snapshots.commit(Seq((-1L, "seed"), (-2L, "seed"), (-3L, "seed"))
          .toDF("id", "v"), table)
        // SQL row-level DML needs a catalog route to the same table;
        // per-trial catalog name because catalog instances bind their
        // warehouse at first use
        val catName = s"hammer_cat_$trial"
        spark.conf.set(s"spark.sql.catalog.$catName",
          classOf[graft.sources.v2.SnapshotCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$catName.warehouse",
          new org.apache.hadoop.fs.Path(table).getParent.toString)

        val start = new CountDownLatch(1)
        val done = new CountDownLatch(writers + 1)
        val committed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
        val mergedVal = new java.util.concurrent.ConcurrentHashMap[Long, String]()
        val updatedVal = new java.util.concurrent.ConcurrentHashMap[Long, String]()
        val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()

        (0 until writers).foreach { w =>
          pool.submit(new Runnable { def run(): Unit = {
            start.await()
            try {
              (0 until opsPerWriter).foreach { op =>
                val id = trial.toLong * 1000 + w * 100 + op
                val dice = rnd.synchronized(rnd.nextInt(8))
                if (dice == 7) {
                  // SQL UPDATE racing everything else: the group-based
                  // COW ReplaceData (RowLevelOps) publishes through the
                  // same rebase protocol — a race loss aborts and the
                  // statement retries; per-key order is thread-local so
                  // this thread's last UPDATE must be the final value
                  val key = -(w + 1L)
                  val value = s"u-$w-$op"
                  var attempts = 0
                  var ok = false
                  while (!ok && attempts < 20) {
                    try {
                      spark.sql(s"UPDATE $catName.t SET v = '$value' " +
                        s"WHERE id = $key")
                      ok = true
                    } catch {
                      case e: Exception
                          if e.isInstanceOf[IllegalStateException] ||
                            (e.getCause != null &&
                              e.getCause.isInstanceOf[IllegalStateException]) =>
                        attempts += 1
                    }
                  }
                  if (ok) updatedVal.put(key, value)
                  else failures.add(s"sql update starved after 20 races (w$w op$op)")
                } else if (dice == 6) {
                  // z-order rewrite racing everything else: same
                  // publishRebase contract as compact — an interleaved
                  // append must survive INTO the re-clustered manifest
                  try Snapshots.optimizeZOrder(spark, table, "id", "id",
                    numFiles = 1)
                  catch { case _: IllegalStateException => }
                } else if (dice == 1) {
                  // compaction racing appends/merges: an append rebases
                  // INTO the compacted manifest (the overwrite-commit
                  // path silently dropped it — the lost-rows class the
                  // final assertions below would catch); losing to a
                  // conflicting merge is a legitimate abort, skip
                  try Snapshots.compact(spark, table, numFiles = 1)
                  catch { case _: IllegalStateException => }
                } else if (dice == 0 || dice == 2) {
                  // merge on a thread-owned key: last merge this thread
                  // issues must be the key's final value (per-key order is
                  // thread-local; merge aborts on race → bounded retry)
                  val key = 9000L + w
                  var attempts = 0
                  var ok = false
                  while (!ok && attempts < 20) {
                    try {
                      Snapshots.merge(spark, table,
                        Seq((key, s"m-$w-$op")).toDF("id", "v"), "id")
                      ok = true
                    } catch {
                      case _: IllegalStateException => attempts += 1
                    }
                  }
                  if (ok) mergedVal.put(key, s"m-$w-$op")
                  else failures.add(s"merge starved after 20 races (w$w op$op)")
                } else {
                  // losing the version race 5× in a row is legitimate
                  // under contention — retry the whole commit, don't fail.
                  // dice==3 routes through the DataSourceV2 write path
                  // (format string → V1Write fallback → same commit
                  // protocol), so V2 writers race V1 writers, mergers and
                  // compactors in the same trials.
                  val viaV2 = dice == 3
                  var attempts = 0
                  var ok = false
                  while (!ok && attempts < 4) {
                    try {
                      if (viaV2)
                        Seq((id, s"c-$w-$op")).toDF("id", "v")
                          .write.format("graft-snapshot")
                          .option("path", table).mode("append").save()
                      else
                        Snapshots.commit(Seq((id, s"c-$w-$op")).toDF("id", "v"), table)
                      ok = true
                    } catch {
                      // the V2 route surfaces the race loss wrapped in
                      // Spark's command-exec exception; retry either shape
                      case e: Exception
                          if e.isInstanceOf[IllegalStateException] ||
                            (e.getCause != null &&
                              e.getCause.isInstanceOf[IllegalStateException]) =>
                        attempts += 1
                    }
                  }
                  if (ok) committed.add(id)
                  else failures.add(s"commit starved (w$w op$op viaV2=$viaV2)")
                }
              }
            } catch { case e: Throwable =>
              failures.add(s"writer $w: ${e.getClass.getSimpleName} ${e.getMessage}")
            } finally done.countDown()
          }})
        }
        pool.submit(new Runnable { def run(): Unit = {
          start.await()
          try {
            // pinned reader: snapshot isolation means the SAME version
            // re-reads identically while commits land around it
            (0 until 3).foreach { _ =>
              val v = Snapshots.versions(spark, table).last
              val before = Snapshots.read(spark, table, Some(v)).count()
              Thread.sleep(rnd.synchronized(rnd.nextInt(30)).toLong)
              val after = Snapshots.read(spark, table, Some(v)).count()
              if (before != after)
                failures.add(s"pinned v$v drifted: $before -> $after")
              // gc with a sane grace must never touch live writers' files
              val gone = Snapshots.gc(spark, table, graceMs = 3600 * 1000L)
              if (gone != 0) failures.add(s"gc reclaimed $gone live files")
            }
          } catch { case e: Throwable =>
            failures.add(s"reader: ${e.getClass.getSimpleName} ${e.getMessage}")
          } finally done.countDown()
        }})

        start.countDown()
        assert(done.await(120, TimeUnit.SECONDS), s"trial $trial deadlocked")
        assert(failures.isEmpty, s"trial $trial: ${failures.toArray.mkString("; ")}")

        // version history: strictly increasing, gap-free from v1
        val vs = Snapshots.versions(spark, table)
        assert(vs === (1L to vs.length.toLong), s"trial $trial versions $vs")

        // no dangling references in ANY version (gc ran mid-flight)
        val fs = new org.apache.hadoop.fs.Path(table)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // no lost rows: every returned commit is in the final snapshot,
        // and no key is duplicated (the mergeSink race class)
        val collected = Snapshots.read(spark, table).as[(Long, String)].collect()
        val finalRows = collected.toMap
        assert(collected.length === finalRows.size,
          s"trial $trial duplicated keys: ${collected.length} rows, ${finalRows.size} distinct")
        committed.forEach { id =>
          assert(finalRows.contains(id), s"trial $trial lost committed row $id")
        }
        updatedVal.forEach { (k, v) =>
          if (!finalRows.get(k).contains(v))
            fail(s"trial $trial sql-update key $k: ${finalRows.get(k)} != $v")
        }
        mergedVal.forEach { (k, v) =>
          if (!finalRows.get(k).contains(v)) {
            // forensics: which versions carried the key, full history
            val hist = vs.map { ver =>
              val has = Snapshots.read(spark, table, Some(ver))
                .filter(col("id") === k).collect()
                .map(r => r.getString(1)).mkString(",")
              s"v$ver:[$has]"
            }.mkString(" ")
            fail(s"trial $trial merge key $k: ${finalRows.get(k)} != $v; history $hist")
          }
        }

        // vacuum to 2 versions: survivors fully readable, their files all
        // exist; expired time travel fails loudly
        val expired = vs.dropRight(2)
        Snapshots.vacuum(spark, table, keepVersions = 2)
        val kept = Snapshots.versions(spark, table)
        assert(kept === vs.takeRight(2), s"trial $trial kept $kept")
        assert(Snapshots.read(spark, table).count() === finalRows.size)
        if (expired.nonEmpty)
          intercept[IllegalArgumentException] {
            Snapshots.read(spark, table, Some(expired.last))
          }
        // cleanup
        fs.delete(new org.apache.hadoop.fs.Path(table).getParent, true)
      }
    } finally pool.shutdownNow()
  }
}
