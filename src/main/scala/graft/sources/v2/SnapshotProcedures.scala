package graft.sources.v2

import graft.sources.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for snapshot-table maintenance — the Iceberg
  * `CALL catalog.system.<proc>(...)` convention on Spark 4's
  * ProcedureCatalog surface, so every lifecycle operation the Scala API
  * offers is reachable from plain SQL:
  *
  * {{{
  *   CALL cat.system.compact(table => 'ns.t', num_files => 4)
  *   CALL cat.system.optimize_zorder(table => 'ns.t',
  *        col1 => 'o_custkey', col2 => 'o_totalprice')
  *   CALL cat.system.restore(table => 'ns.t', version => 3)
  *   CALL cat.system.vacuum(table => 'ns.t', keep_versions => 2)
  *   CALL cat.system.gc(table => 'ns.t')
  * }}}
  *
  * Each procedure resolves the table identifier against the owning
  * catalog's warehouse and delegates to the corresponding [[Snapshots]]
  * operation — same commit protocol, same concurrency story as the
  * programmatic path. The returned result set (a one-row LocalScan) is
  * the operation's outcome: the published version for the rewrites,
  * counts for the reclaimers. Procedures are driver-side manifests
  * operations plus whatever distributed work the underlying op does
  * (compact/z-order read+write data distributed; vacuum/gc touch only
  * dead files).
  */
private[v2] object SnapshotProcedures {

  /** All procedures live in the `system` namespace (Iceberg parity). */
  val Namespace: Array[String] = Array("system")

  def list(): Array[Identifier] =
    all.keys.map(Identifier.of(Namespace, _)).toArray

  def load(name: String, warehouse: String): Option[UnboundProcedure] =
    all.get(name).map(mk => mk(warehouse))

  private type Make = String => UnboundProcedure

  private def spark = SparkSession.active

  /** `ns.part.name` → `<warehouse>/ns/part/name` (the catalog's
    * tablePath convention; segments validated the same way).
    */
  private def path(warehouse: String, table: String): String = {
    val parts = table.split('.').toSeq
    require(parts.nonEmpty && parts.forall(p =>
      p.nonEmpty && !p.contains('/') && p != ".." && p != "."),
      s"bad table identifier '$table' (expected ns.name)")
    (warehouse +: parts).mkString("/")
  }

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def param(name: String, dt: DataType, dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private def row(vals: Any*): Array[InternalRow] =
    Array(InternalRow.fromSeq(vals.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }))

  /** One-row (or N-row) result set. */
  private final case class Result(schema: StructType, data: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
  }

  private abstract class Proc(procName: String,
      params: Seq[ProcedureParameter], resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def run(input: InternalRow): Array[InternalRow]
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.List.of[Scan](Result(resultSchema, run(input))).iterator()
  }

  /** A procedure whose RESULT SCHEMA depends on the call arguments
    * (e.g. `table_changes`: the target table's columns + the CDC
    * metadata columns). Spark's InvokeProcedures rule materializes the
    * returned Scan into a LocalRelation with the scan's own schema, so
    * the schema is free to be computed inside the call.
    */
  private abstract class DynProc(procName: String,
      params: Seq[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def run(input: InternalRow): (StructType, Array[InternalRow])
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (sch, rows) = run(input)
      java.util.List.of[Scan](Result(sch, rows)).iterator()
    }
  }

  private def schema(fields: (String, DataType)*): StructType =
    fields.foldLeft(new StructType()) { case (s, (n, t)) => s.add(n, t) }

  private val all: Map[String, Make] = Map(
    "compact" -> (wh => new Proc("compact",
      Seq(param("table", StringType), param("num_files", IntegerType, "1")),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.compact(spark, path(wh, in.getString(0)), in.getInt(1)))
    }),
    "optimize_zorder" -> (wh => new Proc("optimize_zorder",
      Seq(param("table", StringType), param("col1", StringType),
        param("col2", StringType), param("num_files", IntegerType, "16")),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.optimizeZOrder(spark, path(wh, in.getString(0)),
          in.getString(1), in.getString(2), in.getInt(3)))
    }),
    // selective small-files compaction (bin-packing): folds only files
    // under target_mb, per bucket on bucketed tables; everything else
    // carries by path — the continuous-ingest maintenance primitive
    "rewrite_small_files" -> (wh => new Proc("rewrite_small_files",
      Seq(param("table", StringType), param("target_mb", IntegerType, "128"),
        param("min_input_files", IntegerType, "2")),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.binPack(spark, path(wh, in.getString(0)),
          in.getInt(1).toLong << 20, in.getInt(2)))
    }),
    // fold outstanding merge-on-read position-delete sidecars back into
    // plain data files (only sidecar-touched files rewrite); returns the
    // published version (unchanged head when nothing was outstanding)
    "purge_deletes" -> (wh => new Proc("purge_deletes",
      Seq(param("table", StringType)),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.purgeDeletes(spark, path(wh, in.getString(0))))
    }),
    // fold outstanding EQUALITY-delete sidecars back into plain data
    // files (only key-HIT files rewrite; position deletes targeting
    // them fold too); returns the published version (unchanged head
    // when nothing was outstanding)
    "purge_eq_deletes" -> (wh => new Proc("purge_eq_deletes",
      Seq(param("table", StringType)),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.purgeEqDeletes(spark, path(wh, in.getString(0))))
    }),
    // CDC upsert via equality deletes (the Flink-into-Iceberg ingest
    // shape, in SQL): appends `source` (a resolvable table/view name)
    // and equality-deletes its key set in ONE commit — no target
    // probe, no rewrite, cost ∝ the batch alone. `token` gives
    // exactly-once replay for streaming feeders.
    "upsert_eq" -> (wh => new Proc("upsert_eq",
      Seq(param("table", StringType), param("source", StringType),
        param("keys", StringType), param("token", StringType, "NULL")),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val keys = in.getString(2).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val token = if (in.isNullAt(3)) None else Option(in.getString(3))
        row(Snapshots.upsertEq(spark, path(wh, in.getString(0)),
          spark.table(in.getString(1)), keys, token))
      }
    }),
    // the AUTOPILOT: inspect manifest state, apply what the measured
    // economics say the table needs — purge_eq / purge / bin-pack /
    // re-cluster, in that order (Snapshots.maintain's decision matrix,
    // thresholds cited from PLANS.md curves). One row per action taken;
    // an already-maintained table returns no rows.
    "maintain" -> (wh => new Proc("maintain",
      Seq(param("table", StringType), param("target_mb", IntegerType, "128"),
        param("min_input_files", IntegerType, "4")),
      schema("action" -> StringType, "detail" -> StringType,
        "version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        Snapshots.maintain(spark, path(wh, in.getString(0)),
          in.getInt(1).toLong << 20, in.getInt(2)).map { case (a, d, v) =>
          InternalRow.fromSeq(Seq(UTF8String.fromString(a),
            UTF8String.fromString(d), v))
        }.toArray
    }),
    // SPEC EVOLUTION for hidden partitioning: append a new transform
    // epoch (metadata-only — existing files keep their layout and stay
    // prunable via footer stats; future writes cluster under the new
    // spec). `spec` is 'years|months|days|hours(col)', 'truncate(n,
    // col)', a bare column (identity), or 'none' to retire.
    "evolve_partition_spec" -> (wh => new Proc("evolve_partition_spec",
      Seq(param("table", StringType), param("spec", StringType)),
      schema("epoch" -> IntegerType, "spec" -> StringType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val p = path(wh, in.getString(0))
        val raw = in.getString(1).trim
        val Shape = """(\w+)\(\s*(?:(\d+)\s*,\s*)?([^)]+?)\s*\)""".r
        val (t, c, a) = raw match {
          case "none" => ("none", "", None)
          case Shape(tr, null, col) => (tr, col, None)
          case Shape(tr, n, col) => (tr, col, Some(n.toInt))
          case bare if bare.nonEmpty && !bare.contains('(') =>
            ("identity", bare, None)
          case other => throw new IllegalArgumentException(
            s"cannot parse partition spec '$other'")
        }
        val sch = if (t == "none") None
          else Some(Snapshots.read(spark, p).schema)
        val epoch = graft.sources.PartitionSpecs.evolve(spark, p, t, c, a, sch)
        Array(InternalRow.fromSeq(Seq(epoch,
          UTF8String.fromString(if (t == "none") "none"
          else graft.sources.PartitionSpecs.Spec(epoch, t, c, a).describe))))
      }
    }),
    // DECLARATIVE INCREMENTAL MATERIALIZED VIEW over the change feed
    // (graft.sources.MaterializedViews): `aggs` is a comma list of
    // 'op(col) as alias' with op in count|sum|avg (count(*) allowed);
    // `filter` an optional row-local predicate; refresh folds only the
    // base's CDC since the last refresh. Non-incrementalizable
    // aggregates refuse loudly at create.
    "create_materialized_view" -> (wh => new Proc("create_materialized_view",
      Seq(param("view", StringType), param("base", StringType),
        param("group_by", StringType), param("aggs", StringType),
        param("filter", StringType, "NULL")),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val AggShape = """(\w+)\(\s*([^)]*?)\s*\)\s+[aA][sS]\s+(\w+)""".r
        val aggs = in.getString(3).split(",").map(_.trim).filter(_.nonEmpty)
          .map {
            case AggShape(op, c, alias) =>
              graft.sources.MaterializedViews.AggDef(op,
                if (c.isEmpty) "*" else c, alias)
            case other => throw new IllegalArgumentException(
              s"cannot parse aggregate '$other' (want 'op(col) as alias')")
          }.toSeq
        val filter = if (in.isNullAt(4)) None else Option(in.getString(4))
        row(graft.sources.MaterializedViews.create(spark,
          path(wh, in.getString(0)), path(wh, in.getString(1)),
          in.getString(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          aggs, filter))
      }
    }),
    "refresh_mv" -> (wh => new Proc("refresh_mv",
      Seq(param("view", StringType)),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(graft.sources.MaterializedViews.refresh(spark,
          path(wh, in.getString(0))))
    }),
    // declare (or retire, with both args NULL-able via 0 sentinel
    // avoided: pass -1 to clear) the history-retention policy that
    // maintain()'s expiry step enforces
    "set_retention" -> (wh => new Proc("set_retention",
      Seq(param("table", StringType), param("keep_versions", IntegerType, "NULL"),
        param("keep_days", IntegerType, "NULL")),
      schema("policy" -> StringType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val p = path(wh, in.getString(0))
        val kv = if (in.isNullAt(1)) None else Some(in.getInt(1))
        val kd = if (in.isNullAt(2)) None else Some(in.getInt(2))
        if (kv.isEmpty && kd.isEmpty) {
          Snapshots.dropRetention(spark, p)
          Array(InternalRow.fromSeq(Seq(UTF8String.fromString("none"))))
        } else {
          Snapshots.setRetention(spark, p, kv, kd)
          Array(InternalRow.fromSeq(Seq(UTF8String.fromString(
            (kv.map(n => s"versions=$n").toSeq ++
              kd.map(d => s"days=$d")).mkString(",")))))
        }
      }
    }),
    "restore" -> (wh => new Proc("restore",
      Seq(param("table", StringType), param("version", LongType)),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.restore(spark, path(wh, in.getString(0)), in.getLong(1)))
    }),
    "vacuum" -> (wh => new Proc("vacuum",
      Seq(param("table", StringType), param("keep_versions", IntegerType, "1")),
      schema("files_deleted" -> IntegerType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.vacuum(spark, path(wh, in.getString(0)), in.getInt(1)))
    }),
    "gc" -> (wh => new Proc("gc",
      Seq(param("table", StringType),
        param("grace_ms", LongType, (24L * 3600 * 1000).toString)),
      schema("files_deleted" -> IntegerType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.gc(spark, path(wh, in.getString(0)), in.getLong(1)))
    }),
    "tag" -> (wh => new Proc("tag",
      Seq(param("table", StringType), param("name", StringType),
        param("version", LongType)),
      schema("tagged_version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        Snapshots.tag(spark, path(wh, in.getString(0)), in.getString(1),
          in.getLong(2))
        row(in.getLong(2))
      }
    }),
    "fork" -> (wh => new Proc("fork",
      Seq(param("table", StringType), param("branch", StringType)),
      schema("branch_version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.fork(spark, path(wh, in.getString(0)),
          path(wh, in.getString(1))))
    }),
    "fast_forward" -> (wh => new Proc("fast_forward",
      Seq(param("table", StringType), param("branch", StringType)),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.fastForward(spark, path(wh, in.getString(0)),
          path(wh, in.getString(1))))
    }),
    // the WAP-named alias of fast_forward: the audit workflow reads
    // fork -> audit -> PUBLISH, and the SQL surface should speak it
    "publish" -> (wh => new Proc("publish",
      Seq(param("table", StringType), param("branch", StringType)),
      schema("version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        row(Snapshots.fastForward(spark, path(wh, in.getString(0)),
          path(wh, in.getString(1))))
    }),
    "tags" -> (wh => new Proc("tags",
      Seq(param("table", StringType)),
      schema("name" -> StringType, "version" -> LongType)) {
      def run(in: InternalRow): Array[InternalRow] =
        Snapshots.tags(spark, path(wh, in.getString(0))).map { case (n, v) =>
          InternalRow.fromSeq(Seq(UTF8String.fromString(n), v))
        }.toArray
    }),
    // bloom-assisted point-lookup spec (BloomSkip): applies to files
    // written AFTER the call; cols = "k1:ndv1,k2:ndv2"
    "set_bloom" -> (wh => new Proc("set_bloom",
      Seq(param("table", StringType), param("cols", StringType)),
      schema("n_cols" -> IntegerType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val cols = in.getString(1).split(",").map(_.trim).filter(_.nonEmpty)
          .map { s =>
            s.split(":") match {
              case Array(c, n) => c.trim -> n.trim.toLong
              case _ => throw new IllegalArgumentException(
                s"set_bloom cols entry '$s' (expected col:ndv)")
            }
          }.toMap
        Snapshots.setBloomSpec(spark, path(wh, in.getString(0)), cols)
        row(cols.size)
      }
    }),
    // declared write sort order (Iceberg WRITE ORDERED BY): every
    // later write range-clusters on these columns; cols = "k1,k2"
    "set_write_order" -> (wh => new Proc("set_write_order",
      Seq(param("table", StringType), param("cols", StringType)),
      schema("n_cols" -> IntegerType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val cols = in.getString(1).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        Snapshots.setSortSpec(spark, path(wh, in.getString(0)), cols)
        row(cols.size)
      }
    }),
    "drop_write_order" -> (wh => new Proc("drop_write_order",
      Seq(param("table", StringType)),
      schema("dropped" -> BooleanType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        Snapshots.dropSortSpec(spark, path(wh, in.getString(0)))
        row(true)
      }
    }),
    "drop_bloom" -> (wh => new Proc("drop_bloom",
      Seq(param("table", StringType)),
      schema("dropped" -> BooleanType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        Snapshots.dropBloomSpec(spark, path(wh, in.getString(0)))
        row(true)
      }
    }),
    // version-ranged per-commit change feed (Delta's `table_changes`
    // shape, as a CALL): rows changed between from_version (exclusive)
    // and to_version (inclusive), each attributed to its
    // `_commit_version` with `_change_type` delete/insert — the SQL
    // face of Snapshots.changeFeedByVersion, same manifest-diff scan
    // set (added/removed/key-hit files only, never a history rescan).
    // The result is a procedure LocalScan, i.e. driver-materialized:
    // right-sized because a CALL's result set is the CHANGE set, not
    // the table, and changeFeedByVersion refuses over-wide ranges with
    // a window hint — a data-scale feed belongs on the streaming CDF
    // source (`readChangeFeed`), not on CALL.
    "table_changes" -> (wh => new DynProc("table_changes",
      Seq(param("table", StringType), param("from_version", LongType),
        param("to_version", LongType))) {
      def run(in: InternalRow): (StructType, Array[InternalRow]) = {
        val df = Snapshots.changeFeedByVersion(spark,
          path(wh, in.getString(0)), in.getLong(1), in.getLong(2))
        val sch = df.schema
        // a CALL's result set is driver-materialized: cap it LOUDLY
        // (limit cap+1, count the overflow) instead of letting a wide
        // DML's change set OOM the driver — the distributed consumers
        // (readChangeFeed stream / Scala changeFeedByVersion) have no
        // such bound and are the right tool past it
        val cap = spark.conf
          .get("graft.snapshot.procedureMaxRows", "1000000").toLong
        val rows = df.limit((cap + 1).min(Int.MaxValue).toInt).collect()
        require(rows.length <= cap,
          s"table_changes(${in.getString(0)}, v${in.getLong(1)} -> " +
            s"v${in.getLong(2)}): change set exceeds $cap rows " +
            "(graft.snapshot.procedureMaxRows) — a CALL's result is " +
            "driver-materialized; consume a feed this size through " +
            "readChangeFeed (streaming) or Snapshots.changeFeedByVersion")
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(sch)
        (sch, rows.map(r => conv(r).asInstanceOf[InternalRow]))
      }
    }),
    "history" -> (wh => new Proc("history",
      Seq(param("table", StringType)),
      schema("version" -> LongType, "token" -> StringType,
        "n_files" -> IntegerType)) {
      def run(in: InternalRow): Array[InternalRow] = {
        val t = path(wh, in.getString(0))
        Snapshots.history(spark, t)
          .select("version", "token", "n_files").collect().map { r =>
            InternalRow.fromSeq(Seq(r.getLong(0),
              if (r.isNullAt(1)) null else UTF8String.fromString(r.getString(1)),
              r.getInt(2)))
          }
      }
    }))
}
