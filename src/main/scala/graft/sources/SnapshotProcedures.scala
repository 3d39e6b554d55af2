package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

/** SQL stored procedures for snapshot-table MAINTENANCE — the Iceberg
  * `CALL catalog.system.<proc>(...)` surface, completing the catalog's SQL
  * story (DDL creates, DML mutates rows, procedures run the scheduled
  * rewrites that keep a 100 TB table healthy):
  *
  * {{{
  *   CALL snap.system.compact('t', 'k')          -- fold merge-on-read deletes
  *   CALL snap.system.optimize('t', 134217728)   -- bin-pack small dirs
  *   CALL snap.system.zorder('t', 'k', 'x,y', 16)-- Morton re-layout
  *   CALL snap.system.vacuum('t', 4)             -- retire versions < 4
  *   CALL snap.system.vacuum_retain('t', <ms>)   -- time-based retention
  *   CALL snap.system.restore('t', 2)            -- roll back (history kept)
  *   CALL snap.system.clone_table('src', 2, 'dst') -- zero-copy branch
  * }}}
  *
  * Each call runs the corresponding [[SnapshotTable]] op (same optimistic
  * version claims, same refusals) and returns its REPORT as the result
  * relation — so `CALL` output is auditable SQL data, not a log line.
  * Spark binds arguments positionally or by name against the declared
  * [[ProcedureParameter]]s and coerces types before `call` runs. */
private[sources] object SnapshotProcedures {

  private def spark: SparkSession = SparkSession.active

  /** One maintenance procedure: declared params, an output schema, and
    * the body mapping (base path, coerced args) → one report row. */
  private final case class Proc(pname: String, describe: String,
      params: Seq[(String, DataType)], out: StructType,
      body: (String, InternalRow) => Seq[Any])

  private def str(in: InternalRow, i: Int): String =
    in.getUTF8String(i).toString

  private val procs: Map[String, Proc] = Seq(
    Proc("compact",
      "fold the head's merge-on-read delete files into the data",
      Seq("tbl" -> StringType, "key" -> StringType),
      StructType.fromDDL("`version` INT, `dirs_rewritten` INT, " +
        "`dirs_kept` INT, `deletes_folded` INT"),
      (root, in) => {
        val r = SnapshotTable.compact(spark, s"$root/${str(in, 0)}",
          str(in, 1))
        Seq(r.version, r.dirsRewritten, r.dirsKept, r.deletesFolded)
      }),
    Proc("optimize",
      "bin-pack data dirs smaller than target_bytes into one dir",
      Seq("tbl" -> StringType, "target_bytes" -> LongType),
      StructType.fromDDL("`version` INT, `dirs_packed` INT, " +
        "`dirs_kept` INT"),
      (root, in) => {
        val r = SnapshotTable.optimizeSmallDirs(spark,
          s"$root/${str(in, 0)}", in.getLong(1))
        Seq(r.version, r.dirsPacked, r.dirsKept)
      }),
    Proc("zorder",
      "rewrite the head into Morton slices of the comma-joined columns",
      Seq("tbl" -> StringType, "key" -> StringType, "cols" -> StringType,
        "n_dirs" -> IntegerType),
      StructType.fromDDL("`version` INT, `dirs_in` INT, `dirs_out` INT"),
      (root, in) => {
        val cols = str(in, 2).split(",").map(_.trim).toSeq
        val r = SnapshotTable.optimizeZorder(spark, s"$root/${str(in, 0)}",
          str(in, 1), cols, in.getInt(3))
        Seq(r.version, r.dirsIn, r.dirsOut)
      }),
    Proc("vacuum",
      "drop manifests below keep_from and their orphaned dirs",
      Seq("tbl" -> StringType, "keep_from" -> IntegerType),
      StructType.fromDDL("`manifests_removed` INT, `dirs_removed` INT, " +
        "`dirs_live` INT"),
      (root, in) => {
        val base = s"$root/${str(in, 0)}"
        val r = SnapshotTable.vacuum(spark, base, in.getInt(1),
          SnapshotTable.headVersion(spark, base))
        Seq(r.manifestsRemoved, r.dirsRemoved, r.dirsLive)
      }),
    Proc("vacuum_retain",
      "time-based retention: keep the newest version at/before cutoff_ms " +
        "and everything after (the head always survives)",
      Seq("tbl" -> StringType, "cutoff_ms" -> LongType),
      StructType.fromDDL("`manifests_removed` INT, `dirs_removed` INT, " +
        "`dirs_live` INT"),
      (root, in) => {
        val r = SnapshotTable.vacuumOlderThan(spark,
          s"$root/${str(in, 0)}", in.getLong(1))
        Seq(r.manifestsRemoved, r.dirsRemoved, r.dirsLive)
      }),
    Proc("vacuum_dry_run",
      "what vacuum(keep_from) WOULD retire — same survey, zero deletions",
      Seq("tbl" -> StringType, "keep_from" -> IntegerType),
      StructType.fromDDL("`manifests_removed` INT, `dirs_removed` INT, " +
        "`dirs_live` INT"),
      (root, in) => {
        val base = s"$root/${str(in, 0)}"
        val r = SnapshotTable.vacuumDryRun(spark, base, in.getInt(1),
          SnapshotTable.headVersion(spark, base))
        Seq(r.manifestsRemoved, r.dirsRemoved, r.dirsLive)
      }),
    Proc("expire_dry_run",
      "what expire_snapshots(keep_from) WOULD retire — the same " +
        "ref-aware clamp, zero deletions",
      Seq("tbl" -> StringType, "keep_from" -> IntegerType),
      StructType.fromDDL("`manifests_removed` INT, `dirs_removed` INT, " +
        "`dirs_live` INT"),
      (root, in) => {
        val r = SnapshotTable.expireSnapshotsDryRun(spark,
          s"$root/${str(in, 0)}", in.getInt(1))
        Seq(r.manifestsRemoved, r.dirsRemoved, r.dirsLive)
      }),
    Proc("expire_snapshots",
      "vacuum clamped to the oldest tag/branch-fork version — named " +
        "refs never break",
      Seq("tbl" -> StringType, "keep_from" -> IntegerType),
      StructType.fromDDL("`manifests_removed` INT, `dirs_removed` INT, " +
        "`dirs_live` INT"),
      (root, in) => {
        val r = SnapshotTable.expireSnapshots(spark,
          s"$root/${str(in, 0)}", in.getInt(1))
        Seq(r.manifestsRemoved, r.dirsRemoved, r.dirsLive)
      }),
    Proc("analyze",
      "compute dir bounds for a stats column on every uncovered dir " +
        "(incremental; enables manifest dir pruning on existing tables)",
      Seq("tbl" -> StringType, "stats_col" -> StringType),
      StructType.fromDDL("`version` INT, `dirs_analyzed` INT, " +
        "`dirs_uncovered` INT"),
      (root, in) => {
        val r = SnapshotTable.analyzeBounds(spark,
          s"$root/${str(in, 0)}", str(in, 1))
        Seq(r.version, r.dirsAnalyzed, r.dirsUncovered)
      }),
    Proc("analyze_columns",
      "compute per-dir exact ndv/null counts for the comma-joined " +
        "columns (incremental; backfills row counts; the SQL reader " +
        "reports them to Catalyst for CBO sizing/broadcast decisions)",
      Seq("tbl" -> StringType, "cols" -> StringType),
      StructType.fromDDL("`version` INT, `entries_added` INT, " +
        "`entries_uncovered` INT"),
      (root, in) => {
        val cols = str(in, 1).split(",").map(_.trim).filter(_.nonEmpty)
        val r = SnapshotTable.analyzeColumnStats(spark,
          s"$root/${str(in, 0)}", cols.toSeq)
        Seq(r.version, r.entriesAdded, r.entriesUncovered)
      }),
    Proc("ingest_files",
      "COPY INTO: idempotently load a landing-zone glob's NEW files " +
        "(ledger-deduped by path+length+mtime; mutated files refuse)",
      Seq("tbl" -> StringType, "pattern" -> StringType),
      StructType.fromDDL("`version` INT, `files_added` INT, " +
        "`files_skipped` INT"),
      (root, in) => {
        val r = SnapshotTable.ingestFiles(spark,
          s"$root/${str(in, 0)}", str(in, 1))
        Seq(r.version, r.filesAdded, r.filesSkipped)
      }),
    Proc("add_check",
      "add a named CHECK constraint (boolean SQL expr over logical " +
        "columns): existing data is validated, then every later write " +
        "validates its batch — FALSE or NULL rows refuse the write",
      Seq("tbl" -> StringType, "name" -> StringType,
        "expr" -> StringType),
      StructType.fromDDL("`version` INT"),
      (root, in) => Seq(SnapshotTable.addCheck(spark,
        s"$root/${str(in, 0)}", str(in, 1), str(in, 2))),
    ),
    Proc("set_write_order",
      "declare WRITE ORDERED BY (metadata-only): later INSERTs " +
        "range-slice on the comma-joined columns into n_slices sorted " +
        "dirs with recorded bounds ('' + 0 clears)",
      Seq("tbl" -> StringType, "cols" -> StringType,
        "n_slices" -> IntegerType),
      StructType.fromDDL("`version` INT"),
      (root, in) => Seq(SnapshotTable.alterWriteOrder(spark,
        s"$root/${str(in, 0)}",
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        in.getInt(2)))),
    Proc("alter_partition_spec",
      "evolve the hidden-partitioning spec (metadata-only): new writes " +
        "route under the comma-joined transforms (e.g. 'days(d), " +
        "bucket(8, k)'; '' = unpartitioned), existing dirs stay pinned " +
        "to the spec that rendered their tuples and keep pruning",
      Seq("tbl" -> StringType, "spec" -> StringType),
      StructType.fromDDL("`version` INT"),
      (root, in) => Seq(SnapshotTable.alterPartitionSpec(spark,
        s"$root/${str(in, 0)}",
        graft.sources.PartitionSpec.parse(str(in, 1))))),
    Proc("drop_check",
      "drop a named CHECK constraint (idempotent)",
      Seq("tbl" -> StringType, "name" -> StringType),
      StructType.fromDDL("`version` INT"),
      (root, in) => Seq(SnapshotTable.dropCheck(spark,
        s"$root/${str(in, 0)}", str(in, 1)))),
    Proc("restore",
      "commit head+1 with an old version's exact manifest (history kept)",
      Seq("tbl" -> StringType, "to_version" -> IntegerType),
      StructType.fromDDL("`version` INT"),
      (root, in) => Seq(SnapshotTable.restore(spark,
        s"$root/${str(in, 0)}", in.getInt(1)))),
    Proc("clone_table",
      "zero-copy shallow clone of src@src_version as dst's v1",
      Seq("src" -> StringType, "src_version" -> IntegerType,
        "dst" -> StringType),
      StructType.fromDDL("`version` INT"),
      (root, in) => {
        SnapshotTable.cloneAt(spark, s"$root/${str(in, 0)}", in.getInt(1),
          s"$root/${str(in, 2)}")
        Seq(1)
      }),
    Proc("create_tag",
      "immutable named ref to a committed version (VERSION AS OF 'name')",
      Seq("tbl" -> StringType, "name" -> StringType,
        "version" -> IntegerType),
      StructType.fromDDL("`version` INT"),
      (root, in) => {
        SnapshotTable.createTag(spark, s"$root/${str(in, 0)}",
          str(in, 1), in.getInt(2))
        Seq(in.getInt(2))
      }),
    Proc("create_branch",
      "zero-copy WAP branch forked from main's head; write via the API, " +
        "audit via VERSION AS OF 'name', publish via fast_forward",
      Seq("tbl" -> StringType, "name" -> StringType),
      StructType.fromDDL("`fork_version` INT"),
      (root, in) => Seq(SnapshotTable.createBranch(spark,
        s"$root/${str(in, 0)}", str(in, 1)))),
    Proc("fast_forward",
      "publish a WAP branch: commit its head manifest onto main " +
        "(refuses when main advanced past the fork)",
      Seq("tbl" -> StringType, "name" -> StringType),
      StructType.fromDDL("`version` INT"),
      (root, in) => Seq(SnapshotTable.publishBranch(spark,
        s"$root/${str(in, 0)}", str(in, 1)))),
    Proc("drop_tag",
      "drop a tag (releases its expire_snapshots retention clamp)",
      Seq("tbl" -> StringType, "name" -> StringType),
      StructType.fromDDL("`dropped` BOOLEAN"),
      (root, in) => {
        SnapshotTable.dropTag(spark, s"$root/${str(in, 0)}", str(in, 1))
        Seq(true)
      }),
    Proc("drop_branch",
      "drop a branch and its local dirs (refuses while main still " +
        "references them — vacuum past the publish first)",
      Seq("tbl" -> StringType, "name" -> StringType),
      StructType.fromDDL("`dropped` BOOLEAN"),
      (root, in) => {
        SnapshotTable.dropBranch(spark, s"$root/${str(in, 0)}", str(in, 1))
        Seq(true)
      })
  ).map(p => p.pname -> p).toMap

  def names: Seq[String] = procs.keys.toSeq.sorted

  def load(name: String, root: String): Option[UnboundProcedure] =
    procs.get(name).map { p =>
      new UnboundProcedure {
        override def name(): String = p.pname
        override def description(): String = p.describe
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = p.pname
            override def description(): String = p.describe
            override def isDeterministic: Boolean = false
            override def parameters(): Array[ProcedureParameter] =
              p.params.map { case (n, t) =>
                ProcedureParameter.in(n, t).build()
              }.toArray
            override def call(input: InternalRow)
                : java.util.Iterator[Scan] =
              java.util.Collections.singletonList[Scan](
                new LocalRowsScan(p.pname, p.out,
                  Seq(p.body(root, input)))).iterator()
          }
      }
    }
}
