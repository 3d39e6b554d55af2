package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming COMMIT-LOG source over a [[SnapshotTable]] base: one row per
  * committed VERSION — `(version long, manifest string)` — with the
  * version number itself as the streaming offset. This is the seam that
  * turns the snapshot table into a CDC stream: a `foreachBatch` consumer
  * maps each emitted version to its O(delta) change window
  * ([[SnapshotTable.readChanges]] — inserts/deletes at key granularity;
  * version 1 is the initial-baseline window, read as all-inserts), so a
  * downstream incremental pipeline follows the table commit-by-commit
  * instead of diffing full scans — the Delta/Iceberg "table as a stream"
  * contract, here over the commit counter our format already has.
  *
  * Why versions-as-offsets is the right streaming contract at 100 TB:
  * a commit is O(manifest), discovery is ONE driver-side listing per
  * trigger ([[SnapshotTable.headVersion]]), and each emitted row is a
  * pointer, never data — batch COST lives in the consumer's readChanges,
  * which reads only the window's delta dirs. Restart safety is inherited
  * from the checkpoint: offsets are committed version numbers, so a
  * restarted query resumes at the exact commit frontier and replays at
  * most the one uncommitted batch (the consumer's window fold must be
  * idempotent — write-once epoch dirs, the engine's standing pattern).
  *
  * `maxVersionsPerTrigger` paces a backlog (a consumer down for a day
  * must not fold a thousand commits in one batch);
  * `startingVersion` opens the stream mid-history (default 1 — from the
  * baseline); `startingRef` opens it at a NAMED ref — since a tag, or
  * the branch-local commits of a WAP branch (the audit consumer tails
  * the branch as writers land versions, before any publish).
  * Vacuuming versions ABOVE a consumer's committed frontier
  * breaks its replay loudly (readChanges on a dropped manifest fails);
  * below the frontier it is invisible, matching the retention contract.
  */
class SnapshotCdfSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotCdfSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SnapshotCdfTable(properties.get("path"))
}

object SnapshotCdfSource {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("manifest", StringType, nullable = false)))
}

final class SnapshotCdfTable(base: String) extends Table with SupportsRead {
  require(base != null, "snapshot CDF source requires a single load(base)")

  override def name(): String = s"graft-snapshot-cdf:$base"
  override def schema(): StructType = SnapshotCdfSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val maxV = Option(options.get("maxVersionsPerTrigger")).map { v =>
          val n = v.toInt
          require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
          n
        }
        val startV = Option(options.get("startingVersion")).map { v =>
          val n = v.toInt
          require(n >= 1, s"startingVersion must be >= 1, got $n")
          n
        }
        // `startingRef` opens the stream at a NAMED ref (driver-side
        // resolution, one listing + one tiny ref read):
        //  - a TAG means "changes since the tagged version" — the tag is
        //    an immutable checkpoint, so restarts re-resolve identically;
        //  - a BRANCH means "the branch's own commits" — the stream
        //    rebases onto the branch base starting AFTER its v1 fork
        //    clone (the fork content is what the consumer already has),
        //    which is how a WAP auditor tails branch writes as they land.
        val ref = Option(options.get("startingRef"))
        require(startV.isEmpty || ref.isEmpty,
          "startingVersion and startingRef are mutually exclusive")
        val (effBase, start) = ref match {
          case None => (base, startV.getOrElse(1))
          case Some(r) =>
            val spark = org.apache.spark.sql.SparkSession.active
            SnapshotTable.readTagVersion(spark, base, r) match {
              case Some(v) => (base, v + 1)
              case None =>
                val bb = SnapshotTable.branchBase(base, r)
                require(SnapshotTable.headVersion(spark, bb) >= 1,
                  s"startingRef '$r' names no tag or branch under $base")
                (bb, 2)
            }
        }
        new SnapshotCdfScan(effBase, maxV, start)
      }
    }
}

final class SnapshotCdfScan(base: String, maxVersionsPerTrigger: Option[Int],
    startingVersion: Int) extends Scan {
  override def readSchema(): StructType = SnapshotCdfSource.Schema
  override def description(): String =
    s"graft-snapshot-cdf $base startingVersion: $startingVersion" +
      maxVersionsPerTrigger.map(n => s" maxVersionsPerTrigger: $n")
        .getOrElse("")

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SnapshotCdfStream(base, maxVersionsPerTrigger, startingVersion)
}

/** Offset = the last EMITTED version number (0 = nothing yet). Committed
  * versions are immutable and the counter is monotone (vacuum only drops
  * manifests, never renumbers), which is exactly the stable-replay
  * property a streaming offset needs. */
final case class SnapshotVersionOffset(v: Int) extends Offset {
  override def json(): String = s"""{"v":$v}"""
}

final class SnapshotCdfStream(base: String,
    maxVersionsPerTrigger: Option[Int], startingVersion: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def head(): Int = {
    // driver-side listing, same one headVersion does — sessions always
    // exist on the driver during planning
    val spark = org.apache.spark.sql.SparkSession.active
    SnapshotTable.headVersion(spark, base)
  }

  override def initialOffset(): Offset =
    SnapshotVersionOffset(startingVersion - 1)

  override def latestOffset(): Offset = SnapshotVersionOffset(head())

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.allAvailable() // pacing applies in latestOffset(start, _)

  /** Trigger.AvailableNow: freeze the head before the run — "fold the
    * commits that exist now in paced batches, then stop". */
  @volatile private var frozen: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit = frozen = Some(head())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapshotVersionOffset].v
    val avail = frozen.fold(head())(math.min(_, head()))
    val end = maxVersionsPerTrigger.fold(avail)(k => math.min(avail, s + k))
    SnapshotVersionOffset(math.max(s, end))
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = {
    val re = """\{"v":(\d+)\}""".r
    json match {
      case re(v) => SnapshotVersionOffset(v.toInt)
      case _ => throw new IllegalArgumentException(
        s"malformed snapshot CDF offset: $json")
    }
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotVersionOffset].v
    val e = end.asInstanceOf[SnapshotVersionOffset].v
    // replay safety: every version in the window must still be committed
    // (a vacuum past a consumer's frontier must fail LOUDLY here, not
    // emit a pointer to a missing manifest)
    val spark = org.apache.spark.sql.SparkSession.active
    for (v <- (s + 1) to e) {
      val mp = new Path(SnapshotTable.manifestFile(base, v))
      require(mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(mp),
        s"snapshot CDF window ($s, $e] references vacuumed version $v " +
          s"under $base — the consumer's frontier outlived retention; " +
          "re-baseline from a full read")
    }
    if (e <= s) Array.empty
    else Array(SnapshotCdfInputPartition(base, s + 1, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotCdfReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class SnapshotCdfInputPartition(base: String, fromV: Int,
    toV: Int) extends InputPartition

final class SnapshotCdfReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[SnapshotCdfInputPartition]
      private var v = part.fromV - 1
      override def next(): Boolean = { v += 1; v <= part.toV }
      override def get(): InternalRow =
        InternalRow(v.toLong,
          UTF8String.fromString(SnapshotTable.manifestFile(part.base, v)))
      override def close(): Unit = ()
    }
}
