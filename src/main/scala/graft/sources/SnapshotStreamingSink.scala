package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** `writeStream.toTable("snap.t")` — the NATIVE Structured Streaming
  * sink for snapshot tables (r18 verdict #6: exactly-once ingest through
  * the builtin API shape, no foreachBatch plumbing).
  *
  * Exactly-once rides the manifest, which is already the table's atomic
  * commit point:
  *
  *  1. executor writers land plain parquet into a per-(query, epoch)
  *     STAGING dir — task retries/speculation write distinct task-id
  *     files, and only files named in COMMITTED task messages move on;
  *  2. the driver's epoch commit moves exactly those files into a final
  *     dir whose name is DETERMINISTIC in (queryId, epochId) — queryId
  *     is checkpoint-stable across restarts, so a replayed epoch after
  *     a crash maps to the same dir;
  *  3. the dir folds into the manifest through the same bounded OCC
  *     loop every writer uses. Replay detection is "dir already in the
  *     head manifest" — the one fact that IS the committed state, so a
  *     re-delivered epoch commits nothing and duplicates nothing.
  *
  * A crash between dir-finalize and manifest-fold leaves a finalized
  * dir no manifest references; the replay deletes and re-lands it.
  * CHECK constraints validate the LANDED bytes before the fold (the
  * ingestBatch re-delivery rule). Append-only: complete/truncate modes
  * refuse. At 100 TB each epoch is one manifest commit + O(epoch) data
  * bytes — the same shape as the foreachBatch path, now under the
  * builtin API. */
final class SnapshotStreamingWrite(base: String, queryId: String,
    schema: StructType, renames: Map[String, String])
    extends StreamingWrite {

  private val qid = queryId.replaceAll("[^0-9a-fA-F]", "").take(12)
  private def stagingDir(epochId: Long) =
    s"$base/_streamstage/$qid/e$epochId"
  private[sources] def epochDir(epochId: Long) =
    s"$base/_streamepoch_${qid}_e$epochId"

  // fail at QUERY START, not first row: the Group-API writer covers the
  // flat primitive surface snapshot schemas use; anything else refuses
  SnapshotParquetOut.messageType(schema, renames): Unit

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new SnapshotEpochWriterFactory(stagingPrefix = s"$base/_streamstage/$qid",
      schema, renames, KvTextSource.sessionConfMap())

  private def fs(p: Path) = p.getFileSystem(
    SparkSession.active.sparkContext.hadoopConfiguration)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = epochDir(epochId)
    val dp = new Path(dir)
    val f = fs(dp)
    def sweepStaging(): Unit = {
      f.delete(new Path(stagingDir(epochId)), true)
      try f.delete(new Path(s"$base/_streamstage/$qid"), false)
      catch { case _: java.io.IOException => () }
      ()
    }
    val head0 = SnapshotTable.headVersion(spark, base)
    require(head0 >= 1,
      s"no committed snapshot under $base — CREATE TABLE first")
    if (SnapshotTable.manifest(spark, base, head0).dataDirs.contains(dir)) {
      sweepStaging() // replayed epoch: already committed, change nothing
      return
    }
    val files = messages.toSeq.collect {
      case m: SnapshotEpochFileMsg => m }
    val rows = files.map(_.rows).sum
    if (rows == 0L) { sweepStaging(); return } // empty epoch: no version
    // a prior attempt that died between finalize and fold left a dir no
    // manifest references — rebuild it from this attempt's files
    if (f.exists(dp)) f.delete(dp, true)
    f.mkdirs(dp)
    for (m <- files if m.rows > 0) {
      val src = new Path(m.path)
      require(f.rename(src, new Path(dp, src.getName)),
        s"epoch finalize rename failed: ${m.path} -> $dir")
    }
    f.create(new Path(dp, "_SUCCESS"), true).close()
    sweepStaging()
    // fold through the OCC loop, re-validating CHECKs against the
    // LANDED bytes (deterministic however the plan behaved) and
    // refusing loudly on mid-stream schema-evolution drift
    var validated: Seq[(String, String)] = null
    var attempt = 0
    while (attempt < 20) {
      attempt += 1
      val head = SnapshotTable.headVersion(spark, base)
      val prior = SnapshotTable.manifest(spark, base, head)
      if (prior.dataDirs.contains(dir)) return
      require(prior.renames == renames,
        s"schema evolution landed while streaming query $qid was " +
          "writing — restart the query against the current table state")
      if (prior.checks.nonEmpty && prior.checks != validated) {
        SnapshotTable.enforceChecks(spark, prior,
          spark.read.parquet(dir), s"stream epoch $epochId"): Unit
        validated = prior.checks
      }
      try {
        SnapshotTable.commit(spark, base, head + 1, prior.copy(
          dataDirs = prior.dataDirs :+ dir,
          rowCounts = prior.rowCounts + (dir -> rows)))
        return
      } catch {
        case e: IllegalArgumentException
            if attempt < 20 && e.getMessage != null && e.getMessage
              .contains("already committed with different content") => ()
        case _: java.nio.file.FileAlreadyExistsException
            if attempt < 20 => ()
      }
    }
    throw new IllegalStateException(
      s"stream epoch $epochId could not claim a version under $base " +
        "after 20 attempts — a committer is racing every retry")
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(new Path(base))
    f.delete(new Path(stagingDir(epochId)), true): Unit
  }
}

final case class SnapshotEpochFileMsg(path: String, rows: Long)
    extends WriterCommitMessage

final class SnapshotEpochWriterFactory(stagingPrefix: String,
    schema: StructType, renames: Map[String, String],
    confMap: Map[String, String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new SnapshotEpochDataWriter(
      s"$stagingPrefix/e$epochId/part-$partitionId-$taskId.parquet",
      schema, renames, confMap)
}

/** One task's parquet writer over the flat primitive surface (the
  * parquet-hadoop Group API — no Spark-internal writer machinery).
  * Lands the table's PHYSICAL column names directly, so rename-evolved
  * tables read the files through their normal name mapping. */
final class SnapshotEpochDataWriter(file: String, schema: StructType,
    renames: Map[String, String], confMap: Map[String, String])
    extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.io.api.Binary

  private val msgType = SnapshotParquetOut.messageType(schema, renames)
  private val conf = KvTextSource.confFrom(confMap)
  private val writer = {
    org.apache.parquet.hadoop.example.GroupWriteSupport
      .setSchema(msgType, conf)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(new Path(file), conf))
      .withConf(conf)
      .withType(msgType)
      .build()
  }
  private val factory = new SimpleGroupFactory(msgType)
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = msgType.getFieldName(i)
        schema.fields(i).dataType match {
          case LongType => g.add(name, row.getLong(i))
          case IntegerType => g.add(name, row.getInt(i))
          case DoubleType => g.add(name, row.getDouble(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case StringType =>
            g.add(name, Binary.fromString(row.getUTF8String(i).toString))
          case DateType => g.add(name, row.getInt(i))
          case TimestampType => g.add(name, row.getLong(i))
          case other => throw new IllegalStateException(
            s"unreachable: $other passed messageType validation")
        }
      }
      i += 1
    }
    writer.write(g)
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    SnapshotEpochFileMsg(file, n)
  }

  override def abort(): Unit = {
    writer.close()
    val p = new Path(file)
    p.getFileSystem(conf).delete(p, false): Unit
  }

  override def close(): Unit = ()
}

/** StructType → parquet MessageType for the streaming writer: flat
  * primitives only (the snapshot hash-gate surface), every field
  * OPTIONAL (Spark projections are nullable by default), names mapped
  * to the table's frozen PHYSICAL names. */
private[sources] object SnapshotParquetOut {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  def messageType(schema: StructType,
      renames: Map[String, String]): MessageType = {
    val b = Types.buildMessage()
    for (f <- schema.fields) {
      val name = renames.getOrElse(f.name, f.name)
      val t = f.dataType match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType => Types.optional(DOUBLE)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case DateType => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new IllegalArgumentException(
          s"streaming into a snapshot table supports flat primitive " +
            s"columns (long/int/double/boolean/string/date/timestamp); " +
            s"column ${f.name} is ${other.simpleString}")
      }
      b.addField(t.named(name))
    }
    b.named("graft_snapshot_epoch")
  }
}
