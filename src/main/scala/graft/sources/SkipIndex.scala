package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stats-based FILE skipping — the lakehouse data-skipping index.
  *
  * Partition pruning (q_partitioned_scan) prunes directories by partition
  * VALUE; this index prunes individual FILES by min/max statistics of a
  * non-partition sort key, the complementary lakehouse primitive: a table
  * laid out by range (repartitionByRange / z-order) has near-disjoint
  * per-file key ranges, so a band predicate touches k of N files and the
  * other N−k are skipped WITHOUT reading even their parquet footers. At
  * 100 TB with ~10⁶ files that is the difference between a driver-side
  * sidecar lookup (one small read) and a distributed footer sweep — parquet
  * row-group stats still prune WITHIN the files that survive; this index
  * sits above them.
  *
  * Format (v2, multi-column): a `_GRAFT_SKIP_INDEX` sidecar whose first
  * line is the header `#graft-skip-index \t v2 \t col1 [\t col2 ...]`,
  * then one line per file — `path \t mn1 \t mx1 [\t mn2 \t mx2 ...] \t
  * rows` — over INTEGRAL keys (exact-cents / surrogate keys; lexical
  * string ranges are a different index). Carrying SEVERAL columns' bounds
  * per file is what makes the index compose with the Z-ORDER layout
  * (operators/Layout): Morton clustering gives every participating column
  * a tight per-file extent, so a 2-D band prunes on BOTH columns from one
  * sidecar — the single-column form (a plain range layout) is just the
  * one-key special case. Nulls never enter the index bound (min/max
  * ignore them) and null keys fail any band predicate, so skipping a file
  * whose bounds miss the band is lossless. An all-null/empty file carries
  * sentinel bounds that never match, which is also lossless for the same
  * reason.
  *
  * The index is built INSIDE the same `Sinks.ensureDir` block that writes
  * the files (one extra grouped scan at layer-build time), so a tag or
  * fingerprint bump rebuilds data and index atomically — a dir can never
  * read as fresh with a stale index. (The v1→v2 format change rode
  * exactly that mechanism: bumping the layer tags rebuilt data + sidecar
  * together; an unrecognized header fails loudly below.)
  */
object SkipIndex {

  val IndexFile = "_GRAFT_SKIP_INDEX"
  private val Magic = "#graft-skip-index"

  case class PruneReport(total: Int, kept: Int)

  /** Single-key index — the one-column special case of [[buildMulti]]. */
  def build(spark: SparkSession, dir: String, keyCol: String): Unit =
    buildMulti(spark, dir, Seq(keyCol))

  /** Write the min/max-per-file index for long columns `keyCols` of the
    * parquet files under `dir`. One scan grouped by input file; the
    * collected result is file-count-sized (metadata, not data). */
  def buildMulti(spark: SparkSession, dir: String,
      keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "skip index needs at least one key column")
    val aggs = keyCols.flatMap(k => Seq(
      min(col(k).cast("long")).as(s"mn_$k"),
      max(col(k).cast("long")).as(s"mx_$k"))) :+ count(lit(1)).as("n")
    val rows = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val lines = rows.map { r =>
      val f = r.getString(0)
      val bounds = keyCols.indices.flatMap { i =>
        // all-null key: bounds that can never intersect a band (scaladoc)
        val mn = if (r.isNullAt(1 + 2 * i)) Long.MaxValue
          else r.getLong(1 + 2 * i)
        val mx = if (r.isNullAt(2 + 2 * i)) Long.MinValue
          else r.getLong(2 + 2 * i)
        Seq(mn, mx)
      }
      (f +: bounds.map(_.toString) :+
        r.getLong(1 + 2 * keyCols.size).toString).mkString("\t")
    }
    val header = (Magic +: "v2" +: keyCols).mkString("\t")
    val p = new Path(dir, IndexFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((header + "\n" + lines.sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Parse the sidecar: (indexed columns, per-file (path, bounds-per-col)).
    * Loud on absence or an unrecognized header — both are layer bugs, and
    * silently degrading to a full scan would defeat the index's purpose. */
  private def readIndex(spark: SparkSession, dir: String)
      : (Seq[String], Array[(String, IndexedSeq[(Long, Long)])]) = {
    val p = new Path(dir, IndexFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"skip index missing under $dir — build() it in " +
      "the layer's ensureDir block")
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val lines = new String(buf, "UTF-8").split("\n").filter(_.nonEmpty)
    require(lines.nonEmpty && lines.head.startsWith(Magic + "\tv2\t"),
      s"unrecognized skip-index format under $dir — rebuild the layer " +
        "(bump its tag) to refresh the sidecar")
    val cols = lines.head.split("\t").drop(2).toSeq
    val entries = lines.tail.map { l =>
      val c = l.split("\t")
      (c(0), cols.indices.map(i => (c(1 + 2 * i).toLong, c(2 + 2 * i).toLong)))
    }
    (cols, entries)
  }

  /** Band read `lo <= keyCol <= hi` — the one-band special case of
    * [[prunedReadBands]]. */
  def prunedRead(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): (DataFrame, PruneReport) =
    prunedReadBands(spark, dir, Seq((keyCol, lo, hi)))

  /** Multi-band read over an indexed dir: a file survives only when EVERY
    * band intersects its bounds for that column, so over a z-ordered
    * layout a 2-D rectangle prunes in both dimensions from the one
    * sidecar. Survivors are scanned and the predicates STILL apply
    * (skipping is an optimization, never the filter). Asking for a column
    * the index never measured fails loudly. */
  def prunedReadBands(spark: SparkSession, dir: String,
      bands: Seq[(String, Long, Long)]): (DataFrame, PruneReport) = {
    require(bands.nonEmpty, "prunedReadBands needs at least one band")
    val (cols, entries) = readIndex(spark, dir)
    val idx = bands.map { case (k, lo, hi) =>
      val i = cols.indexOf(k)
      require(i >= 0, s"column $k is not in the skip index " +
        s"(indexed: ${cols.mkString(", ")}) — rebuild the layer with it")
      (i, lo, hi)
    }
    val kept = entries.collect {
      case (f, bs) if idx.forall { case (i, lo, hi) =>
        bs(i)._2 >= lo && bs(i)._1 <= hi } => f
    }
    val report = PruneReport(entries.length, kept.length)
    val df =
      if (kept.isEmpty)
        // schema still comes from the real files; the filter keeps nothing
        spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    val pred = bands.map { case (k, lo, hi) =>
      col(k).cast("long").between(lo, hi) }.reduce(_ && _)
    (df.where(pred), report)
  }
}
