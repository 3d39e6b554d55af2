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
  * Format: one line per file in a `_GRAFT_SKIP_INDEX` sidecar —
  * `path \t min \t max \t rows` — over an INTEGRAL key (exact-cents /
  * surrogate keys; lexical string ranges are a different index). Nulls
  * never enter the index bound (min/max ignore them) and null keys fail
  * any band predicate, so skipping a file whose bounds miss the band is
  * lossless. An all-null/empty file carries sentinel bounds that never
  * match, which is also lossless for the same reason.
  *
  * The index is built INSIDE the same `Sinks.ensureDir` block that writes
  * the files (one extra grouped scan at layer-build time), so a tag or
  * fingerprint bump rebuilds data and index atomically — a dir can never
  * read as fresh with a stale index.
  */
object SkipIndex {

  val IndexFile = "_GRAFT_SKIP_INDEX"

  case class PruneReport(total: Int, kept: Int)

  /** Write the min/max-per-file index for long column `keyCol` of the
    * parquet files under `dir`. One scan grouped by input file; the
    * collected result is file-count-sized (metadata, not data). */
  def build(spark: SparkSession, dir: String, keyCol: String): Unit = {
    val rows = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(keyCol).cast("long")).as("mn"),
        max(col(keyCol).cast("long")).as("mx"),
        count(lit(1)).as("n"))
      .collect()
    val lines = rows.map { r =>
      val f = r.getString(0)
      // all-null key: bounds that can never intersect a band (see scaladoc)
      val mn = if (r.isNullAt(1)) Long.MaxValue else r.getLong(1)
      val mx = if (r.isNullAt(2)) Long.MinValue else r.getLong(2)
      s"$f\t$mn\t$mx\t${r.getLong(3)}"
    }
    val p = new Path(dir, IndexFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((lines.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Band read `lo <= keyCol <= hi` over an indexed dir: prune files by
    * the sidecar bounds, scan only the survivors, and STILL apply the
    * predicate (skipping is an optimization, never the filter). A missing
    * index is a caller bug — the layer that wrote the files builds it —
    * and fails loudly rather than silently degrading to a full scan. */
  def prunedRead(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): (DataFrame, PruneReport) = {
    val p = new Path(dir, IndexFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"skip index missing under $dir — build() it in " +
      "the layer's ensureDir block")
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val entries = new String(buf, "UTF-8").split("\n").filter(_.nonEmpty)
      .map { l =>
        val c = l.split("\t")
        (c(0), c(1).toLong, c(2).toLong)
      }
    val kept = entries.collect { case (f, mn, mx) if mx >= lo && mn <= hi => f }
    val report = PruneReport(entries.length, kept.length)
    val df =
      if (kept.isEmpty)
        // schema still comes from the real files; the filter keeps nothing
        spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.where(col(keyCol).cast("long").between(lo, hi)), report)
  }
}
