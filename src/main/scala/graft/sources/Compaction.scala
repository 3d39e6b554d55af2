package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the object-store hygiene operator.
  *
  * A 100 TB corpus accumulates small files from streaming micro-batch sinks,
  * per-key partitioned writes, and media ingest (one object per document —
  * the measured `mm_binsource` shape, where 5000 tiny PGM files cost ~8s of
  * per-file open/footer tax per scan at sf0.1). Every downstream scan then
  * pays per-file costs that dwarf the byte costs. Compaction rewrites a
  * directory into ceil(bytes / targetBytes) files — ONE round-robin shuffle
  * sized by the data, the unavoidable floor for a rewrite — after which
  * every later scan amortizes it.
  *
  * The reference has no durable sink at all (an in-memory hashmap, reference
  * hashmap.c:11-19); this is charter §2.2 sink-management surface.
  */
object Compaction {

  /** `filesBefore`/`bytesBefore` describe the small-files input;
    * `filesTarget` is the computed ceil(bytes/target); `filesAfter` is what
    * the committer produced (== filesTarget when every output partition is
    * non-empty, which row counts >> file counts guarantee). */
  final case class Report(filesBefore: Long, bytesBefore: Long,
      filesTarget: Int, filesAfter: Long)

  /** Data part-files of a committed dir (markers and sidecars excluded). */
  def partFiles(spark: SparkSession, dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(f => f.isFile &&
      f.getPath.getName.startsWith("part-"))
  }

  /** Rewrite the parquet dir `inDir` into `outDir` with ~targetBytes files.
    * The listing is driver-side but directory-sized (one RPC — at 100 TB
    * compaction runs per partition directory, keeping each listing bounded);
    * the data moves through one repartition shuffle, never the driver. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Report = {
    require(targetBytes > 0,
      s"compact: targetBytes must be positive, got $targetBytes")
    val before = partFiles(spark, inDir)
    val bytes = before.map(_.getLen).sum
    val nL = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    // a silent Long→Int wrap would repartition to a garbage count; a file
    // count past Int range means targetBytes is absurd for the data
    require(nL <= Int.MaxValue,
      s"compact: ceil($bytes/$targetBytes) = $nL output files exceeds " +
        "Int range — raise targetBytes")
    val n = nL.toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    Report(before.size, bytes, n, partFiles(spark, outDir).size)
  }
}
