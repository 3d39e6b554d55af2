package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once sink registration.
  *
  * The reference's sink is an in-memory hashmap rebuilt on every run
  * (reference hashmap.c:11-19); a Spark engine's sinks are durable files. At
  * 100 TB you bucket / hive-partition a table ONCE and amortize the write over
  * every downstream query — rerunning the writer before each read would make
  * the sink cost dominate the query cost. These helpers make sink setup
  * idempotent across JVMs: the first invocation pays the write, later
  * invocations detect the committer's `_SUCCESS` marker and reuse the files
  * (re-registering the catalog entry when the in-memory catalog of a fresh
  * JVM has forgotten the table).
  *
  * Inputs under `/root/testdata` are immutable, so marker presence implies
  * the derived sink is current; a crashed partial write leaves no `_SUCCESS`
  * and is rewritten.
  */
object Sinks {

  /** Run `write` (which must produce `dir` via a Hadoop committer) unless a
    * previous successful write already committed it. */
  def ensureDir(spark: SparkSession, dir: String)(write: => Unit): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(p, "_SUCCESS"))) write
  }

  /** Ensure a bucketed+sorted managed table exists for `df`. Fresh files are
    * written at most once per warehouse; a fresh JVM whose in-memory catalog
    * lost the entry re-registers an external table over the existing bucket
    * files (Spark recovers bucket ids from the `_0000N` file-name suffix). */
  def ensureBucketedTable(spark: SparkSession, table: String, df: => DataFrame,
      key: String, nBuckets: Int): Unit = {
    if (spark.catalog.tableExists(table)) return
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new Path(wh, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(loc, "_SUCCESS"))) {
      val schemaDdl = df.schema.toDDL
      spark.sql(
        s"""CREATE TABLE $table ($schemaDdl) USING PARQUET
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
           |LOCATION '${loc.toString}'""".stripMargin)
    } else {
      // a previous JVM's managed-table directory can survive in the warehouse
      // while the in-memory catalog forgets it — clear both layers before the
      // write so overwrite does not become CREATE at an existing location
      spark.sql(s"DROP TABLE IF EXISTS $table")
      fs.delete(loc, true)
      df.write.bucketBy(nBuckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(table)
    }
  }
}
