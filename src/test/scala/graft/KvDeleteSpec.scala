package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SQL DELETE FROM through the KV connector (KvTable.deleteWhere — a
  * rewrite op: survivors re-land through the truncating 2PC overwrite).
  * Covers flat and sharded dirs (markers and layout survive), NULL-safe
  * predicate semantics by construction, empty-survivor deletes, the
  * untranslatable-predicate refusal, and idempotence. */
class KvDeleteSpec extends SparkTestBase {

  private val fmt = classOf[graft.sources.KvTextSource].getName

  private def writeKv(dir: String, rows: Seq[(String, Long)],
      shards: Option[Int] = None): Unit = {
    import spark.implicits._
    val w = rows.toDF("key", "value")
    val base = shards.fold(w)(n =>
      w.withColumn("shard",
        pmod(hash(col("key")), lit(n)).cast("int")))
    val wr = base.write.format(fmt).mode("overwrite")
    shards.fold(wr)(n => wr.option("shards", n)).save(dir)
  }

  private def readAll(dir: String): Seq[(String, Long)] =
    spark.read.format(fmt).load(dir).select("key", "value")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted

  test("DELETE FROM a flat dir rewrites survivors; repeat is a no-op") {
    val d = Files.createTempDirectory("kvdel").toString
    writeKv(d, Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
    spark.sql("DROP TABLE IF EXISTS kvdel_flat")
    spark.sql(s"CREATE TABLE kvdel_flat USING $fmt OPTIONS (path '$d')")
    spark.sql("DELETE FROM kvdel_flat WHERE value >= 3 OR key = 'a'")
    assert(readAll(d) == Seq(("b", 2L)))
    spark.sql("DELETE FROM kvdel_flat WHERE value >= 3 OR key = 'a'")
    assert(readAll(d) == Seq(("b", 2L)), "re-delete must be a no-op")
    // deleting everything leaves a readable empty table
    spark.sql("DELETE FROM kvdel_flat WHERE value > 0")
    assert(spark.sql("SELECT COUNT(*) FROM kvdel_flat").head.getLong(0)
      == 0)
  }

  test("DELETE FROM a sharded dir keeps the shard layout and the " +
      "point-lookup path") {
    val d = Files.createTempDirectory("kvdelsh").toString
    val rows = (0 until 100).map(i => (f"k$i%03d", i.toLong))
    writeKv(d, rows, shards = Some(4))
    assert(graft.sources.KvTextSource.shardCount(d).contains(4))
    spark.sql("DROP TABLE IF EXISTS kvdel_sh")
    spark.sql(s"CREATE TABLE kvdel_sh USING $fmt OPTIONS (path '$d')")
    spark.sql("DELETE FROM kvdel_sh WHERE value < 50")
    assert(graft.sources.KvTextSource.shardCount(d).contains(4),
      "the rewrite must preserve the shard layout")
    assert(readAll(d) == rows.filter(_._2 >= 50).sorted)
    // the survivors still serve a pruned point lookup
    val probe = spark.read.format(fmt).load(d).where(col("key") === "k075")
    assert(probe.collect().map(_.getLong(1)).toSeq == Seq(75L))
  }

  test("an untranslatable predicate refuses loudly instead of deleting " +
      "the wrong rows") {
    val d = Files.createTempDirectory("kvdelref").toString
    writeKv(d, Seq(("a", 1L), ("ba", 2L)))
    spark.sql("DROP TABLE IF EXISTS kvdel_ref")
    spark.sql(s"CREATE TABLE kvdel_ref USING $fmt OPTIONS (path '$d')")
    intercept[Exception] {
      spark.sql("DELETE FROM kvdel_ref WHERE key LIKE '%a'")
    }
    assert(readAll(d) == Seq(("a", 1L), ("ba", 2L)),
      "a refused DELETE must not touch the data")
    // prefix LIKE IS translatable (StringStartsWith)
    spark.sql("DELETE FROM kvdel_ref WHERE key LIKE 'b%'")
    assert(readAll(d) == Seq(("a", 1L)))
  }
}
