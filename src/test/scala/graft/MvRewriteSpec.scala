package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MvCatalog

/** Transparent MV routing: a freshly-CONSTRUCTED aggregate (new attribute
  * ids, new file-index instances) must match the registered definition via
  * canonicalized equality, results must be identical either way, staleness
  * must fall back to the base plan, and non-matching aggregates must pass
  * through untouched.
  */
class MvRewriteSpec extends SparkTestBase {

  private def freshDir(): String =
    Files.createTempDirectory("graft-mv").toString

  test("matching aggregate is served from the MV with identical results") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 100L).map(i => (i, s"g${i % 5}", i * 3)).toDF("id", "g", "v")
      .write.parquet(base)
    def agg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, agg(), mv, "v1:test-mv", Seq(base))
      val q = agg()
      assert(MvCatalog.servedFromMv(q, mv),
        "rewrite did not engage on a freshly-constructed matching aggregate")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = agg().collect().map(_.toString).sorted.toSeq
      assert(got == direct, "MV-served results diverge from direct aggregate")
    } finally MvCatalog.clear(spark)
  }

  test("parents above the rewritten aggregate still resolve (sort + filter)") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 60L).map(i => (i, s"k${i % 3}")).toDF("id", "k").write.parquet(base)
    def agg() = spark.read.parquet(base).groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    try {
      MvCatalog.register(spark, agg(), mv, "v1:test-mv2", Seq(base))
      val q = agg().where(col("n") > 0).orderBy(col("k").desc)
      assert(MvCatalog.servedFromMv(q, mv))
      assert(q.select("k").as[String].collect().toSeq == Seq("k2", "k1", "k0"))
    } finally MvCatalog.clear(spark)
  }

  test("changed base data disables the MV (freshness gate) and results are fresh") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 10L).map(i => (i, "a")).toDF("id", "g").write.parquet(base)
    def agg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    try {
      MvCatalog.register(spark, agg(), mv, "v1:test-mv3", Seq(base))
      // base grows AFTER materialization: the fingerprint no longer matches
      (11L to 30L).map(i => (i, "a")).toDF("id", "g")
        .write.mode("append").parquet(base)
      val q = agg()
      assert(!MvCatalog.servedFromMv(q, mv),
        "stale MV must not serve a query over changed base data")
      assert(q.collect().head.getLong(1) == 30L, "fallback must see new rows")
    } finally MvCatalog.clear(spark)
  }

  test("a different aggregate over the same base is not rewritten") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 20L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v")
      .write.parquet(base)
    def agg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    try {
      MvCatalog.register(spark, agg(), mv, "v1:test-mv4", Seq(base))
      val other = spark.read.parquet(base).groupBy(col("g"))
        .agg(sum(col("v")).as("sv")) // different aggregate list
      assert(!MvCatalog.servedFromMv(other, mv))
      val byId = spark.read.parquet(base).groupBy(col("id"))
        .agg(count(lit(1)).as("n")) // different grouping
      assert(!MvCatalog.servedFromMv(byId, mv))
    } finally MvCatalog.clear(spark)
  }

  test("rollup: a subset-key aggregate re-aggregates from the MV") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 200L).map(i => (i, s"g${i % 4}", s"h${i % 7}", i * 3))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    def roll() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-roll", Seq(base))
      val q = roll()
      assert(MvCatalog.servedFromMv(q, mv),
        "subset-key aggregate did not route through the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = roll().collect().map(_.toString).sorted.toSeq
      assert(got == direct, "rolled-up results diverge from direct aggregate")
    } finally MvCatalog.clear(spark)
  }

  test("rollup: a global aggregate (empty grouping) rolls up from the MV") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 150L).map(i => (i, s"g${i % 5}", i)).toDF("id", "g", "v")
      .write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def glob() = spark.read.parquet(base)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-glob", Seq(base))
      val q = glob()
      assert(MvCatalog.servedFromMv(q, mv),
        "global aggregate did not route through the MV")
      val got = q.collect().head
      MvCatalog.clear(spark)
      val direct = glob().collect().head
      assert(got == direct)
    } finally MvCatalog.clear(spark)
  }

  test("rollup: non-derivable aggregates fall back to the base table") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 90L).map(i => (i, s"g${i % 3}", s"h${i % 2}", i))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-bail", Seq(base))
      // countDistinct cannot re-aggregate from per-group counts
      val cd = spark.read.parquet(base).groupBy(col("g"))
        .agg(countDistinct(col("v")).as("nd"))
      assert(!MvCatalog.servedFromMv(cd, mv))
      assert(cd.collect().map(_.getLong(1)).sum == 90L)
      // avg is not a bare sum/count/min/max — conservative bail
      val av = spark.read.parquet(base).groupBy(col("g"))
        .agg(avg(col("v")).as("a"))
      assert(!MvCatalog.servedFromMv(av, mv))
      // an aggregate over a column the MV never measured
      val sid = spark.read.parquet(base).groupBy(col("g"))
        .agg(sum(col("id")).as("si"))
      assert(!MvCatalog.servedFromMv(sid, mv))
    } finally MvCatalog.clear(spark)
  }

  test("rollup: an MV over a JOIN subtree serves coarser slices of it") {
    import spark.implicits._
    val baseF = freshDir() + "/fact"
    val baseD = freshDir() + "/dim"
    val mv = freshDir() + "/mv"
    (1L to 120L).map(i => (i, i % 6, i * 10)).toDF("id", "dk", "v")
      .write.parquet(baseF)
    (0L to 5L).map(d => (d, s"seg${d % 2}", s"name$d")).toDF("k", "seg", "nm")
      .write.parquet(baseD)
    def joined() = spark.read.parquet(baseF)
      .join(spark.read.parquet(baseD), col("dk") === col("k"))
    def mvAgg() = joined().groupBy(col("seg"), col("nm"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def roll() = joined().groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-join-roll",
        Seq(baseF, baseD))
      val q = roll()
      assert(MvCatalog.servedFromMv(q, mv),
        "coarser aggregate over the join did not route through the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = roll().collect().map(_.toString).sorted.toSeq
      assert(got == direct)
    } finally MvCatalog.clear(spark)
  }

  test("snapshot-registered MV: freshness keys on the committed head " +
      "version, not a file fingerprint") {
    import spark.implicits._
    import graft.sources.{SnapshotTable => ST}
    val base = freshDir() + "/snap"
    val mv = freshDir() + "/mv"
    val d1 = s"$base/d1"
    (1L to 60L).map(i => (i, s"g${i % 3}", i)).toDF("k", "g", "v")
      .write.parquet(d1)
    ST.commit(spark, base, 1, ST.Snapshot(Seq(d1), Nil))
    def agg(ver: Int) = ST.readVersion(spark, base, ver, "k")
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      val v = MvCatalog.registerSnapshot(spark, agg(1), mv, "v1:snapmv", base)
      assert(v == 1)
      assert(MvCatalog.servedFromMv(agg(1), mv),
        "head-version MV did not serve")
      // a new commit moves the head: the view silently disables — even for
      // the structurally-identical v1 aggregate — until re-registration
      val d2 = s"$base/d2"
      (61L to 90L).map(i => (i, s"g${i % 3}", i)).toDF("k", "g", "v")
        .write.parquet(d2)
      ST.commit(spark, base, 2, ST.Snapshot(Seq(d1, d2), Nil))
      assert(!MvCatalog.servedFromMv(agg(1), mv),
        "superseded-head MV must not serve after a commit")
      // re-registering at the new head rebuilds the layer (tag carries the
      // version) and serves the v2 aggregate
      val v2 = MvCatalog.registerSnapshot(spark, agg(2), mv, "v1:snapmv", base)
      assert(v2 == 2)
      val q = agg(2)
      assert(MvCatalog.servedFromMv(q, mv))
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = agg(2).collect().map(_.toString).sorted.toSeq
      assert(got == direct, "re-registered head MV diverges from direct")
    } finally MvCatalog.clear(spark)
  }

  test("rollup: the freshness gate applies to partial matches too") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 40L).map(i => (i, s"g${i % 2}", s"h${i % 2}", i))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-stale-roll", Seq(base))
      (41L to 60L).map(i => (i, s"g${i % 2}", s"h${i % 2}", i))
        .toDF("id", "g", "h", "v").write.mode("append").parquet(base)
      val q = spark.read.parquet(base).groupBy(col("g"))
        .agg(sum(col("v")).as("sv"))
      assert(!MvCatalog.servedFromMv(q, mv),
        "stale MV must not serve a rollup over changed base data")
      assert(q.agg(sum(col("sv"))).collect().head.getLong(0)
        == (1L to 60L).sum, "fallback must see the appended rows")
    } finally MvCatalog.clear(spark)
  }

  test("ivm: full → incremental → full-on-delete → cached transitions, " +
      "with the incremental generation hash-equal to a direct rebuild") {
    import spark.implicits._
    import graft.sources.{SnapshotTable => ST}
    val base = freshDir() + "/snap"
    val mv = freshDir() + "/mv"
    val d1 = s"$base/d1"; val d2 = s"$base/d2"; val del = s"$base/del"
    (1L to 60L).map(i => (i, s"g${i % 3}", i)).toDF("k", "g", "v")
      .write.parquet(d1)
    (61L to 100L).map(i => (i, s"g${i % 3}", i)).toDF("k", "g", "v")
      .write.parquet(d2)
    (1L to 100L by 7).map(Tuple1(_)).toDF("k").write.parquet(del)
    ST.commit(spark, base, 1, ST.Snapshot(Seq(d1), Nil))
    ST.commit(spark, base, 2, ST.Snapshot(Seq(d1, d2), Nil))
    ST.commit(spark, base, 3, ST.Snapshot(Seq(d1, d2), Seq(del)))
    def partial(df: DataFrame) = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def fold(df: DataFrame) = df.groupBy(col("g"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
    def maintain(atV: Int = -1) = MvCatalog.registerSnapshotIncremental(
      spark, mv, "v1:ivm-spec", base, "k", partial, fold, atV)
    try {
      val r1 = maintain(1)
      assert(r1.version == 1 && r1.mode == "full",
        s"first generation must full-build, got $r1")
      val direct2 = partial(ST.readVersion(spark, base, 2, "k"))
        .collect().map(_.toString).sorted.toSeq
      val r2 = maintain(2)
      assert(r2.mode == "incremental",
        s"append-only v1→v2 must fold incrementally, got $r2")
      val gen2 = spark.read.parquet(r2.genPath)
        .collect().map(_.toString).sorted.toSeq
      assert(gen2 == direct2,
        "incrementally-folded generation diverges from a direct rebuild")
      val r3 = maintain()
      assert(r3.version == 3 && r3.mode == "full",
        s"a delete-set change must force a full rebuild, got $r3")
      // in-session replay: the live registration short-circuits
      assert(maintain().mode == "cached")
      // cross-JVM resume simulation: no session state, generations on
      // disk — the ensureDir skip must report cached, not claim a build,
      // and the head re-registers for serving
      MvCatalog.clear(spark)
      val r3c = maintain()
      assert(r3c.mode == "cached",
        s"a restarted job over a built generation must report cached, " +
          s"got $r3c")
      val q = partial(ST.readVersion(spark, base, 3, "k"))
      assert(MvCatalog.servedFromMv(q, r3.genPath),
        "head aggregate was not served from the registered generation")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct3 = partial(ST.readVersion(spark, base, 3, "k"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == direct3)
    } finally MvCatalog.clear(spark)
  }

  test("rollup: a global count over an EMPTY MV serves 0, not NULL") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    Seq.empty[(Long, String, Long)].toDF("id", "g", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def glob() = spark.read.parquet(base).agg(count(lit(1)).as("n"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-empty", Seq(base))
      val q = glob()
      assert(MvCatalog.servedFromMv(q, mv),
        "global count over the empty base did not route through the MV")
      val row = q.collect().head
      assert(!row.isNullAt(0) && row.getLong(0) == 0L,
        "count over an empty MV must be 0 (sum-over-empty is NULL without " +
          "the coalesce derivation — r13 ADVICE)")
    } finally MvCatalog.clear(spark)
  }

  test("registered definitions are stored session-free (no file relation " +
      "pinning the WeakHashMap key)") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 10L).map(i => (i, s"g${i % 2}")).toDF("id", "g").write.parquet(base)
    def agg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    try {
      MvCatalog.register(spark, agg(), mv, "v1:test-free", Seq(base))
      val defs = MvCatalog.definitions(spark)
      assert(defs.nonEmpty)
      defs.foreach { d =>
        val rels = d.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            => l
        }
        assert(rels.isEmpty, "stored definition still holds a " +
          "LogicalRelation — a strong path back to its WeakHashMap key")
        assert(d.collectLeaves()
          .forall(_.getClass.getSimpleName == "MvSourceLeaf"),
          s"unexpected stored leaves: ${d.collectLeaves()}")
      }
      // and the session-free tree still MATCHES a live query
      assert(MvCatalog.servedFromMv(agg(), mv))
    } finally MvCatalog.clear(spark)
  }

  test("cube over the view's keys routes every grouping set through the MV") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 300L).map(i => (i, s"g${i % 4}", s"h${i % 7}", i * 3))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    def cubeQ() = spark.read.parquet(base).cube(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        grouping_id().as("gid"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-cube", Seq(base))
      val q = cubeQ()
      assert(MvCatalog.servedFromMv(q, mv),
        "cube did not route through the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = cubeQ().collect().map(_.toString).sorted.toSeq
      assert(got == direct, "MV-served cube diverges from the direct cube")
      // all four grouping sets present
      assert(got.size == 4 * 7 + 4 + 7 + 1)
    } finally MvCatalog.clear(spark)
  }

  test("rollup and grouping-sets forms route through the same cube tier") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 200L).map(i => (i, s"g${i % 3}", s"h${i % 5}", i))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def rollQ() = spark.read.parquet(base).rollup(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-cube-roll", Seq(base))
      val q = rollQ()
      assert(MvCatalog.servedFromMv(q, mv),
        "rollup form did not route through the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = rollQ().collect().map(_.toString).sorted.toSeq
      assert(got == direct)
      // rollup lattice: (g,h), (g), () — no (h)-only set
      assert(got.size == 3 * 5 + 3 + 1)
    } finally MvCatalog.clear(spark)
  }

  test("cube bails to the base table when an aggregate counts a cube key " +
      "(its null pattern varies per grouping set)") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 60L).map(i => (i, s"g${i % 3}", s"h${i % 2}", i))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def bad() = spark.read.parquet(base).cube(col("g"), col("h"))
      .agg(count(col("g")).as("ng"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-cube-bail", Seq(base))
      val q = bad()
      assert(!MvCatalog.servedFromMv(q, mv),
        "count(cube key) must not derive from the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = bad().collect().map(_.toString).sorted.toSeq
      assert(got == direct)
    } finally MvCatalog.clear(spark)
  }

  test("filter subsumption: a grouping-key predicate + coarser GROUP BY " +
      "routes through the MV with identical results") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 300L).map(i => (i, s"g${i % 4}", s"h${i % 7}", i * 3))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"))
    def filtered() = spark.read.parquet(base)
      .where(col("g").isin("g1", "g3") && col("h") =!= "h0")
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-filt", Seq(base))
      val q = filtered()
      assert(MvCatalog.servedFromMv(q, mv),
        "grouping-key filter + coarser group-by did not route through the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      val direct = filtered().collect().map(_.toString).sorted.toSeq
      assert(got == direct,
        "MV-served filtered rollup diverges from the direct plan")
    } finally MvCatalog.clear(spark)
  }

  test("filter subsumption: a predicate on a NON-key column bails to the " +
      "base table") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 80L).map(i => (i, s"g${i % 4}", i)).toDF("id", "g", "v")
      .write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    // v is aggregated, not a grouping key: filtering MV partials on it
    // would be wrong (the predicate is row-level) — must not route
    def bad() = spark.read.parquet(base).where(col("v") > 40L)
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-filt-bail", Seq(base))
      val q = bad()
      assert(!MvCatalog.servedFromMv(q, mv),
        "a non-key predicate must not route through the MV")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      assert(got == bad().collect().map(_.toString).sorted.toSeq)
    } finally MvCatalog.clear(spark)
  }

  test("filter subsumption: the freshness gate still applies") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 40L).map(i => (i, s"g${i % 2}", i)).toDF("id", "g", "v")
      .write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-filt-stale", Seq(base))
      (41L to 60L).map(i => (i, "g1", i)).toDF("id", "g", "v")
        .write.mode("append").parquet(base)
      val q = spark.read.parquet(base).where(col("g") === "g1")
        .groupBy(col("g")).agg(sum(col("v")).as("sv"))
      assert(!MvCatalog.servedFromMv(q, mv),
        "stale MV must not serve a filtered rollup over changed base data")
      assert(q.collect().head.getLong(1) ==
        (1L to 40L).filter(_ % 2 == 1).sum + (41L to 60L).sum,
        "fallback must see the appended rows")
    } finally MvCatalog.clear(spark)
  }

  test("probe cost: one sessionless transform per Aggregate regardless of " +
      "how many entries are registered") {
    import spark.implicits._
    val bases = (0 until 3).map { i =>
      val b = freshDir() + s"/base$i"
      (1L to 20L).map(j => (j, s"g${j % 2}", j + i)).toDF("id", "g", "v")
        .write.parquet(b)
      b
    }
    def aggOf(b: String) = spark.read.parquet(b).groupBy(col("g"))
      .agg(sum(col("v")).as("sv"))
    // a probe that matches NO entry exercises every tier against every
    // registered definition — the worst case the hoist exists for
    def probeDelta(): Long = {
      val noMatch = spark.read.parquet(bases.head).groupBy(col("v"))
        .agg(count(lit(1)).as("n"))
      val before = MvCatalog.sessionlessCalls.get()
      noMatch.queryExecution.analyzed
      MvCatalog.sessionlessCalls.get() - before
    }
    try {
      MvCatalog.register(spark, aggOf(bases.head), freshDir() + "/mv0",
        "v1:probe0", Seq(bases.head))
      val withOne = probeDelta()
      bases.tail.zipWithIndex.foreach { case (b, i) =>
        MvCatalog.register(spark, aggOf(b), freshDir() + s"/mv${i + 1}",
          s"v1:probe${i + 1}", Seq(b))
      }
      val withThree = probeDelta()
      assert(withOne == withThree,
        s"probe transforms scale with the entry count " +
          s"($withOne with 1 entry vs $withThree with 3) — the per-entry " +
          "sessionless hoist regressed")
      assert(withThree <= 2,
        s"a single-Aggregate probe ran $withThree sessionless transforms")
    } finally MvCatalog.clear(spark)
  }

  test("registration refuses a definition over a non-file relation loudly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // a V1 relation without root paths (the JDBC/custom-source shape):
    // routing identifies leaves by paths, so this definition could never be
    // matched — register must fail fast instead of going silently dead
    val rel = new org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan {
      override def sqlContext = spark.sqlContext
      override def schema = StructType(Seq(StructField("g", StringType),
        StructField("v", LongType)))
      override def buildScan() =
        spark.sparkContext.parallelize(Seq(Row("a", 1L)))
    }
    val df = spark.baseRelationToDataFrame(rel)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    val e = intercept[IllegalArgumentException] {
      MvCatalog.register(spark, df, freshDir() + "/mv", "v1:test-nonfile",
        Seq.empty)
    }
    assert(e.getMessage.contains("file source"),
      s"unexpected refusal message: ${e.getMessage}")
  }

  test("cube bails when a cube key is not a view grouping key") {
    import spark.implicits._
    val base = freshDir() + "/base"
    val mv = freshDir() + "/mv"
    (1L to 60L).map(i => (i, s"g${i % 3}", s"h${i % 2}", i))
      .toDF("id", "g", "h", "v").write.parquet(base)
    def mvAgg() = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def wide() = spark.read.parquet(base).cube(col("g"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    try {
      MvCatalog.register(spark, mvAgg(), mv, "v1:test-cube-widek", Seq(base))
      val q = wide()
      assert(!MvCatalog.servedFromMv(q, mv),
        "a cube key outside the view's grouping keys must not route")
      val got = q.collect().map(_.toString).sorted.toSeq
      MvCatalog.clear(spark)
      assert(got == wide().collect().map(_.toString).sorted.toSeq)
    } finally MvCatalog.clear(spark)
  }
}
