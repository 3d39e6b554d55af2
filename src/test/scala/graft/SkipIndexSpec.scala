package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SkipIndex

/** File-skipping index: pruning must be LOSSLESS (band results equal the
  * full-scan filter no matter which files were skipped) and must genuinely
  * engage on a range layout; the conservative sentinel bounds for all-null
  * files and the loud missing-index failure are contracts, not accidents.
  */
class SkipIndexSpec extends SparkTestBase {

  private def freshDir(): String =
    Files.createTempDirectory("graft-skipidx").toString

  test("pruned band read equals the full-scan filter and skips files") {
    import spark.implicits._
    val dir = freshDir()
    // 4 range files over k = 0..399: file ranges ~[0,100),[100,200)...
    (0L until 400L).map(i => (i, s"g${i % 7}")).toDF("k", "g")
      .repartitionByRange(4, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    SkipIndex.build(spark, dir, "k")
    val (band, rep) = SkipIndex.prunedRead(spark, dir, "k", 120L, 180L)
    assert(rep.total == 4 && rep.kept < rep.total,
      s"expected real pruning, got kept=${rep.kept}/${rep.total}")
    val got = band.select("k", "g").collect().map(_.toString).sorted.toSeq
    val want = spark.read.parquet(dir).where(col("k").between(120L, 180L))
      .select("k", "g").collect().map(_.toString).sorted.toSeq
    assert(got == want, "pruned read lost or invented rows")
  }

  test("band outside every file range keeps zero files and returns empty") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 100L).map(i => (i, i * 2)).toDF("k", "v")
      .repartitionByRange(2, col("k"))
      .write.mode("overwrite").parquet(dir)
    SkipIndex.build(spark, dir, "k")
    val (band, rep) = SkipIndex.prunedRead(spark, dir, "k", 1000L, 2000L)
    assert(rep.kept == 0)
    assert(band.count() == 0L)
    // schema survives the zero-file path (readable, filterable)
    assert(band.columns.toSeq == Seq("k", "v"))
  }

  test("all-null key files carry never-matching bounds but stay lossless") {
    import spark.implicits._
    val dir = freshDir()
    // one real file + one all-null-key file (nulls fail any band anyway)
    Seq((Some(5L), "a"), (Some(9L), "b")).toDF("k", "g")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2")).toDF("k", "g")
      .coalesce(1).write.mode("append").parquet(dir)
    SkipIndex.build(spark, dir, "k")
    val (band, rep) = SkipIndex.prunedRead(spark, dir, "k", 0L, 100L)
    assert(rep.total == 2 && rep.kept == 1,
      s"all-null file should be skipped: ${rep.kept}/${rep.total}")
    assert(band.select("g").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("pruning is lossless for ANY band over ANY layout (property sweep)") {
    // random multi-file layouts (range-sorted or deliberately shuffled —
    // the index must stay LOSSLESS even when it cannot prune) × random
    // bands, vs the full-scan filter
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dirSorted = freshDir()
    val dirShuffled = freshDir()
    val rows = (0L until 300L).map(i => (i * 7 % 500, s"v$i"))
    rows.toDF("k", "g").repartitionByRange(5, col("k"))
      .sortWithinPartitions("k").write.mode("overwrite").parquet(dirSorted)
    rows.toDF("k", "g").repartition(5) // hash layout: bounds overlap fully
      .write.mode("overwrite").parquet(dirShuffled)
    SkipIndex.build(spark, dirSorted, "k")
    SkipIndex.build(spark, dirShuffled, "k")
    val prop = Prop.forAll(
      Gen.chooseNum(-50L, 550L), Gen.chooseNum(0L, 200L),
      Gen.oneOf(dirSorted, dirShuffled)) { (lo, width, dir) =>
      val hi = lo + width
      val (band, _) = SkipIndex.prunedRead(spark, dir, "k", lo, hi)
      val got = band.select("k", "g").collect().map(_.toString).sorted.toSeq
      val want = spark.read.parquet(dir).where(col("k").between(lo, hi))
        .select("k", "g").collect().map(_.toString).sorted.toSeq
      got == want
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(r.passed, r.status.toString)
  }

  test("2-D band over a z-ordered layout prunes on BOTH columns, lossless") {
    import spark.implicits._
    val dir = freshDir()
    // a 64x64 grid z-ordered into 16 files: every file covers one tight
    // Morton rectangle, so each dimension's per-file extent is ~a quarter
    // of its domain and a small 2-D band keeps only a few files
    val rows = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y, x * 64 + y)
    graft.operators.Layout.zorderWrite(
      rows.toDF("x", "y", "v"), "x", "y", dir, 16)
    SkipIndex.buildMulti(spark, dir, Seq("x", "y"))
    val (band, rep) = SkipIndex.prunedReadBands(spark, dir,
      Seq(("x", 10L, 20L), ("y", 40L, 50L)))
    assert(rep.total == 16 && rep.kept < rep.total,
      s"2-D band should prune z-ordered files: kept ${rep.kept}/${rep.total}")
    val got = band.select("v").as[Long].collect().sorted.toSeq
    val want = rows.collect {
      case (x, y, v) if x >= 10 && x <= 20 && y >= 40 && y <= 50 => v
    }.sorted
    assert(got == want, "2-D pruned read lost or invented rows")
    // the 1-D special case still reads the same multi-column sidecar
    val (one, rep1) = SkipIndex.prunedRead(spark, dir, "y", 0L, 15L)
    assert(rep1.kept < rep1.total)
    assert(one.count() == 64L * 16L)
  }

  test("string-key pruning engages on a range layout and stays lossless " +
      "with prefix-truncated bounds (keys longer than the 16-byte width)") {
    import spark.implicits._
    val dir = freshDir()
    // md5-style 32-hex-char keys: every stored bound is genuinely
    // truncated, so the widened-bounds path is what this test exercises
    val rows = (0L until 400L).map { i =>
      (f"${i % 16}%x" * 2 + f"$i%030x", i) // 32 chars, leading hex digit i%16
    }
    rows.toDF("s", "v")
      .repartitionByRange(8, col("s"))
      .sortWithinPartitions("s")
      .write.mode("overwrite").parquet(dir)
    SkipIndex.buildKeys(spark, dir, Seq(SkipIndex.StrKey("s")))
    val (band, rep) = SkipIndex.prunedReadStr(spark, dir, "s", "4", "8")
    assert(rep.total == 8 && rep.kept < rep.total,
      s"lexical band should prune range files: kept ${rep.kept}/${rep.total}")
    val got = band.select("v").as[Long].collect().sorted.toSeq
    val want = rows.collect {
      case (s, v) if s >= "4" && s <= "8" => v
    }.sorted
    assert(got == want, "string-pruned read lost or invented rows")
  }

  test("prefix-truncation boundary: a band between the true max and its " +
      "widened bound keeps the file (conservative) yet returns no rows") {
    import spark.implicits._
    val dir = freshDir()
    val p16 = "a" * 16 // exactly the truncation width
    // one file whose keys all extend the same 16-byte prefix: stored
    // bounds are [p16, "aaaaaaaaaaaaaaab") — wider than the true
    // [p16+"m1", p16+"z9"] on both sides
    Seq((p16 + "m1", 1L), (p16 + "q5", 2L), (p16 + "z9", 3L))
      .toDF("s", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    SkipIndex.buildKeys(spark, dir, Seq(SkipIndex.StrKey("s")))
    // band inside the widened-but-unreal gap (true max < lo < widened max):
    // the file survives pruning — the bound may only ever err WIDE — and
    // the residual predicate returns zero rows, so the result is lossless
    val (gap, repGap) = SkipIndex.prunedReadStr(
      spark, dir, "s", p16 + "zz", p16 + "zzz")
    assert(repGap.kept == 1, "widened upper bound must keep the gap band")
    assert(gap.count() == 0L)
    // band at the incremented prefix itself: stored bounds are inclusive
    // (the exclusivity of the increment is not tracked), so this edge is
    // conservatively kept — and returns nothing, which is the contract
    val (edge, repEdge) = SkipIndex.prunedReadStr(
      spark, dir, "s", "aaaaaaaaaaaaaaab", "aaaaaaaaaaaaaaab")
    assert(repEdge.kept == 1 && edge.count() == 0L)
    // band strictly past the incremented prefix: provably disjoint, skipped
    val (_, repOut) = SkipIndex.prunedReadStr(
      spark, dir, "s", "aaaaaaaaaaaaaaab0", "b")
    assert(repOut.kept == 0, "band beyond the widened bound must skip")
    // band ending AT the truncated lower bound: the widened mn (a prefix
    // of the true min) intersects, so the file is conservatively kept and
    // the residual predicate again returns nothing — still lossless
    val (low, repLow) = SkipIndex.prunedReadStr(spark, dir, "s", "a", p16)
    assert(repLow.kept == 1, "widened lower bound must keep the edge band")
    assert(low.count() == 0L)
    // band strictly below the truncated lower bound: provably disjoint
    val (_, repBelow) = SkipIndex.prunedReadStr(
      spark, dir, "s", "a", "a" * 15)
    assert(repBelow.kept == 0, "band below the prefix bound must skip")
    // band that ends exactly AT the prefix lower bound boundary + one key
    val (atMin, _) = SkipIndex.prunedReadStr(spark, dir, "s", p16, p16 + "m1")
    assert(atMin.select("v").as[Long].collect().toSeq == Seq(1L),
      "prefix-truncated lower bound must not lose the true min")
  }

  test("string pruning is lossless for ANY band over ANY layout " +
      "(property sweep incl. hash layouts and short keys)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dirSorted = freshDir()
    val dirShuffled = freshDir()
    // mixed lengths: some short (stored exactly), some past the
    // truncation width (stored widened)
    val rows = (0L until 300L).map { i =>
      val base = f"${i * 13 % 256}%02x"
      val s = if (i % 3 == 0) base else base + "f" * 20 + f"$i%04d"
      (s, i)
    }
    rows.toDF("s", "v").repartitionByRange(5, col("s"))
      .sortWithinPartitions("s").write.mode("overwrite").parquet(dirSorted)
    rows.toDF("s", "v").repartition(5)
      .write.mode("overwrite").parquet(dirShuffled)
    SkipIndex.buildKeys(spark, dirSorted, Seq(SkipIndex.StrKey("s")))
    SkipIndex.buildKeys(spark, dirShuffled, Seq(SkipIndex.StrKey("s")))
    val hexChar = Gen.oneOf("0123456789abcdef".toSeq)
    val key = for {
      n <- Gen.chooseNum(1, 24)
      cs <- Gen.listOfN(n, hexChar)
    } yield cs.mkString
    val prop = Prop.forAll(key, key, Gen.oneOf(dirSorted, dirShuffled)) {
      (a, b, dir) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val (band, _) = SkipIndex.prunedReadStr(spark, dir, "s", lo, hi)
        val got = band.select("v").as[Long].collect().sorted.toSeq
        val want = rows.collect {
          case (s, v) if s >= lo && s <= hi => v
        }.sorted
        got == want
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(r.passed, r.status.toString)
  }

  test("all-null string-key files carry sentinel bounds but stay lossless") {
    import spark.implicits._
    val dir = freshDir()
    Seq((Some("abc"), 1L), (Some("def"), 2L)).toDF("s", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((Option.empty[String], 3L), (Option.empty[String], 4L)).toDF("s", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    SkipIndex.buildKeys(spark, dir, Seq(SkipIndex.StrKey("s")))
    val (band, rep) = SkipIndex.prunedReadStr(spark, dir, "s", "a", "z")
    assert(rep.total == 2 && rep.kept == 1,
      s"all-null string file should be skipped: ${rep.kept}/${rep.total}")
    assert(band.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("a band of the wrong type for the indexed column fails loudly") {
    import spark.implicits._
    val dir = freshDir()
    Seq(("aa", 1L)).toDF("s", "v").write.mode("overwrite").parquet(dir)
    SkipIndex.buildKeys(spark, dir, Seq(SkipIndex.StrKey("s")))
    val e = intercept[RuntimeException] {
      SkipIndex.prunedRead(spark, dir, "s", 0L, 10L)
    }
    assert(e.getMessage.contains("band type mismatch"))
  }

  test("asking for an unindexed column or a corrupt header fails loudly") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 50L).map(i => (i, i * 2)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    SkipIndex.build(spark, dir, "k")
    val e = intercept[IllegalArgumentException] {
      SkipIndex.prunedReadBands(spark, dir, Seq(("v", 0L, 10L)))
    }
    assert(e.getMessage.contains("not in the skip index"))
    // legacy/garbage sidecar: loud, never a silent full scan (drop the
    // Hadoop .crc twin too — this test fakes the file behind the FS API)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, SkipIndex.IndexFile),
      "file:/x\t0\t9\t10\n".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "." + SkipIndex.IndexFile + ".crc"))
    val e2 = intercept[IllegalArgumentException] {
      SkipIndex.prunedRead(spark, dir, "k", 0L, 10L)
    }
    assert(e2.getMessage.contains("unrecognized skip-index format"))
  }

  test("missing index fails loudly instead of degrading to a full scan") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "x")).toDF("k", "g").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      SkipIndex.prunedRead(spark, dir, "k", 0L, 10L)
    }
    assert(e.getMessage.contains("skip index missing"))
  }

  test("sharded sidecar round-trips: multiple shards, band and bloom " +
      "reads stay lossless, blobs are binary not hex") {
    import spark.implicits._
    val dir = freshDir()
    // 8 range files, forced into 2-line shards → 4 shard files: the
    // bounded-sidecar layout a 10⁶-file table needs, driven end to end
    (0L until 800L).map(i => (i, s"id-$i", s"g${i % 5}"))
      .toDF("k", "id", "g")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    SkipIndex.buildKeys(spark, dir,
      Seq(SkipIndex.LongKey("k"), SkipIndex.BloomKey("id", bits = 1 << 12)),
      linesPerShard = 2)
    val shardDir = new java.io.File(dir, SkipIndex.IndexFile + ".shards")
    val parts = shardDir.list().filterNot(_.startsWith("."))
      .filterNot(_.endsWith(".blooms")).sorted.toSeq
    assert(parts == Seq("part-00000", "part-00001", "part-00002",
      "part-00003"), s"expected 4 shards of 2 lines, got $parts")
    assert(shardDir.list().count(_.endsWith(".blooms")) == 4,
      "each shard needs its binary bloom blob")
    // no line carries a hex bitset: tokens only (bounded line width)
    val line0 = scala.io.Source.fromFile(
      new java.io.File(shardDir, "part-00000"))("UTF-8").getLines().next()
    assert(line0.length < 200 && line0.contains("\t@0:"),
      s"expected a bounded @offset:length bloom token line, got: $line0")
    // band read across shard boundaries is lossless
    val (band, rep) = SkipIndex.prunedRead(spark, dir, "k", 150L, 450L)
    assert(rep.total == 8 && rep.kept < rep.total)
    val got = band.select("k").as[Long].collect().sorted.toSeq
    assert(got == (150L to 450L).toSeq, "sharded band read lost rows")
    // bloom probe resolves tokens against the right shard's blob
    val (hit, repB) = SkipIndex.prunedReadEq(spark, dir, "id",
      Seq("id-0", "id-433", "id-799"))
    assert(repB.kept < repB.total)
    assert(hit.select("k").as[Long].collect().sorted.toSeq ==
      Seq(0L, 433L, 799L), "sharded bloom probe lost rows")
  }

  test("an orphaned shard dir without its manifest fails loudly (crashed " +
      "or mixed-format build)") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 50L).map(i => (i, i * 2)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    SkipIndex.build(spark, dir, "k")
    // simulate the crash window: manifest (the commit point) gone, shards
    // left behind — readers must refuse, not full-scan or half-read
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, SkipIndex.IndexFile))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "." + SkipIndex.IndexFile + ".crc"))
    val e = intercept[IllegalArgumentException] {
      SkipIndex.prunedRead(spark, dir, "k", 0L, 10L)
    }
    assert(e.getMessage.contains("no manifest"),
      s"unexpected message: ${e.getMessage}")
  }

  test("bloom point probe prunes a HASH layout losslessly (no false " +
      "negatives, pruning engages)") {
    import spark.implicits._
    val dir = freshDir()
    // hash layout: every file spans the whole key domain, so min/max
    // bounds would keep everything — the bloom is what prunes here
    (0L until 2000L).map(i => (s"id-$i", i)).toDF("id", "v")
      .repartition(8, col("id"))
      .write.mode("overwrite").parquet(dir)
    SkipIndex.buildKeys(spark, dir,
      Seq(SkipIndex.BloomKey("id", bits = 1 << 15)))
    // every present key must be found (lossless), file count pruned
    val probes = Seq("id-0", "id-999", "id-1777")
    val (hit, rep) = SkipIndex.prunedReadEq(spark, dir, "id", probes)
    assert(rep.total == 8 && rep.kept < rep.total,
      s"bloom probe failed to prune: kept=${rep.kept}/${rep.total}")
    val got = hit.select("id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("id-0", 0L), ("id-1777", 1777L), ("id-999", 999L)),
      s"bloom probe lost or invented rows: ${got.mkString(",")}")
    // an absent key returns empty (false positives die in the residual
    // IN predicate even if a file survives)
    val (miss, _) = SkipIndex.prunedReadEq(spark, dir, "id",
      Seq("id-999983"))
    assert(miss.count() == 0L)
  }

  test("bloom sweep: every one of 2000 present keys survives its probe " +
      "(no false negative anywhere in the bitset path)") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 2000L).map(i => (s"k$i", i)).toDF("id", "v")
      .repartition(6, col("id"))
      .write.mode("overwrite").parquet(dir)
    SkipIndex.buildKeys(spark, dir,
      Seq(SkipIndex.BloomKey("id", bits = 1 << 15)))
    // drive the kept-file decision for every key at the index level: the
    // pruned read of each single key must keep >=1 file and find the row
    val all = (0L until 2000L by 97L).map(i => s"k$i")
    all.foreach { key =>
      val (df, rep) = SkipIndex.prunedReadEq(spark, dir, "id", Seq(key))
      assert(rep.kept >= 1, s"present key $key bloomed to zero files")
      assert(df.count() == 1L, s"present key $key not found after pruning")
    }
  }

  test("bloom column rejects band probes; band columns reject point " +
      "probes; all-null bloom file is skipped losslessly") {
    import spark.implicits._
    val dir = freshDir()
    Seq((Option("a"), 1L), (Option("b"), 2L)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((Option.empty[String], 3L)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    SkipIndex.buildKeys(spark, dir,
      Seq(SkipIndex.BloomKey("id", bits = 1 << 10),
        SkipIndex.LongKey("v")))
    // null-key file: zero bitset, never kept by a probe — and losing it
    // is lossless because null fails any equality
    val (hit, rep) = SkipIndex.prunedReadEq(spark, dir, "id", Seq("a"))
    assert(rep.total == 2 && rep.kept == 1)
    assert(hit.collect().map(_.getLong(1)).toSeq == Seq(1L))
    // type discipline is loud in both directions
    val e1 = intercept[RuntimeException] {
      SkipIndex.prunedReadTyped(spark, dir,
        Seq(SkipIndex.StrBand("id", "a", "b")))
    }
    assert(e1.getMessage.contains("type mismatch") ||
      e1.getMessage.contains("band type mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      SkipIndex.prunedReadEq(spark, dir, "v", Seq("1"))
    }
    assert(e2.getMessage.contains("bloom"))
    // and the long band on v still works alongside the bloom column
    val (band, _) = SkipIndex.prunedReadTyped(spark, dir,
      Seq(SkipIndex.LongBand("v", 2L, 3L)))
    assert(band.collect().map(_.getLong(1)).sorted.toSeq == Seq(2L, 3L))
  }
}
