package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Format (v3, typed multi-column): a `_GRAFT_SKIP_INDEX` sidecar whose
  * first line is the header `#graft-skip-index \t v3 \t col1:long
  * [\t col2:str ...]`, then one line per file — `path \t mn1 \t mx1
  * [\t mn2 \t mx2 ...] \t rows`. A `:long` column carries exact decimal
  * bounds (exact-cents / surrogate keys); a `:str` column carries
  * TRUNCATED-LEXICAL bounds as hex-coded UTF-8 bytes (r13 verdict task 3
  * — md5-hex doc ids and text keys, the engine's actual 100 TB tables,
  * could not skip under the integral-only v2): the stored lower bound is
  * a ≤[[TruncBytes]]-byte PREFIX of the true min (a prefix sorts ≤ its
  * extension, so it under-approximates), and the stored upper bound is
  * the truncated true max with its last non-0xFF byte INCREMENTED (which
  * over-approximates; an all-0xFF prefix or a short max stores the exact
  * max instead) — so a band can only see bounds WIDER than the truth and
  * skipping stays lossless at a bounded sidecar size no matter how long
  * the keys are. Byte-wise unsigned comparison matches both Spark's
  * UTF8String ordering and DuckDB's default binary collation, so the
  * sidecar decision, the engine's residual predicate, and the oracle all
  * agree. Carrying SEVERAL columns' bounds per file is what makes the
  * index compose with the Z-ORDER layout (operators/Layout): Morton
  * clustering gives every participating column a tight per-file extent,
  * so a 2-D band prunes on BOTH columns from one sidecar. Nulls never
  * enter a bound (min/max ignore them) and null keys fail any band
  * predicate, so skipping a file whose bounds miss the band is lossless.
  * An all-null/empty file carries sentinel bounds (`~` for strings) that
  * never match, which is also lossless for the same reason.
  *
  * The index is built INSIDE the same `Sinks.ensureDir` block that writes
  * the files (one extra grouped scan at layer-build time), so a tag or
  * fingerprint bump rebuilds data and index atomically — a dir can never
  * read as fresh with a stale index. (The v1→v2→v3→v4 format changes rode
  * exactly that mechanism: bumping the consuming layers' tags in the same
  * commit rebuilds data + sidecar together; an unrecognized header fails
  * loudly below.)
  *
  * SHARDED layout (v4 — r14 verdict task 4; the single-file v3 sidecar
  * stopped scaling at ~10⁶ files, and a hex bloom bitset added ~32 KB per
  * LINE): `_GRAFT_SKIP_INDEX` is now a small MANIFEST (header + shard
  * count, written LAST as the commit point), and the per-file stat lines
  * live in `_GRAFT_SKIP_INDEX.shards/part-NNNNN`, chunked at a fixed line
  * count in global file-name order so every shard is bounded no matter how
  * many data files the table grows. Bloom bitsets move OUT of the text
  * lines into a binary blob per shard (`part-NNNNN.blooms`); a line carries
  * only an `@offset:length` token, so line width is bounded for every key
  * type. Build and read both STREAM — the builder folds stats
  * distributedly, then walks the sorted result with toLocalIterator (one
  * row in driver memory, never the index), and pruning evaluates entries
  * shard by shard against the predicate while reading, so the driver holds
  * the survivors list, never every bitset. An orphaned shard dir without
  * its manifest, a v3-era single-file header, a missing shard, or a blob
  * offset that drifts from the line's token all fail LOUDLY — a silent
  * fallback to full scan would defeat the index and hide a stale layer.
  * Past ~10⁷ files the same probe-the-summary seam moves into parquet-
  * native footer blooms, as the scaladoc below notes.
  */
object SkipIndex {

  val IndexFile = "_GRAFT_SKIP_INDEX"
  private[sources] val ShardDir = IndexFile + ".shards"
  private val Magic = "#graft-skip-index"

  /** Lines per shard file: bounds every shard at a few MB of text (plus
    * its blob) regardless of table size. Overridable per build for tests
    * and for tables whose blob-per-line is unusually large. */
  val DefaultLinesPerShard: Int = 1 << 16

  /** Truncation width (BYTES of UTF-8) for string bounds: long enough to
    * separate range-laid-out files (16 hex chars of an md5 id ≈ 2⁶⁴
    * distinct prefixes), short enough that a 10⁶-file sidecar stays a few
    * tens of MB. */
  private val TruncBytes = 16

  /** An indexed key column: `long` (exact bounds), `str` (truncated
    * lexical bounds), or `bloom` (per-file membership bitset — the POINT-
    * lookup complement: on a HASH-distributed layout every file spans the
    * whole key domain, so min/max bounds keep everything, but an equality
    * / IN probe against per-file blooms prunes to the files that might
    * hold the keys; no false negatives, so skipping stays lossless). Size
    * `bits` at ≈10× the expected rows per file (FPR ~1% at k=5); at file
    * sizes where that outgrows a sidecar line, the same probe-the-
    * membership-summary seam moves into parquet-native footer blooms —
    * this index sits above them exactly as it does for min/max. */
  sealed trait Key { def name: String }
  final case class LongKey(name: String) extends Key
  final case class StrKey(name: String) extends Key
  final case class BloomKey(name: String, bits: Int = 1 << 17,
      k: Int = 5) extends Key {
    require(bits >= 64 && (bits & (bits - 1)) == 0 && bits <= (1 << 24),
      s"bloom bits must be a power of two in [64, 2^24], got $bits")
    require(k >= 1 && k <= 16, s"bloom hash count out of range: $k")
  }

  /** A band predicate `lo <= col <= hi`, typed to match the key. */
  sealed trait Band { def name: String }
  final case class LongBand(name: String, lo: Long, hi: Long) extends Band
  final case class StrBand(name: String, lo: String, hi: String) extends Band

  case class PruneReport(total: Int, kept: Int)

  /** Single-long-key index — the one-column special case of [[buildKeys]]. */
  def build(spark: SparkSession, dir: String, keyCol: String): Unit =
    buildKeys(spark, dir, Seq(LongKey(keyCol)))

  /** All-long-column index (the v2 surface, now written as v3). */
  def buildMulti(spark: SparkSession, dir: String,
      keyCols: Seq[String]): Unit =
    buildKeys(spark, dir, keyCols.map(LongKey))

  /** Write the bounds-per-file index for `keys` over the parquet files
    * under `dir`. One distributed scan grouped by input file; the driver
    * then STREAMS the sorted per-file rows into bounded shard files (one
    * row in memory at a time — never the whole index), writing the
    * manifest LAST as the commit point. */
  def buildKeys(spark: SparkSession, dir: String, keys: Seq[Key],
      linesPerShard: Int = DefaultLinesPerShard): Unit = {
    require(keys.nonEmpty, "skip index needs at least one key column")
    require(linesPerShard >= 1, s"linesPerShard must be >= 1")
    val aggs = keys.flatMap {
      case LongKey(k) => Seq(min(col(k).cast("long")).as(s"mn_$k"),
        max(col(k).cast("long")).as(s"mx_$k"))
      case StrKey(k) => Seq(min(col(k).cast("string")).as(s"mn_$k"),
        max(col(k).cast("string")).as(s"mx_$k"))
      case bk @ BloomKey(k, _, kh) =>
        // two slots like every key: the OR-merged bitset and the hash
        // count (max of a constant — carried through the group, not data)
        Seq(udaf(new BloomAgg(bk.bits, kh)).apply(col(k).cast("string"))
          .as(s"bl_$k"), max(lit(kh)).as(s"kh_$k"))
    } :+ count(lit(1)).as("n")
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("f")
    val manifest = new Path(dir, IndexFile)
    val shardRoot = new Path(dir, ShardDir)
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // invalidate FIRST (manifest is the commit point), then clear stale
    // shards: a crash mid-build leaves a manifest-less shard dir, which
    // readers reject loudly and the next layer build replaces
    fs.delete(manifest, false)
    fs.delete(shardRoot, true)
    var shard = -1
    var lineInShard = 0
    var total = 0L
    var out: org.apache.hadoop.fs.FSDataOutputStream = null
    var blob: org.apache.hadoop.fs.FSDataOutputStream = null
    var blobPos = 0L
    val hasBloom = keys.exists(_.isInstanceOf[BloomKey])
    def roll(): Unit = {
      if (out != null) { out.close(); if (blob != null) blob.close() }
      shard += 1
      lineInShard = 0
      blobPos = 0L
      out = fs.create(new Path(shardRoot, f"part-$shard%05d"), true)
      blob = if (hasBloom)
        fs.create(new Path(shardRoot, f"part-$shard%05d.blooms"), true)
      else null
    }
    val it = perFile.toLocalIterator()
    try {
      while (it.hasNext) {
        val r = it.next()
        if (shard < 0 || lineInShard >= linesPerShard) roll()
        val f = r.getString(0)
        val bounds = keys.zipWithIndex.flatMap { case (key, i) =>
          val (mnI, mxI) = (1 + 2 * i, 2 + 2 * i)
          key match {
            case LongKey(_) =>
              // all-null key: bounds that can never intersect a band
              val mn = if (r.isNullAt(mnI)) Long.MaxValue else r.getLong(mnI)
              val mx = if (r.isNullAt(mxI)) Long.MinValue else r.getLong(mxI)
              Seq(mn.toString, mx.toString)
            case StrKey(_) =>
              if (r.isNullAt(mnI) || r.isNullAt(mxI)) Seq(NullTok, NullTok)
              else Seq(hex(truncMin(r.getString(mnI))),
                hex(truncMax(r.getString(mxI))))
            case BloomKey(_, _, kh) =>
              // all-null file: the zero bitset matches nothing (lossless —
              // a null key fails any equality probe anyway). The bitset
              // itself goes to the binary blob; the line carries only the
              // @offset:length token, so line width stays bounded.
              val bytes = r.getAs[Array[Byte]](mnI)
              blob.write(bytes)
              val tok = s"@$blobPos:${bytes.length}"
              blobPos += bytes.length
              Seq(tok, kh.toString)
          }
        }
        out.write(((f +: bounds :+ r.getLong(1 + 2 * keys.size).toString)
          .mkString("\t") + "\n").getBytes("UTF-8"))
        lineInShard += 1
        total += 1
      }
    } finally {
      if (out != null) out.close()
      if (blob != null) blob.close()
    }
    val header = (Magic +: "v4" +: keys.map {
      case LongKey(k) => s"$k:long"
      case StrKey(k) => s"$k:str"
      case BloomKey(k, _, _) => s"$k:bloom"
    }).mkString("\t")
    val m = fs.create(manifest, true)
    try m.write(s"$header\nshards=${shard + 1}\nfiles=$total\n"
      .getBytes("UTF-8"))
    finally m.close()
  }

  // ---- truncated-lexical string bounds ------------------------------

  /** Sentinel for an all-null file's string bounds: intersects nothing. */
  private val NullTok = "~"

  /** Lower bound: a byte-prefix sorts ≤ every extension, so truncation
    * alone under-approximates the min. */
  private def truncMin(s: String): Array[Byte] =
    s.getBytes("UTF-8").take(TruncBytes)

  /** Upper bound: a short max is stored exactly; a long max truncates and
    * INCREMENTS the last non-0xFF byte (dropping what follows), which is
    * strictly greater than anything extending the original prefix; an
    * all-0xFF prefix cannot be incremented, so the exact max is stored. */
  private def truncMax(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    if (b.length <= TruncBytes) b
    else {
      val p = java.util.Arrays.copyOf(b, TruncBytes)
      var i = p.length - 1
      while (i >= 0 && p(i) == -1) i -= 1
      if (i < 0) b
      else {
        val q = java.util.Arrays.copyOf(p, i + 1)
        q(i) = (q(i) + 1).toByte
        q
      }
    }
  }

  // ---- bloom membership ---------------------------------------------

  /** Two stable 64-bit hashes from md5 — deterministic across JVMs and
    * sessions (the sidecar outlives both); positions via double hashing. */
  private[sources] def hash128(s: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong, bb.getLong)
  }

  private[sources] def bloomPositions(v: String, bits: Int,
      k: Int): Array[Int] = {
    val (h1, h2) = hash128(v)
    Array.tabulate(k)(i =>
      java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, bits.toLong).toInt)
  }

  /** Per-file bloom build: partial bitsets OR-merge (the UDAF's
    * partial→final contract), so the index build stays one distributed
    * grouped scan — per-task memory is one bitset, nothing row-sized
    * reaches the driver. */
  private final class BloomAgg(bits: Int, k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](bits / 64)
    override def reduce(b: Array[Long], v: String): Array[Long] = {
      if (v != null) bloomPositions(v, bits, k).foreach { p =>
        b(p >> 6) |= 1L << (p & 63)
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Byte] = {
      // little-endian: global bit p lives at byte p>>3, mask 1<<(p&7) —
      // the layout BloomBound.mightContain indexes
      val bb = java.nio.ByteBuffer.allocate(r.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      r.foreach(bb.putLong(_): java.nio.ByteBuffer)
      bb.array()
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Byte-wise unsigned compare — Spark UTF8String / DuckDB binary
    * collation order. */
  private def ucmp(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  // ---- read side ----------------------------------------------------

  /** Per-file per-column stored bound. */
  private sealed trait Bound
  private final case class LongBound(mn: Long, mx: Long) extends Bound
  /** None = all-null sentinel (intersects nothing). */
  private final case class StrBound(b: Option[(Array[Byte], Array[Byte])])
    extends Bound
  private final case class BloomBound(bytes: Array[Byte], k: Int)
      extends Bound {
    def mightContain(v: String): Boolean =
      bloomPositions(v, bytes.length * 8, k).forall { p =>
        (bytes(p >> 3) & (1 << (p & 7))) != 0
      }
  }

  /** Parse the MANIFEST: (typed columns, shard count). Loud on absence, an
    * orphaned shard dir (a crashed build — manifest is the commit point),
    * or an unrecognized/pre-v4 header — all are layer bugs, and silently
    * degrading to a full scan would defeat the index's purpose. */
  private def readManifest(spark: SparkSession, dir: String)
      : (Seq[Key], Int, org.apache.hadoop.fs.FileSystem) = {
    val p = new Path(dir, IndexFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      require(!fs.exists(new Path(dir, ShardDir)),
        s"skip-index shard dir under $dir has no manifest — a build " +
          "crashed mid-write or the dir mixes formats; rebuild the layer " +
          "(bump its tag)")
      require(false, s"skip index missing under $dir — build() it in " +
        "the layer's ensureDir block")
    }
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(buf) finally in.close()
    val lines = new String(buf, "UTF-8").split("\n").filter(_.nonEmpty)
    require(lines.nonEmpty && lines.head.startsWith(Magic + "\tv4\t"),
      s"unrecognized skip-index format under $dir (pre-v4 single-file or " +
        "corrupt header) — rebuild the layer (bump its tag) to refresh " +
        "the sidecar")
    val keys: Seq[Key] = lines.head.split("\t").drop(2).toSeq.map { c =>
      c.split(":") match {
        case Array(n, "long") => LongKey(n)
        case Array(n, "str") => StrKey(n)
        case Array(n, "bloom") => BloomKey(n)
        case _ => sys.error(s"bad skip-index column spec '$c' under $dir")
      }
    }
    val shards = lines.find(_.startsWith("shards=")).map(
      _.stripPrefix("shards=").toInt).getOrElse(
      sys.error(s"skip-index manifest under $dir has no shard count — " +
        "rebuild the layer"))
    (keys, shards, fs)
  }

  /** Stream every indexed entry through `f`, shard by shard: bloom tokens
    * resolve against the shard's binary blob SEQUENTIALLY (build order ==
    * line order, so no seeks), and the token offset is verified against
    * the stream position — drift means a corrupt/mixed sidecar and fails
    * loudly. Driver memory is one entry, never the index. Returns the
    * total entry count. */
  private def eachEntry(dir: String, keys: Seq[Key], shards: Int,
      fs: org.apache.hadoop.fs.FileSystem, needBloom: Boolean)(
      f: (String, IndexedSeq[Bound]) => Unit): Int = {
    var total = 0
    val hasBloom = keys.exists(_.isInstanceOf[BloomKey])
    for (s <- 0 until shards) {
      val part = new Path(dir, f"$ShardDir/part-$s%05d")
      require(fs.exists(part),
        s"skip-index shard $part missing (manifest says $shards shards) — " +
          "rebuild the layer (bump its tag)")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(part), "UTF-8"))
      val blobPath = new Path(dir, f"$ShardDir/part-$s%05d.blooms")
      val blob =
        if (hasBloom && needBloom) {
          require(fs.exists(blobPath),
            s"skip-index bloom blob $blobPath missing — rebuild the layer")
          new java.io.DataInputStream(
            new java.io.BufferedInputStream(fs.open(blobPath)))
        } else null
      var blobPos = 0L
      try {
        var l = in.readLine()
        while (l != null) {
          val c = l.split("\t")
          val bounds = keys.indices.map[Bound] { i =>
            val (mn, mx) = (c(1 + 2 * i), c(2 + 2 * i))
            keys(i) match {
              case LongKey(_) => LongBound(mn.toLong, mx.toLong)
              case StrKey(_) =>
                if (mn == NullTok || mx == NullTok) StrBound(None)
                else StrBound(Some((unhex(mn), unhex(mx))))
              case BloomKey(_, _, _) =>
                val at = mn.indexOf(':')
                require(mn.startsWith("@") && at > 1,
                  s"bad bloom token '$mn' in $part — rebuild the layer")
                val off = mn.substring(1, at).toLong
                val n = mn.substring(at + 1).toInt
                if (blob == null) BloomBound(Array.emptyByteArray, mx.toInt)
                else {
                  require(off == blobPos,
                    s"bloom blob offset drift in $part (token $off, " +
                      s"stream at $blobPos) — corrupt or mixed sidecar; " +
                      "rebuild the layer")
                  val bytes = new Array[Byte](n)
                  blob.readFully(bytes)
                  blobPos += n
                  BloomBound(bytes, mx.toInt)
                }
            }
          }
          f(c(0), bounds)
          total += 1
          l = in.readLine()
        }
      } finally {
        in.close()
        if (blob != null) blob.close()
      }
    }
    total
  }

  /** Band read `lo <= keyCol <= hi` — the one-band special case of
    * [[prunedReadTyped]]. */
  def prunedRead(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): (DataFrame, PruneReport) =
    prunedReadTyped(spark, dir, Seq(LongBand(keyCol, lo, hi)))

  /** All-long multi-band read (the v2 surface). */
  def prunedReadBands(spark: SparkSession, dir: String,
      bands: Seq[(String, Long, Long)]): (DataFrame, PruneReport) =
    prunedReadTyped(spark, dir,
      bands.map { case (k, lo, hi) => LongBand(k, lo, hi) })

  /** Lexical band read over a string-indexed dir. */
  def prunedReadStr(spark: SparkSession, dir: String, keyCol: String,
      lo: String, hi: String): (DataFrame, PruneReport) =
    prunedReadTyped(spark, dir, Seq(StrBand(keyCol, lo, hi)))

  /** POINT-lookup read over a bloom-indexed dir: a file survives when ANY
    * probe value might be present in its bitset (no false negatives ⇒
    * lossless); survivors scan under the full IN predicate (skipping is
    * an optimization, never the filter). The hash-layout twin of the band
    * reads — on a hash-distributed table every file's min/max spans the
    * domain, but a handful of point probes touch only the files whose
    * blooms answer "maybe". */
  def prunedReadEq(spark: SparkSession, dir: String, keyCol: String,
      values: Seq[String]): (DataFrame, PruneReport) = {
    require(values.nonEmpty, "prunedReadEq needs at least one probe value")
    val (keys, shards, fs) = readManifest(spark, dir)
    val i = keys.indexWhere(_.name == keyCol)
    require(i >= 0, s"column $keyCol is not in the skip index " +
      s"(indexed: ${keys.map(_.name).mkString(", ")}) — rebuild the " +
      "layer with it")
    require(keys(i).isInstanceOf[BloomKey],
      s"equality probes need a bloom column; $keyCol is indexed as " +
        keys(i).getClass.getSimpleName)
    // streamed evaluation: each shard's bitsets are probed as they are
    // read — the driver retains only the SURVIVOR paths, never the blobs
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    val total = eachEntry(dir, keys, shards, fs, needBloom = true) {
      (f, bs) =>
        val hit = (bs(i): @unchecked) match {
          case b: BloomBound => values.exists(b.mightContain)
        }
        if (hit) kept += f
    }
    val report = PruneReport(total, kept.length)
    val df =
      if (kept.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (df.where(col(keyCol).isin(values: _*)), report)
  }

  /** Multi-band read over an indexed dir: a file survives only when EVERY
    * band intersects its stored bounds for that column (string bounds are
    * truncation-widened, so the test can only err toward keeping), so
    * over a z-ordered layout a 2-D rectangle prunes in both dimensions
    * from the one sidecar. Survivors are scanned and the predicates STILL
    * apply (skipping is an optimization, never the filter). Asking for a
    * column the index never measured, or with a band of the wrong type,
    * fails loudly. */
  def prunedReadTyped(spark: SparkSession, dir: String,
      bands: Seq[Band]): (DataFrame, PruneReport) = {
    require(bands.nonEmpty, "prunedReadTyped needs at least one band")
    val (keys, shards, fs) = readManifest(spark, dir)
    val idx = bands.map { b =>
      val i = keys.indexWhere(_.name == b.name)
      require(i >= 0, s"column ${b.name} is not in the skip index " +
        s"(indexed: ${keys.map(_.name).mkString(", ")}) — rebuild the " +
        "layer with it")
      (keys(i), b) match {
        case (LongKey(_), LongBand(_, _, _)) | (StrKey(_), StrBand(_, _, _)) =>
        case (k, _) => sys.error(s"band type mismatch for ${b.name}: " +
          s"indexed as ${k.getClass.getSimpleName}")
      }
      (i, b)
    }
    // streamed evaluation, blobs skipped entirely (bands never consult a
    // bloom column — the type check above rejects that pairing)
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    val total = eachEntry(dir, keys, shards, fs, needBloom = false) {
      (f, bs) =>
        val hit = idx.forall {
          case (i, LongBand(_, lo, hi)) =>
            val LongBound(mn, mx) = (bs(i): @unchecked)
            mx >= lo && mn <= hi
          case (i, StrBand(_, lo, hi)) =>
            val StrBound(b) = (bs(i): @unchecked)
            b.exists { case (mn, mx) =>
              ucmp(mx, lo.getBytes("UTF-8")) >= 0 &&
                ucmp(mn, hi.getBytes("UTF-8")) <= 0
            }
        }
        if (hit) kept += f
    }
    val report = PruneReport(total, kept.length)
    val df =
      if (kept.isEmpty)
        // schema still comes from the real files; the filter keeps nothing
        spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    val pred: Column = bands.map {
      case LongBand(k, lo, hi) => col(k).cast("long").between(lo, hi)
      case StrBand(k, lo, hi) => col(k).between(lit(lo), lit(hi))
    }.reduce(_ && _)
    (df.where(pred), report)
  }
}
