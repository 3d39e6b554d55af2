package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-column scan
  * pruning.
  *
  * At 100 TB the scan is the query: a table range-partitioned and sorted by
  * ONE column prunes beautifully on that column and not at all on any other.
  * Interleaving the bits of two filter columns into one Morton key and
  * laying the table out by THAT key gives every participating column
  * locality ∝ 2^(-bits/2) per file — the standard lakehouse ZORDER BY. The
  * engine's form: [[zValue]] computes the key as pure integer column math
  * (portable — any engine replays it bit-exactly), [[zorderWrite]] lays out
  * parquet by Morton range, and the per-bucket min/max extents (what a
  * file-skipping reader consults) are an ordinary aggregate any engine can
  * audit — gated as q_zorder.
  */
object Layout {

  /** The 2×21-bit Morton interleave as a SQL expression TEMPLATE — the exact
    * same text is compiled by Spark (expr) and pasted into the DuckDB oracle,
    * so bit-parity is by construction. Inputs must be in [0, 2²¹); the
    * classic shift-or-mask spreading (Morton 1966; the magic constants are
    * the textbook 64-bit bit-spread sequence) is 12 integer ops per column —
    * codegen keeps it in the scan's projection, no UDF. */
  def zSql(x: String, y: String): String = {
    def spread(c: String): String = {
      // 21 significant bits spread to even positions of a 42-bit lane;
      // shifts written as power-of-two multiplies so the one template parses
      // identically in Spark SQL and DuckDB. The input is masked to its
      // 21-bit lane FIRST, so every multiply (including the first) operates
      // on a just-masked value and cannot overflow; each later factor is
      // likewise applied post-mask, peak magnitude < 2⁶³.
      val m = s"($c & 2097151)" // 0x1FFFFF: the 21-bit input lane
      val s1 = s"(($m | ($m * 65536)) & 281470681808895)" // 0x0000FFFF0000FFFF
      val s2 = s"(($s1 | ($s1 * 256)) & 71777214294589695)" // 0x00FF00FF00FF00FF
      val s3 = s"(($s2 | ($s2 * 16)) & 1085102592571150095)" // 0x0F0F0F0F0F0F0F0F
      val s4 = s"(($s3 | ($s3 * 4)) & 3689348814741910323)" // 0x3333333333333333
      s"(($s4 | ($s4 * 2)) & 6148914691236517205)" // 0x5555555555555555
    }
    s"(${spread(x)} | (${spread(y)} * 2))"
  }

  /** Attach the Morton key as `zv` to `df` (columns must already exist).
    * The documented [0, 2²¹) domain is ENFORCED here: an out-of-range or
    * negative value would otherwise silently produce a non-Morton key (the
    * mask discards high bits) and the table would cluster by a meaningless
    * order with no error — the guard raises instead, engine-side only (the
    * oracle replays the same table, which the engine has already
    * validated). */
  def withZ(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val lim = (1L << 21) - 1
    df.withColumn("zv",
      when(x.between(0, lim) && y.between(0, lim),
        expr(zSql(s"CAST($xCol AS BIGINT)", s"CAST($yCol AS BIGINT)")))
      .otherwise(raise_error(concat(
        lit(s"z-order input outside [0, 2^21): $xCol="), x,
        lit(s", $yCol="), y))))
  }

  /** The 3×21-bit Morton interleave — same template discipline as
    * [[zSql]], with one extra care: the wider spread's intermediate
    * products would cross 2⁶³ if shifted naively, so each multiplied
    * copy is PRE-MASKED to exactly the bits the next mask can still use
    * (the discarded bits land above the mask either way) — every
    * intermediate stays under 2⁶³, so the expression is ANSI-safe, not
    * wrap-dependent. Verified bit-exact against the positional
    * reference interleave in LayoutSpec. */
  def zSql3(x: String, y: String, z: String): String = {
    def spread(c: String): String = {
      val m = s"($c & 2097151)"
      val s1 = s"(($m | ($m * 4294967296)) & 8725724278095871)"
      val s2 = s"(($s1 | (($s1 & 137438953471) * 65536)) & 8725728556220671)"
      val s3 =
        s"(($s2 | (($s2 & 9007199254740991) * 256)) & 1157144660301377551)"
      val s4 =
        s"(($s3 | (($s3 & 144115188075855871) * 16)) & 1207822528635744451)"
      s"(($s4 | (($s4 & 576460752303423487) * 4)) & 1317624576693539401)"
    }
    s"(${spread(x)} | (${spread(y)} * 2) | (${spread(z)} * 4))"
  }

  /** Order-preserving 21-bit lane for a STRING z-order column — the
    * md5/text doc-id shape integer interleaves cannot take directly:
    * the key's first 3 UTF-8 bytes read as a big-endian 24-bit integer
    * (hex right-padded with '0', so short strings order below their
    * extensions — the same truncated-lexical-bytes idea as SkipIndex's
    * string bounds) shifted into the 21-bit Morton lane. MONOTONE
    * (coarsely) in byte-lexicographic order: s1 <= s2 ⇒ lane(s1) <=
    * lane(s2), with ties beyond the 3-byte prefix — which is all a
    * clustering key needs (dir pruning consults the honest per-dir
    * string min/max, never the lane; a coarse lane only costs
    * clustering sharpness, never correctness). All built-in functions —
    * codegen keeps it in the projection, no UDF. */
  def stringLaneSql(c: String): String =
    s"(CAST(conv(rpad(hex(substring(CAST($c AS BINARY), 1, 3)), 6, '0')," +
      s" 16, 10) AS BIGINT) div 8)"

  /** [[stringLaneSql]] as a Column; NULL keys stay NULL (the caller's
    * domain guard — [[withZ]]'s between() — rejects them loudly). */
  def stringLane(colName: String): org.apache.spark.sql.Column =
    expr(stringLaneSql(colName))

  /** Attach the 3-D Morton key as `zv` — [[withZ]]'s domain guard,
    * three columns. */
  def withZ3(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    val cs = Seq(xCol, yCol, zCol).map(c => col(c).cast("long"))
    val lim = (1L << 21) - 1
    df.withColumn("zv",
      when(cs.map(_.between(0, lim)).reduce(_ && _),
        expr(zSql3(s"CAST($xCol AS BIGINT)", s"CAST($yCol AS BIGINT)",
          s"CAST($zCol AS BIGINT)")))
      .otherwise(raise_error(concat(
        lit(s"z-order input outside [0, 2^21): ($xCol, $yCol, $zCol)=("),
        cs(0), lit(", "), cs(1), lit(", "), cs(2), lit(")")))))
  }

  /** Write `df` parquet laid out by Morton range: range-repartition on the
    * key then sort within partitions, so each output file covers one tight
    * Morton rectangle and a min/max-skipping reader prunes on BOTH columns.
    * (The layout affects file boundaries, never row content — downstream
    * queries stay deterministic even though range sampling is not.) */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      nFiles: Int = 32): Unit =
    withZ(df, xCol, yCol)
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions(col("zv"))
      .write.mode("overwrite").parquet(path)

  /** Per-Z-bucket extents — the file-skipping index a lakehouse reader
    * consults, surfaced as a relation: bucket = zv >> shift, with each
    * bucket's row count and min/max of both source columns. Tight extents ⇔
    * effective pruning; the aggregate is partial→final over a bounded bucket
    * domain (metadata-sized shuffle at any corpus size). */
  def zExtents(df: DataFrame, xCol: String, yCol: String,
      shift: Int): DataFrame =
    withZ(df, xCol, yCol)
      .groupBy(shiftright(col("zv"), shift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))

  /** Global ordinal assignment under a total order — the deterministic
    * corpus-shuffle pass that fixes training example order (sort by a
    * portable hash ⇒ a reproducible pseudo-random permutation).
    *
    * The tempting form — `row_number() OVER (ORDER BY …)` with no
    * partitioning — funnels the ENTIRE corpus through one task (the same
    * trap as a group-keyed ranking window, one worse). The scale shape is
    * range-partitioned sort + `zipWithIndex`: Spark samples range bounds,
    * sorts each partition independently, and zipWithIndex assigns ordinals
    * with one extra metadata-sized job (counting per-partition sizes to
    * compute offsets) — the corpus itself never converges on one node.
    * Ordering columns must form a total order (pass a unique tiebreak) or
    * ordinals within ties would be partitioning-dependent. */
  def globalOrdinals(df: DataFrame, ord: Seq[org.apache.spark.sql.Column]):
      DataFrame = {
    val sorted = df.orderBy(ord: _*)
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
  }
}
