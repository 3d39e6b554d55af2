package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Column helpers whose values are bit-for-bit reproducible in DuckDB, so the
  * driver's hash-compare (Spark result vs oracle SQL) can succeed on floating
  * point outputs.
  *
  * Discipline: all aggregation happens on exact integers (money → cents,
  * embeddings → micro-scaled longs, hashes → md5-derived 60-bit longs);
  * doubles only ever appear as the *final* step via a formula written
  * identically on both sides. Integer sums are order-independent, so shuffle /
  * parallelism nondeterminism (the reference's own hazard, see
  * reference mapreduce.c:69-73 — unstable qsort ⇒ unspecified value order)
  * cannot perturb results.
  */
object Portable {

  /** Exact integer cents from a 2-decimal double.
    * DuckDB mirror: `CAST(round(x*100) AS BIGINT)`. */
  def cents(c: Column): Column = round(c * lit(100)).cast(LongType)

  /** Exact long-domain sum that cannot wrap: the addend casts to
    * decimal(38,0) so the GROUP sum stays exact at any row count (a plain
    * long sum of ~4e10-magnitude cents products wraps past ~10⁸ rows per
    * group — the 100 TB regime). This matches the oracles as written:
    * DuckDB's SUM over BIGINT accumulates in HUGEINT, exactly. Decimal
    * stays INTERNAL per the hash-gate rule — every caller casts to
    * double/long at the final select. */
  def exactSum(c: Column): Column = sum(c.cast(DecimalType(38, 0)))

  /** Order-independent money sum, exposed as double.
    * DuckDB mirror: `CAST(SUM(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100.0`. */
  def moneySum(c: Column): Column =
    exactSum(cents(c)).cast(DoubleType) / lit(100.0)

  /** Portable 60-bit hash: first 15 hex digits of md5 as a non-negative long.
    * DuckDB mirror: `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** JVM twin of [[md5Long]] for typed (Dataset) hot paths: bit-identical to
    * the Column form — first 15 hex digits = digest bytes 0-6 plus the high
    * nibble of byte 7. */
  def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** float[] embedding → exact micro-scaled long[] (|x| ≤ ~2 ⇒ ≤ 2e6; a
    * 64-dim dot product then stays ≪ 2^63).
    * DuckDB mirror: `list_transform(v, x -> CAST(round(x*1000000) AS BIGINT))`. */
  def intVec(c: Column): Column =
    transform(c, x => round(x.cast(DoubleType) * lit(1000000)).cast(LongType))

  /** Exact long dot product of two equal-length long arrays.
    * DuckDB mirror: `list_sum(list_transform(list_zip(a,b), z -> z[1]*z[2]))`. */
  def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine from an exact integer dot product + squared norms; identical
    * double formula on the DuckDB side:
    * `CAST(dot AS DOUBLE)/sqrt(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))`. */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast(DoubleType) / sqrt(na.cast(DoubleType) * nb.cast(DoubleType))

  /** Epoch microseconds as BIGINT. Parquet ms/ns timestamps surface as
    * TIMESTAMP_NTZ in Spark 4; the session zone is pinned to UTC so casting to
    * TIMESTAMP is value-preserving. DuckDB mirror: `epoch_us(x)`. */
  def epochUs(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Reference-shaped tokenization: split on `" \t\n\r"` (reference
    * main.c:22), lowercased, empties dropped. NB the reference `break`s at
    * the first EMPTY strsep token (main.c:23-24) — truncating the line —
    * rather than filtering; because the regex collapses separator runs, an
    * empty token can only arise at the line edges, where the two behaviors
    * coincide. The engine standardizes on filter semantics.
    * DuckDB mirror: `list_filter(string_split_regex(lower(x),'[ \t\r\n]+'),
    * t -> t <> '')`. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[ \\t\\r\\n]+"), t => t =!= "")

  /** JVM twin of [[tokens]] for typed hot loops (langId/quality/dedup
    * shingles/simhash): ONE definition so the five call sites cannot drift,
    * and Locale.ROOT so the lowercasing matches Spark/DuckDB `lower()`
    * regardless of the JVM default locale (a Turkish-locale JVM would
    * otherwise map I→ı and break the oracle hashes). */
  def tokensJvm(s: String): Array[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("[ \t\r\n]+").filter(_.nonEmpty)

  /** Whitespace-normalized md5 of a text column — the exact-dedup /
    * fingerprint key. One definition keeps dedup_exact, q_pipeline_clean,
    * text_fingerprint, and the streaming dedup in lockstep.
    * DuckDB mirror: [[NORMMD5]]. */
  def normMd5(c: Column): Column =
    md5(regexp_replace(trim(lower(c)), "[ \\t\\r\\n]+", " "))

  // ---- SQL-side fragments (single source of truth for the oracle strings) ----

  def CENTS(x: String): String = s"CAST(round(($x)*100) AS BIGINT)"
  def MONEY(x: String): String = s"(CAST(SUM(${CENTS(x)}) AS DOUBLE)/100.0)"
  def MD5LONG(x: String): String = s"CAST(('0x' || substr(md5($x),1,15)) AS BIGINT)"
  // NB: the inner CAST to DOUBLE is load-bearing — DuckDB would otherwise
  // multiply in single precision (FLOAT*INT → FLOAT) and round differently
  // than Spark's double-promoted arithmetic.
  def INTVEC(x: String): String =
    s"list_transform($x, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT))"
  def TOKENS(x: String): String =
    s"list_filter(string_split_regex(lower($x), '[ \\t\\r\\n]+'), t -> t <> '')"
  def NORMMD5(x: String): String =
    s"md5(regexp_replace(trim(lower($x)), '[ \\t\\r\\n]+', ' ', 'g'))"
}
