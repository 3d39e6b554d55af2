package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * The reference engine's only source is line-oriented local text opened by the
  * client mapper (reference main.c:13-18); here every table is a columnar
  * Parquet scan so Catalyst gets predicate pushdown + column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") canonEvents(df) else df
  }

  /** Canonicalize `events.ts` to the engine-internal shape: an epoch-NANOS
    * long — regardless of the fixture's physical encoding.
    *
    * The driver has shipped the fixture with two encodings so far: parquet
    * TIMESTAMP(NANOS) (read as a raw nanos BIGINT under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ, which this rescales ×1000 back to nanos).
    * Every downstream consumer — the `ts div 1000` micros normalizers, the
    * streaming-gate sentinels and median batch splits, the `ev.schema`
    * handed to file-stream readers — assumes the nanos-long shape, and the
    * oracle's `epoch_us(CAST(ts AS TIMESTAMP))` agrees with `ts div 1000`
    * under either encoding (session TZ is pinned UTC in every entry point,
    * so the NTZ→timestamp cast is wall-clock-preserving). Queries must load
    * events via [[apply]] (never a raw parquet read) so the next fixture
    * regeneration is a no-op.
    */
  def canonEvents(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType                         => df
    case TimestampType | TimestampNTZType =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalArgumentException(s"unsupported events.ts type: $other")
  }

  /** Schema-adaptive epoch-micros column for a `ts`-bearing frame that may
    * NOT have passed through [[canonEvents]] (e.g. a file stream reading the
    * fixture directly): nanos long → `div 1000`, timestamp → `unix_micros`. */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType                         => expr("ts div 1000")
    case TimestampType | TimestampNTZType =>
      unix_micros(col("ts").cast(TimestampType))
    case other =>
      throw new IllegalArgumentException(s"unsupported events.ts type: $other")
  }
}
