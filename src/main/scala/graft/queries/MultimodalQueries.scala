package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, with a deterministic stub decoder.
  *
  * The container has no codec libraries, so the decode step is a
  * clearly-marked deterministic fake (hash-derived dimensions / frame
  * geometry) — but the Spark-side plumbing is real: binary column, exact
  * byte-length + content-hash metadata, per-row feature derivation that stays
  * inside whole-stage codegen, and a deterministic frame-sampling stride. A
  * production decoder drops in at [[graft.operators.MediaPipeline]] via
  * mapPartitions without touching this schema.
  */
object MultimodalQueries {

  def queries: Map[String, Q] = Map(
    "mm_features" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          sha2(col("payload"), 256).as("sha"))
        // STUB DECODE: dimensions/frames derived from the content hash, not a
        // real codec — deterministic and portable to the oracle.
        .withColumn("h1", conv(substring(col("sha"), 1, 8), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("sha"), 9, 8), 16, 10).cast("long"))
        .withColumn("fake_width", lit(16L) + pmod(col("h1"), lit(1280L)))
        .withColumn("fake_height", lit(16L) + pmod(col("h2"), lit(720L)))
        .withColumn("n_frames", lit(1L) + pmod(col("h1") + col("h2"), lit(8L)))
        .withColumn("frame_stride", expr("byte_len div n_frames"))
        .drop("h1", "h2")
        .orderBy("doc_id")
    })

  def oracles: Map[String, String] = Map(
    "mm_features" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    sha256(text) AS sha
        |  FROM documents),
        |h AS (
        |  SELECT *, CAST(('0x' || substr(sha, 1, 8)) AS BIGINT) AS h1,
        |    CAST(('0x' || substr(sha, 9, 8)) AS BIGINT) AS h2
        |  FROM m)
        |SELECT doc_id, byte_len, sha,
        |  16 + (h1 % 1280) AS fake_width,
        |  16 + (h2 % 720) AS fake_height,
        |  1 + ((h1 + h2) % 8) AS n_frames,
        |  byte_len // (1 + ((h1 + h2) % 8)) AS frame_stride
        |FROM h ORDER BY doc_id""".stripMargin)
}
