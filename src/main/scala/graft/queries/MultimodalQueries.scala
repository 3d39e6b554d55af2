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
    },

    // Frame sampling: one row per evenly-strided frame offset — the shape a
    // video sampler emits (graft.operators.MediaPipeline.frameOffsets),
    // derived with the same stub decode as mm_features. posexplode keeps the
    // whole expansion inside one narrow projection (no shuffle until the
    // final order).
    "mm_frames" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"), length(col("payload")).cast("long").as("byte_len"),
          sha2(col("payload"), 256).as("sha"))
        .withColumn("h1", conv(substring(col("sha"), 1, 8), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("sha"), 9, 8), 16, 10).cast("long"))
        .withColumn("n_frames", lit(1L) + pmod(col("h1") + col("h2"), lit(8L)))
        .withColumn("stride",
          greatest(expr("byte_len div n_frames"), lit(1L)))
        .select(col("doc_id"), col("n_frames"),
          posexplode(expr("array_repeat(stride, CAST(n_frames AS INT))")))
        .select(col("doc_id"), col("n_frames"),
          col("pos").cast("long").as("frame_idx"),
          (col("pos") * col("col")).as("frame_offset"))
        .orderBy("doc_id", "frame_idx")
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
        |FROM h ORDER BY doc_id""".stripMargin,

    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    sha256(text) AS sha
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, byte_len,
        |    1 + ((CAST(('0x' || substr(sha, 1, 8)) AS BIGINT)
        |        + CAST(('0x' || substr(sha, 9, 8)) AS BIGINT)) % 8) AS n_frames
        |  FROM m),
        |f AS (
        |  SELECT doc_id, n_frames,
        |    greatest(byte_len // n_frames, 1) AS stride,
        |    unnest(range(n_frames)) AS frame_idx
        |  FROM h)
        |SELECT doc_id, n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(frame_idx * stride AS BIGINT) AS frame_offset
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
}
