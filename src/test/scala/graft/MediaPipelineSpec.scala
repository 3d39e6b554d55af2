package graft

import graft.operators.MediaPipeline
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkTestBase {

  test("decodeAll: deterministic features, partitioning-invariant") {
    val payloads = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val a = MediaPipeline.decodeAll(payloads.repartition(1), MediaPipeline.FakeDecoder)
      .collect().map(m => (m.doc_id, m.byte_len, m.width, m.height, m.n_frames,
        m.features.toSeq)).toSet
    val b = MediaPipeline.decodeAll(payloads.repartition(7), MediaPipeline.FakeDecoder)
      .collect().map(m => (m.doc_id, m.byte_len, m.width, m.height, m.n_frames,
        m.features.toSeq)).toSet
    assert(a == b)
    assert(a.nonEmpty)
    a.foreach { case (_, len, w, h, nf, feats) =>
      assert(w >= 16 && h >= 16 && nf >= 1 && nf <= 8 && feats.size == 8 && len > 0)
    }
  }

  test("PgmDecoder: encode/decode round-trip matches pixel stats") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val w = 1 + rng.nextInt(40)
      val h = 1 + rng.nextInt(30)
      val px = Array.fill(w * h)(rng.nextInt(256).toByte)
      val (gw, gh, nf, feats) =
        MediaPipeline.PgmDecoder.decode(MediaPipeline.pgmPayload(w, h, px))
      val uv = px.map(_ & 0xff)
      assert((gw, gh, nf) == (w, h, 1))
      assert(feats.toSeq ==
        Seq(uv.map(_.toLong).sum.toFloat, uv.min.toFloat, uv.max.toFloat))
    }
  }

  test("PgmDecoder: loud failure on malformed payloads") {
    val ok = MediaPipeline.pgmPayload(2, 2, Array[Byte](1, 2, 3, 4))
    intercept[IllegalArgumentException] {
      MediaPipeline.PgmDecoder.decode("P6 2 2 255\n1234".getBytes)
    }
    intercept[IllegalArgumentException] {   // truncated raster
      MediaPipeline.PgmDecoder.decode(ok.dropRight(1))
    }
    intercept[IllegalArgumentException] {   // trailing junk
      MediaPipeline.PgmDecoder.decode(ok :+ 9.toByte)
    }
    intercept[IllegalArgumentException] {   // header cut mid-token
      MediaPipeline.PgmDecoder.decode("P5 2".getBytes)
    }
    intercept[IllegalArgumentException] {   // unsupported maxval
      MediaPipeline.PgmDecoder.decode("P5 2 2 65535\n1234".getBytes)
    }
  }

  test("PgmDecoder through decodeAll: distributed decode, any partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (1L to 40L).map { id =>
      val w = 1 + rng.nextInt(6)
      val h = 1 + rng.nextInt(6)
      id -> MediaPipeline.pgmPayload(w, h,
        Array.fill(w * h)(rng.nextInt(256).toByte))
    }
    val df = rows.toDF("doc_id", "payload")
    for (parts <- Seq(1, 7)) {
      val got = MediaPipeline.decodeAll(df.repartition(parts),
          MediaPipeline.PgmDecoder)
        .collect().map(m => m.doc_id -> (m.width.toLong * m.height)).toMap
      rows.foreach { case (id, payload) =>
        assert(got(id) == payload.length - 11,
          s"doc $id raster size mismatch under parts=$parts")
      }
    }
  }

  test("resizeNearest: matches an index model, any factor, degenerate dims") {
    val rng = new scala.util.Random(23)
    for (_ <- 1 to 40) {
      val w = 1 + rng.nextInt(12)
      val h = 1 + rng.nextInt(12)
      val px = Array.fill(w * h)(rng.nextInt(256).toByte)
      val payload = MediaPipeline.pgmPayload(w, h, px)
      for (f <- Seq(1, 2, 3, 20)) {   // 20 > dims: collapses to 1x1
        val (w2, h2, out) = MediaPipeline.resizeNearest(payload, f)
        assert(w2 == (w + f - 1) / f && h2 == (h + f - 1) / f)
        val model = for (r <- 0 until h2; c <- 0 until w2)
          yield px(r * f * w + c * f)
        assert(out.toSeq == model, s"${w}x$h f=$f")
      }
      // factor 1 is the identity
      assert(MediaPipeline.resizeNearest(payload, 1)._3.toSeq == px.toSeq)
    }
  }

  test("frameOffsets: evenly spaced, strictly in-range, degenerate-safe") {
    val offs = MediaPipeline.frameOffsets(1000, 4)
    assert(offs == Seq(0L, 250L, 500L, 750L))
    // more frames than bytes: truncate, never point past the payload
    assert(MediaPipeline.frameOffsets(3, 8) == Seq(0L, 1L, 2L))
    assert(MediaPipeline.frameOffsets(0, 4).isEmpty)
    assert(MediaPipeline.frameOffsets(10, 0).isEmpty)
    for (len <- Seq(1L, 7L, 1000L); nf <- Seq(1, 3, 8)) {
      val o = MediaPipeline.frameOffsets(len, nf)
      assert(o.forall(x => x >= 0 && x < len), s"len=$len nf=$nf -> $o")
      assert(o == o.sorted && o.distinct == o)
    }
  }
}
