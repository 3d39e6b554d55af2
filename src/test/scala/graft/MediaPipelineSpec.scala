package graft

import graft.operators.MediaPipeline
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkTestBase {

  test("PgmQuadDecoder: quadrant sums match a row/col model") {
    val rng = new scala.util.Random(31)
    for (_ <- 1 to 50) {
      val w = 1 + rng.nextInt(9)
      val h = 1 + rng.nextInt(9)
      val px = Array.fill(w * h)(rng.nextInt(256).toByte)
      val (gw, gh, _, feats) =
        MediaPipeline.PgmQuadDecoder.decode(MediaPipeline.pgmPayload(w, h, px))
      assert((gw, gh) == (w, h))
      val model = new Array[Long](4)
      for (r <- 0 until h; c <- 0 until w)
        model((if (r < (h + 1) / 2) 0 else 2) + (if (c < (w + 1) / 2) 0 else 1)) +=
          (px(r * w + c) & 0xff)
      assert(feats.toSeq == model.toSeq.map(_.toFloat), s"${w}x$h")
      assert(model.sum == px.map(v => (v & 0xff).toLong).sum)
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
    intercept[IllegalArgumentException] {   // w*h wraps Int to 0
      MediaPipeline.PgmDecoder.decode("P5 65536 65536 255\n".getBytes)
    }
    intercept[IllegalArgumentException] {   // w*h wraps Int negative
      MediaPipeline.frameIndex("P5 46341 46341 255\nxx".getBytes)
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

  test("WavDecoder: encode/decode round-trip matches sample stats") {
    val rng = new scala.util.Random(59)
    for (_ <- 1 to 50) {
      val rate = 8000 + rng.nextInt(40000)
      val n = rng.nextInt(64)
      val samples = Array.fill(n)(rng.nextInt(65536).toShort)
      val (gr, gn, nf, feats) = MediaPipeline.WavDecoder.decode(
        MediaPipeline.wavPayload(rate, samples))
      assert((gr, gn, nf) == (rate, n, 1))
      val iv = samples.map(_.toInt)
      val want =
        if (n == 0) Seq(0f, 0f, 0f)
        else Seq(iv.map(_.toLong).sum.toFloat, iv.min.toFloat, iv.max.toFloat)
      assert(feats.toSeq == want)
    }
  }

  test("WavDecoder: skips unknown chunks, loud on malformed containers") {
    val samples = Array[Short](100, -200, 300)
    val ok = MediaPipeline.wavPayload(8000, samples)
    // splice an unknown 5-byte chunk (odd size → 1 pad byte) between fmt
    // and data; RIFF size field must cover the insertion
    val junk = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = ok.take(36) ++ junk ++ ok.drop(36)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (r2, n2, _, f2) = MediaPipeline.WavDecoder.decode(spliced)
    assert((r2, n2) == (8000, 3) && f2.toSeq == Seq(200f, -200f, 300f))
    intercept[IllegalArgumentException] {   // not RIFF
      MediaPipeline.WavDecoder.decode("XIFF".getBytes ++ ok.drop(4))
    }
    intercept[IllegalArgumentException] {   // truncated data chunk
      MediaPipeline.WavDecoder.decode(ok.dropRight(1))
    }
    intercept[IllegalArgumentException] {   // stereo
      val bad = ok.clone()
      bad(22) = 2
      MediaPipeline.WavDecoder.decode(bad)
    }
    intercept[IllegalArgumentException] {   // non-PCM format code
      val bad = ok.clone()
      bad(20) = 3
      MediaPipeline.WavDecoder.decode(bad)
    }
  }

  test("decimateWav: matches an index model, any factor, degenerate lengths") {
    val rng = new scala.util.Random(67)
    for (_ <- 1 to 40) {
      val rate = 8000 + rng.nextInt(40000)
      val n = rng.nextInt(30)
      val samples = Array.fill(n)(rng.nextInt(65536).toShort)
      val payload = MediaPipeline.wavPayload(rate, samples)
      for (f <- Seq(1, 2, 3, 50)) {   // 50 > n: collapses to <=1 sample
        val (r2, kept) = MediaPipeline.decimateWav(payload, f)
        assert(r2 == rate / f)
        val model = (0 until n by f).map(samples)
        assert(kept.toSeq == model, s"n=$n f=$f")
      }
      assert(MediaPipeline.decimateWav(payload, 1)._2.toSeq == samples.toSeq)
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

  test("frameIndex: demuxes a concatenated P5 stream, mixed dims, loud on truncation") {
    val rng = new scala.util.Random(47)
    for (_ <- 1 to 30) {
      val frames = (1 to 1 + rng.nextInt(6)).map { _ =>
        val w = 1 + rng.nextInt(7)
        val h = 1 + rng.nextInt(7)
        (w, h, Array.fill(w * h)(rng.nextInt(256).toByte))
      }
      val payload = frames.map { case (w, h, px) =>
        MediaPipeline.pgmPayload(w, h, px)
      }.reduce(_ ++ _)
      val idx = MediaPipeline.frameIndex(payload)
      assert(idx.length == frames.length)
      // offsets are the running sum of per-frame encoded lengths, and each
      // frame's parsed dims round-trip
      var expect = 0L
      idx.zip(frames).foreach { case (fr, (w, h, px)) =>
        assert(fr.offset == expect && fr.w == w && fr.h == h)
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(payload, fr.pixStart, fr.pixStart + w * h),
          px))
        expect += MediaPipeline.pgmPayload(w, h, px).length
      }
      intercept[IllegalArgumentException] {   // truncated final frame
        MediaPipeline.frameIndex(payload.dropRight(1))
      }
    }
    assert(MediaPipeline.frameIndex(Array.emptyByteArray).isEmpty)
  }

  test("exactFloat guards the 2^24 float-exact boundary in sum features") {
    // The boundary itself is representable; one past it is not.
    assert(MediaPipeline.exactFloat(1L << 24, "b") == (1L << 24).toFloat)
    assert(MediaPipeline.exactFloat(-(1L << 24), "b") == -(1L << 24).toFloat)
    intercept[IllegalArgumentException] {
      MediaPipeline.exactFloat((1L << 24) + 1, "b")
    }
    // End-to-end: a WAV whose sample sum exceeds the domain fails loudly
    // instead of returning a rounded "exact" feature. 2^24+1 = 513·32704+65:
    // 513 samples of 32704 plus one of 65 (all within Short range).
    val over = Array.fill(513)(32704.toShort) :+ 65.toShort
    assert(over.map(_.toLong).sum == (1L << 24) + 1)
    intercept[IllegalArgumentException] {
      MediaPipeline.WavDecoder.decode(MediaPipeline.wavPayload(8000, over))
    }
    // Just inside the domain decodes exactly.
    val under = over.dropRight(1)
    val (_, n, _, feats) =
      MediaPipeline.WavDecoder.decode(MediaPipeline.wavPayload(8000, under))
    assert(n == 513 && feats(0) == 513L * 32704L)
  }

  test("sampleIndices: evenly spaced, in range, full coverage when k == n") {
    assert(MediaPipeline.sampleIndices(4, 3) == Seq(0, 1, 2))
    assert(MediaPipeline.sampleIndices(8, 4) == Seq(0, 2, 4, 6))
    assert(MediaPipeline.sampleIndices(3, 3) == Seq(0, 1, 2))
    assert(MediaPipeline.sampleIndices(1, 1) == Seq(0))
    assert(MediaPipeline.sampleIndices(0, 3).isEmpty)
    assert(MediaPipeline.sampleIndices(5, 0).isEmpty)
    for (n <- 1 to 12; k <- 1 to n) {
      val s = MediaPipeline.sampleIndices(n, k)
      assert(s.length == k && s.forall(i => i >= 0 && i < n))
      assert(s == s.sorted && s.distinct == s, s"n=$n k=$k -> $s")
    }
  }
}
