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
