package graft

/** Partition-count invariance for the round-6 surfaces: the BPE training
  * loop (distributed argmax ties must break identically under any partial
  * aggregation), the real-decode media query (per-partition decoder
  * lifecycle), and the driver-gated streaming executions (state movement
  * across micro-batches must not depend on shuffle width). */
class PipelineInvarianceSpec extends SparkTestBase {

  private def run(name: String, parts: String): Seq[String] =
    withShufflePartitions(parts) {
      SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toString)
    }

  for (q <- Seq("q_bpe_train", "mm_decode", "mm_resize", "mm_binsource",
    "mm_features", "mm_frames", "mm_audio", "mm_audio_resample",
    "q_stream_tumbling", "q_stream_attrib", "q_stream_wordcount",
    "q_stream_dedup", "q_stream_sink", "q_stream_enrich", "q_stream_upsert",
    "q_stream_sliding", "q_classify_train", "q_quantile_merge",
    "q_shuffle_order", "q_waiting_supplier", "q_compaction",
    "q_dynamic_overwrite", "q_corrupt_json", "q_forward_fill",
    "q_table_checksum", "dedup_keep_best", "q_division", "q_min_cost",
    "q_xml_source", "q_recursive_cte", "q_skyline", "q_ivm_join",
    "q_time_travel", "q_dsv2_source", "q_dsv2_sink", "q_exact_quantile",
    "q_not_in", "q_interval_merge", "q_ppr", "q_ivm_delete")) {
    test(s"$q: identical results under shuffle partitions 1 vs 8") {
      assert(run(q, "1") == run(q, "8"), s"$q not partition-invariant")
    }
  }
}
