package graft.operators

import graft.functions.Portable._
import graft.functions.RollingHash31
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable text-analysis operators over a (doc_id, text, …) relation — the
  * public library surface behind the gated text queries (which bind them to
  * the fixture's `documents` table and stopword lists).
  *
  * Hot per-token loops run as single typed maps (raw JVM), never interpreted
  * Catalyst higher-order functions (~50× codegen for this shape — see the
  * repo's hard-won rules); pure column arithmetic stays declarative so
  * Catalyst keeps pushdown/pruning.
  */
object TextOps {

  /** Reference-tokenizer wordcount: explode + hash aggregate. Partial→final
    * aggregation ships one count per distinct word per partition instead of
    * one pair per token occurrence — the engine's core win over the
    * reference shuffle (reference mapreduce.c:75-86). */
  def wordcount(docs: DataFrame): DataFrame =
    docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Frozen-BPE tokenizer APPLICATION — the ingest-time half of the BPE
    * story ([[bpePairCounts]] is the training half): every distinct word is
    * segmented against a pinned, priority-ordered merge table by the
    * canonical algorithm — repeatedly take the highest-priority merge whose
    * pair occurs in the current segmentation and fuse its LEFTMOST
    * occurrence, until no merge applies. One-at-a-time leftmost fusion is
    * the semantics a replaying engine can state exactly (and equals
    * batch-per-pair fusion for non-self-overlapping pairs).
    *
    * Runs over the WORDCOUNT relation, not the corpus: tokenizing a 100 TB
    * corpus is a vocab-sized job + a broadcast join back, never per-token
    * work per occurrence — the same vocab-sized discipline as
    * bpePairCounts. One typed map; steps per word ≤ word length. */
  def bpeApply(wordcounts: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val s = wordcounts.sparkSession
    import s.implicits._
    val ms = merges.toArray
    wordcounts.select(col("word"), col("cnt")).as[(String, Long)]
      .map { case (w, cnt) =>
        var syms: Array[String] = w.map(_.toString).toArray
        var done = false
        while (!done) {
          var mi = -1
          var pos = -1
          var m = 0
          while (m < ms.length && mi < 0) {
            val (a, b) = ms(m)
            var i = 0
            while (i < syms.length - 1 && mi < 0) {
              if (syms(i) == a && syms(i + 1) == b) { mi = m; pos = i }
              i += 1
            }
            m += 1
          }
          if (mi < 0) done = true
          else {
            val nn = new Array[String](syms.length - 1)
            Array.copy(syms, 0, nn, 0, pos)
            nn(pos) = syms(pos) + syms(pos + 1)
            Array.copy(syms, pos + 2, nn, pos + 1, syms.length - pos - 2)
            syms = nn
          }
        }
        (w, cnt, syms.mkString(" "), syms.length.toLong)
      }.toDF("word", "cnt", "tokens", "n_tokens")
  }

  /** RAG-style overlapping token-window chunking: each document splits into
    * `width`-token chunks every `stride` tokens (stride < width ⇒ adjacent
    * chunks overlap by width−stride tokens, so a retrieval hit near a chunk
    * boundary still carries its context). Chunk count is
    * 1 if len ≤ width else ⌈(len−width)/stride⌉+1 — the last chunk is the
    * first whose window reaches the document end, so no token is uncovered
    * and no start position begins past the end (a tail start whose tokens
    * are already fully covered by the previous chunk is never emitted).
    *
    * One typed flatMap, no shuffle: output is (doc_id, chunk_idx, n_tokens,
    * chunk_text), ~len/stride rows per doc. At 100 TB this is the map-only
    * pre-pass of an embedding/indexing pipeline — the chunk stream feeds
    * straight into encode/write without ever aggregating. */
  def chunk(docs: DataFrame, width: Int = 30, stride: Int = 20): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = tokensJvm(text)
        val n =
          if (t.length <= width) 1
          else (t.length - width + stride - 1) / stride + 1
        (0 until n).iterator.map { i =>
          val start = i * stride
          val take = math.min(width, t.length - start)
          (id, i.toLong, take.toLong,
            t.slice(start, start + take).mkString(" "))
        }
      }.toDF("doc_id", "chunk_idx", "n_tokens", "chunk_text")
  }

  /** Stopword-overlap language ID. One typed map computes every language's
    * score in a single token pass; prediction is argmax with earlier
    * languages winning ties, `unknown` when nothing matches. Output:
    * (doc_id, pred_lang, s_<lang>…), one score column per input language. */
  def langId(docs: DataFrame, stops: Seq[(String, Seq[String])]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val sets = stops.map { case (l, ws) => (l, ws.toSet) }
    val scored = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = tokensJvm(text)
        val scores = sets.map { case (_, ws) => t.count(ws.contains).toLong }
        val pred =
          if (scores.sum == 0) "unknown"
          else sets(scores.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2)._1
        (id, pred, scores)
      }.toDF("doc_id", "pred_lang", "scores")
    stops.zipWithIndex.foldLeft(scored) { case (df, ((l, _), i)) =>
      df.withColumn(s"s_$l", col("scores").getItem(i))
    }.drop("scores")
  }

  /** Per-doc quality stats in one typed map: code-point lengths (the JVM
    * mirror of Spark/DuckDB length()), distinct/stopword/alpha token counts,
    * and ratio scores whose double evaluation order matches the oracle SQL;
    * token-free docs emit zeros (not NULL/NaN). */
  def quality(docs: DataFrame, stopwords: Set[String]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val alpha = java.util.regex.Pattern.compile("[a-z]+")
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = tokensJvm(text)
        val nChars = text.codePointCount(0, text.length).toLong
        val nTokens = t.length.toLong
        val nDistinct = t.distinct.length.toLong
        var sumTokLen = 0L
        var nStop = 0L
        var nAlpha = 0L
        t.foreach { tk =>
          sumTokLen += tk.codePointCount(0, tk.length)
          if (stopwords.contains(tk)) nStop += 1
          if (alpha.matcher(tk).matches()) nAlpha += 1
        }
        val (avgTokLen, stopRatio, quality) =
          if (nTokens == 0) (0.0, 0.0, 0.0)
          else (
            sumTokLen.toDouble / nTokens.toDouble,
            nStop.toDouble / nTokens.toDouble,
            nDistinct.toDouble / nTokens.toDouble * 0.5
              + nAlpha.toDouble / nTokens.toDouble * 0.3
              + nStop.toDouble / nTokens.toDouble * 0.2)
        (id, nChars, nTokens, nDistinct, sumTokLen, nStop, nAlpha,
          avgTokLen, stopRatio, quality)
      }
      .toDF("doc_id", "n_chars", "n_tokens", "n_distinct", "sum_tok_len",
        "n_stop", "n_alpha", "avg_tok_len", "stop_ratio", "quality_score")
  }

  /** Gopher/MassiveText-style repetition stats — the quality filter that
    * catches degenerate generation loops and boilerplate (Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021, Table A1): the fraction of
    * the document claimed by its single most frequent bigram, and the
    * distinct ratio of its 5-gram stream. Everything per-doc happens in ONE
    * typed map over raw JVM collections (a groupBy over exploded n-grams
    * would shuffle the whole corpus re-keyed by gram text; per-doc stats
    * never need to leave the row). Integer counts first, doubles derived by
    * formulas written identically in the oracle SQL. Thresholds follow the
    * Gopher appendix (top-2-gram fraction > 0.20, duplicate-5-gram fraction
    * > 0.15 → flagged). */
  def repetition(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = tokensJvm(text)
        val n = t.length.toLong
        val bc = scala.collection.mutable.HashMap.empty[String, Long]
        var i = 0
        while (i < t.length - 1) {
          val bg = t(i) + " " + t(i + 1)
          bc.update(bg, bc.getOrElse(bg, 0L) + 1L)
          i += 1
        }
        val top2 = if (bc.isEmpty) 0L else bc.valuesIterator.max
        val g5 = scala.collection.mutable.HashSet.empty[String]
        var n5 = 0L
        i = 0
        while (i + 4 < t.length) {
          g5.add(t(i) + " " + t(i + 1) + " " + t(i + 2) + " " + t(i + 3)
            + " " + t(i + 4))
          n5 += 1
          i += 1
        }
        val top2Frac =
          if (n == 0) 0.0 else (2L * top2).toDouble / n.toDouble
        val dup5Frac =
          if (n5 == 0) 0.0 else (n5 - g5.size).toDouble / n5.toDouble
        (id, n, top2, top2Frac, n5, g5.size.toLong, dup5Frac,
          top2Frac > 0.2 || dup5Frac > 0.15)
      }
      .toDF("doc_id", "n_tokens", "top2_cnt", "top2_frac", "n_5grams",
        "n_uniq_5grams", "dup5_frac", "is_repetitive")
  }

  /** Greedy sequence packing — the "example packing" pass that assembles
    * training sequences from variable-length documents without splitting
    * them: within each (lang, shard), docs in doc_id order fill a
    * `budget`-token bin until the next doc would overflow, which starts a
    * new bin (an oversized doc gets a bin alone). Packing is inherently
    * sequential, so the corpus is SHARDED by a portable hash of doc_id and
    * packed per shard: one shuffle on (lang, shard), per-group sorted
    * iterator state machine via flatMapSortedGroups — embarrassingly
    * parallel, deterministic, and independent of input partitioning. At
    * 100 TB raise `nShards` to the write parallelism you want; real
    * pipelines pack per output shard anyway. Returns one row per bin:
    * (lang, shard, bin, n_docs, bin_tokens). */
  def packBins(docs: DataFrame, budget: Long = 2048,
      nShards: Int = 16): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val d = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        (id, lang, tokensJvm(text).length.toLong,
          math.floorMod(md5Long60(id.toString), nShards.toLong))
      }
    d.groupByKey { case (_, lang, _, shard) => (lang, shard) }
      .flatMapSortedGroups($"_1") { case ((lang, shard), it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long)]
        var bin = 0L; var fill = 0L; var nDocs = 0L; var first = true
        def flush(): Unit =
          if (!first) out += ((lang, shard, bin, nDocs, fill))
        it.foreach { case (_, _, n, _) =>
          if (first) { fill = n; nDocs = 1; first = false }
          else if (fill + n > budget) {
            out += ((lang, shard, bin, nDocs, fill))
            bin += 1; fill = n; nDocs = 1
          } else { fill += n; nDocs += 1 }
        }
        flush()
        out.iterator
      }
      .toDF("lang", "shard", "bin", "n_docs", "bin_tokens")
  }

  /** Whitespace-token, BPE-ish regex-token, and distinct-vocab counts —
    * pure column functions (codegen'd, pruned to the two needed columns). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 \\t\\r\\n]"), lit(0)))
        .cast("long").as("n_bpe_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_vocab"))

  /** Rolling-hash (31-base mod 2³¹−1, native codegen'd expression) and
    * normalized-md5 document fingerprints. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      RollingHash31.column(col("text")).as("fp31"),
      normMd5(col("text"))
        .as("fp_md5"))

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * algorithm): hash every k-char gram of the text (the [[graft.functions
    * .RollingHash31]] polynomial, so the oracle replays each gram hash with
    * the same list_reduce form), slide a w-window over the hash sequence,
    * and select each window's MINIMUM hash, rightmost position on ties. The
    * selected set is the document fingerprint, with the paper's guarantee:
    * any substring shared between two docs of length ≥ w+k−1 contributes at
    * least one common selected hash (WinnowSpec pins this on planted
    * overlaps). Docs shorter than w grams winnow their single truncated
    * window; gram-less docs emit zero counts.
    *
    * Scale shape: ONE typed map per doc, no shuffles before the per-doc
    * summary — selection is local by design (that is the point of the
    * paper: local algorithms give position-stable fingerprints under edits,
    * so incremental re-ingest only re-fingerprints changed docs). Output is
    * the per-doc summary (counts + order-independent sums over the distinct
    * selected positions); the selected (hash, pos) pairs themselves would
    * feed a dedup join exactly like [[graft.queries.DedupQueries]]' shingle
    * tables. */
  def winnow(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // ONE codePoints materialization per doc — shared with the
        // selection via the array overload
        val cps = text.codePoints().toArray
        val g = math.max(cps.length - k + 1, 0)
        val sel = winnowSelect(cps, k, w)
        (id, g.toLong, sel.length.toLong, sel.map(_._2).sum,
          sel.map(_._1.toLong).sum)
      }
      .toDF("doc_id", "n_grams", "n_selected", "sel_hash_sum", "sel_pos_sum")
  }

  /** The pure selection underneath [[winnow]]: distinct (1-based position,
    * gram hash) pairs chosen by rightmost-argmin windows over the code-point
    * k-gram rolling hashes. Exposed so the SIGMOD-03 guarantee (shared
    * substrings of ≥ w+k−1 chars share a fingerprint) is directly
    * testable. */
  def winnowSelect(text: String, k: Int, w: Int): IndexedSeq[(Int, Long)] =
    winnowSelect(text.codePoints().toArray, k, w)

  /** Array form of [[winnowSelect]] for callers that already hold the
    * code points (winnow's per-doc map — avoids a second materialization). */
  def winnowSelect(cps: Array[Int], k: Int, w: Int): IndexedSeq[(Int, Long)] = {
    val g = cps.length - k + 1
    if (g <= 0) IndexedSeq.empty
    else {
      val h = new Array[Long](g)
      var i = 0
      while (i < g) {
        var v = 0L
        var j = 0
        while (j < k) { v = (v * 31L + cps(i + j)) % 2147483647L; j += 1 }
        h(i) = v
        i += 1
      }
      val selected = scala.collection.mutable.SortedSet.empty[Int]
      val nWin = math.max(1, g - w + 1)
      var jw = 0
      while (jw < nWin) {
        val end = math.min(jw + w, g)
        var best = jw
        var p = jw + 1
        while (p < end) { if (h(p) <= h(best)) best = p; p += 1 }
        selected += best
        jw += 1
      }
      selected.toIndexedSeq.map(p => (p + 1, h(p)))
    }
  }

  /** Deterministic train/holdout split by portable key hash: bucket =
    * md5-derived 60-bit hash of the key's string form mod nBuckets, rows in
    * buckets [0, trainBuckets) are "train". Hash-based splitting is the
    * 100 TB-correct assignment — stable under reruns, repartitioning, and
    * incremental arrivals (a row's split never depends on what else is in
    * the dataset), and the md5 discipline makes it exactly replayable by
    * any engine (see Portable.MD5LONG). */
  def hashSplit(df: DataFrame, keyCol: String, nBuckets: Int,
      trainBuckets: Int): DataFrame =
    df.withColumn("split",
      when(pmod(md5Long(col(keyCol).cast("string")), lit(nBuckets))
        < trainBuckets, "train").otherwise("holdout"))

  /** Token-length histogram per language: fixed-width integer buckets
    * (`bucket_lo = n_tokens − n_tokens mod width`) — corpus telemetry every
    * training-data pipeline tracks (length filtering thresholds, truncation
    * budgets). Bucketing is pure integer arithmetic (portable to any engine,
    * no float log2 edge cases) and the aggregate is partial→final over
    * (lang, bucket) — a domain of a few hundred cells, so the shuffle is
    * metadata-sized at 100 TB. The per-doc token count runs in the same
    * single typed map the other text stats use (no interpreted HOFs). */
  def tokenHist(docs: DataFrame, width: Long = 10): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("lang"), col("text")).as[(String, String)]
      .map { case (lang, text) => (lang, tokensJvm(text).length.toLong) }
      .toDF("lang", "n_tokens")
      .groupBy(col("lang"),
        (col("n_tokens") - pmod(col("n_tokens"), lit(width))).as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  /** Adjacent-token bigrams, one row per occurrence, in a single typed
    * flatMap (the hot per-token loop stays raw JVM per the repo rule — a
    * nested `transform`+`slice` HOF chain would be interpreted). Feed the
    * result to a wordcount-shaped aggregate: partial→final combine ships one
    * count per distinct bigram per partition, and the n-gram domain grows
    * sub-linearly in the corpus, so the shuffle stays narrow at 100 TB. */
  def bigrams(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("text")).as[String]
      .flatMap { text =>
        val t = tokensJvm(text)
        if (t.length < 2) Iterator.empty
        else (0 until t.length - 1).iterator.map(i => t(i) + " " + t(i + 1))
      }.toDF("bigram")
  }

  /** Ordered PII-style regex scrub. `rules` = (name, pattern, replacement),
    * applied left→right; each rule's match count (`n_<name>`) is taken on
    * the text AS THAT RULE SEES IT — after the earlier rules' replacements —
    * so e.g. digits inside an already-redacted email are not double-counted.
    * Patterns must stay in the RE2-compatible subset (character classes,
    * quantifiers — no backrefs/lookahead) so any engine replays them
    * identically; pure codegen'd column ops, one projection, no shuffle. */
  def redact(docs: DataFrame, rules: Seq[(String, String, String)]): DataFrame = {
    Markers.requireFree(docs, "redact input",
      "_cur" +: rules.map { case (name, _, _) => s"n_$name" }: _*)
    val scrubbed = rules.foldLeft(docs.withColumn("_cur", col("text"))) {
      case (df, (name, pat, rep)) =>
        df.withColumn(s"n_$name", regexp_count(col("_cur"), lit(pat)).cast("long"))
          .withColumn("_cur", regexp_replace(col("_cur"), pat, rep))
    }
    scrubbed.select(col("doc_id") +: col("_cur").as("clean")
      +: rules.map { case (name, _, _) => col(s"n_$name") }: _*)
  }

  /** BM25 ranking of `docs` against a fixed term list (k1/b are the
    * classic Robertson constants; idf = ln((N−df+0.5)/(df+0.5)+1), the
    * Lucene non-negative form).
    *
    * Scale shape: per-doc term frequencies come from ONE typed map over the
    * token stream (no interpreted HOFs, no per-term scans); the corpus
    * statistics (N, Σdl, per-term df) are a single-row aggregate that
    * broadcasts; only docs matching ≥1 term survive into scoring, so the
    * scored set is query-selectivity-sized, not corpus-sized. Score doubles
    * are summed in FIXED term order (left-assoc) so an oracle replaying the
    * same expression tree is bit-identical. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // the hit predicate and the score both reduce over terms — an empty
    // list would die in reduceLeft with no hint; make the contract explicit
    require(terms.nonEmpty, "bm25: terms must be non-empty")
    val s = docs.sparkSession
    import s.implicits._
    val termIdx = terms.zipWithIndex.toMap
    val nTerms = terms.length
    val perDoc = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val t = tokensJvm(text)
        val tf = new Array[Long](nTerms)
        t.foreach { tk => termIdx.get(tk) match {
          case Some(i) => tf(i) += 1
          case None =>
        } }
        (id, t.length.toLong, tf)
      }.toDF("doc_id", "dlen", "tf")
    val wide = perDoc.select(
      col("doc_id") +: col("dlen") +:
        terms.indices.map(i => col("tf").getItem(i).as(s"tf_$i")): _*)
    val stats = wide.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dlen")).as("sum_dl")
        +: terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val hit = terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _)
    val j = wide.where(hit).crossJoin(broadcast(stats))
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    def termScore(i: Int) = {
      val tfD = col(s"tf_$i").cast("double")
      val dfD = col(s"df_$i").cast("double")
      val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      idf * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dlen").cast("double") / avgdl))
    }
    j.select(col("doc_id"), col("dlen"),
      terms.indices.map(termScore).reduce(_ + _).as("score"))
  }

  /** First-iteration BPE pair statistics — the tokenizer-training pass:
    * adjacent character-pair frequencies over the corpus, which is exactly
    * what one merge round of byte-pair encoding maximizes. Scale shape: the
    * corpus tokenizes ONCE into a wordcount (partial→final aggregate), and
    * the per-character work then runs over the DISTINCT vocabulary weighted
    * by word frequency — vocab-sized (~10⁶ rows at 100 TB), never
    * corpus-sized. Pairs are UTF-16 code-unit bigrams (= character bigrams
    * on BMP text; the fixture has none beyond). Returns (pair, cnt), one
    * row per distinct adjacent pair. */
  def bpePairCounts(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    wordcount(docs).as[(String, Long)]
      .flatMap { case (w, c) =>
        (0 until w.length - 1).iterator.map(i => (w.substring(i, i + 2), c))
      }
      .toDF("pair", "w_cnt")
      .groupBy("pair")
      .agg(sum(col("w_cnt")).as("cnt"))
  }

  /** BPE merge-TRAINING loop (Sennrich, Haddow, Birch, "Neural Machine
    * Translation of Rare Words with Subword Units", ACL 2016 — the canonical
    * BPE trainer; [[bpePairCounts]] is one round's statistics,
    * [[bpeApply]] the frozen-table consumer): for `rounds` iterations,
    * count adjacent symbol pairs over the current segmentation (weighted by
    * word frequency), take the argmax pair (count desc, then (left, right)
    * asc — a deterministic tiebreak both engines replay), and fuse its
    * occurrences left-to-right in every word. Returns the LEARNED MERGE
    * TABLE (round, lft, rgt, pair_cnt) — the artifact a tokenizer ships.
    *
    * Scale shape: state is the segmented VOCABULARY (never the corpus —
    * ~10⁶ rows at 100 TB), each round is one partial→final pair aggregate
    * plus a metadata-sized argmax collect (the merge table is driver-side
    * by nature, like [[graft.operators.SimilarityOps.trainCentroids]]), and
    * the re-segmentation is a map over the vocab. Lineage is cut on a
    * CADENCE (every 4th fusion), not every round: a round's re-segmentation
    * is a pure narrow map — no joins, so no estimated-stats compounding —
    * and letting up to 3 pending fusion maps fuse into the next round's
    * pair-count job is cheaper than materializing 32 checkpoint blocks per
    * round (measured: per-round checkpointing doubled the loop's job count
    * and its wall time at sf0.1; same cadence reasoning as kCore's
    * every-2nd-round and pageRank's every-6th-sweep cuts). The initial
    * checkpoint stays: it truncates the corpus-sized wordcount aggregate
    * out of every round's lineage.
    *
    * Left-to-right single-pass fusion equals iterated leftmost fusion for a
    * single pair (the fused symbol a+b is strictly longer than a, so a
    * fusion can never create a new (a,b) adjacency), which is exactly the
    * recursive-CTE walk the oracle replays. */
  def bpeTrain(wordcounts: DataFrame, rounds: Int): DataFrame = {
    val sp = wordcounts.sparkSession
    import sp.implicits._
    var seg: org.apache.spark.sql.Dataset[(String, Long)] =
      wordcounts.select(col("word"), col("cnt")).as[(String, Long)]
        .map { case (w, c) => (w.map(_.toString).mkString(" "), c) }
        .localCheckpoint()
    val learned = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    var sinceCut = 0
    while (r <= rounds && !exhausted) {
      val top = seg.flatMap { case (str, c) =>
          val syms = str.split(' ')
          (0 until syms.length - 1).iterator
            .map(i => (syms(i), syms(i + 1), c))
        }.toDF("lft", "rgt", "w")
        .groupBy("lft", "rgt").agg(sum(col("w")).as("pcnt"))
        .orderBy(col("pcnt").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        learned += ((r.toLong, a, b, top(0).getLong(2)))
        seg = seg.map { case (str, cnt) =>
          val syms = str.split(' ')
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.mkString(" "), cnt)
        }
        sinceCut += 1
        if (sinceCut >= 4) { sinceCut = 0; seg = seg.localCheckpoint() }
      }
      r += 1
    }
    learned.result().toDF("round", "lft", "rgt", "pair_cnt")
  }

  /** Unigram self-information scoring — the perplexity-shaped quality
    * signal of a pretraining pipeline: fit a unigram LM over the corpus
    * (token → count), then score each doc by its total information content
    * under that LM. To keep the oracle hash-exact, information is measured
    * in WHOLE BITS via integer bit width (`length(bin(x))`, identical in
    * DuckDB): info(token) = bits(T) − bits(cnt) ≈ ⌈log₂(T/cnt)⌉ — a rare
    * token scores high, "the" scores ~0. Production would use real
    * `ln(cnt/T)` doubles with a tolerance gate; the plan is identical.
    *
    * Scale shape: one explode → (doc, token, tf) partial→final aggregate;
    * the LM is a second partial aggregate OVER the pairs (never re-reading
    * text); pairs⋈LM is a shuffle join on token (zipfian — AQE skew-split
    * handles "the", whose pair rows spread across docs); the single-row
    * total broadcasts. The pairs subtree fans into both the LM and the
    * probe, so it is localCheckpoint'ed once (repo rule: fanned subtrees
    * recompute per branch). Output: (doc_id, dlen, score_bits, avg_bits)
    * with avg_bits the only double, formed by one final division. */
  def infoScore(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val lm = pairs.groupBy("token").agg(sum("tf").as("cnt"))
    val tot = lm.agg(sum("cnt").as("t"))
    val bitsT = length(bin(col("t"))).cast("long")
    val bitsCnt = length(bin(col("cnt"))).cast("long")
    pairs
      .join(lm, "token")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("dlen"),
        sum(col("tf") * (bitsT - bitsCnt)).as("score_bits"))
      .select(col("doc_id"), col("dlen"), col("score_bits"),
        (col("score_bits").cast("double") / col("dlen").cast("double"))
          .as("avg_bits"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * high-quality monolingual datasets from web crawl data", LREC 2020):
    * per-language head/middle/tail terciles of the unigram self-information
    * score — the split CCNet uses to keep the head and drop or down-weight
    * the tail. Per-doc score is [[infoScore]]'s exact whole-bit form,
    * quantized to integer CENTIBITS-per-token (floor(score/dlen·100) —
    * one IEEE division+multiply written identically in the oracle).
    *
    * The tercile thresholds come from a BOUNDED (lang, centibit) histogram
    * — never a corpus-sized ranking window (ntile over a lang partition
    * would put each language's whole corpus on one task): the histogram is
    * ≤ a few thousand bins per language, its cumulative window runs over
    * histogram rows only, and the two thresholds per language (smallest bin
    * with 3·cum ≥ n, resp. ≥ 2n — exact integer comparisons, no ceil)
    * broadcast back onto the corpus. Docs sharing a threshold bin share a
    * bucket (peer rows), which keeps the split deterministic on any engine.
    * Output: per (lang, bucket) doc/token totals and the bucket's centibit
    * extent.
    *
    * On the synthetic fixture the vocabulary is near-uniform (one count
    * octave), so most docs share the exact 5.00-bits/token bin and the
    * middle tercile is empty — the ties-share-a-bucket semantics, not a
    * defect; a Zipf-distributed real corpus spreads across octaves. */
  def pplBuckets(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "lang", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val lm = pairs.groupBy("token").agg(sum("tf").as("cnt"))
    val tot = lm.agg(sum("cnt").as("t"))
    val bitsT = length(bin(col("t"))).cast("long")
    val bitsCnt = length(bin(col("cnt"))).cast("long")
    // checkpointed: fans into the histogram and the bucket assignment
    val perDoc = pairs.join(lm, "token").crossJoin(broadcast(tot))
      .groupBy("doc_id", "lang")
      .agg(sum(col("tf")).as("dlen"),
        sum(col("tf") * (bitsT - bitsCnt)).as("score_bits"))
      .select(col("doc_id"), col("lang"), col("dlen"),
        floor(col("score_bits").cast("double") / col("dlen").cast("double")
          * lit(100.0)).cast("long").as("cb"))
      .localCheckpoint()
    val hist = perDoc.groupBy(col("lang"), col("cb"))
      .agg(count(lit(1)).as("nh"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cb"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val th = hist.withColumn("cum", sum(col("nh")).over(wcum))
      .join(hist.groupBy(col("lang")).agg(sum(col("nh")).as("n")), "lang")
      .groupBy(col("lang"))
      .agg(min(when(col("cum") * 3 >= col("n"), col("cb"))).as("t1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("cb"))).as("t2"))
    perDoc.join(broadcast(th), "lang")
      .select(col("lang"), col("dlen"), col("cb"),
        ((col("cb") > col("t1")).cast("long")
          + (col("cb") > col("t2")).cast("long")).as("ppl_bucket"))
      .groupBy(col("lang"), col("ppl_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("tok_sum"),
        min(col("cb")).as("cb_min"), max(col("cb")).as("cb_max"))
      .orderBy("lang", "ppl_bucket")
  }

  /** Token-budget mixture sampling — the data-mixing pass that downsamples
    * each language (domain) to hit target mixture weights within an overall
    * token budget. Census: one narrow aggregate (lang → token total). The
    * per-lang sampling rate, in ppm, is min(1, weight·budget / lang_tokens)
    * — computed with plain IEEE double arithmetic written identically in
    * the oracle (bit-deterministic; no transcendentals). Membership is the
    * portable md5 predicate on doc_id: partition-independent, re-runnable,
    * append-stable — never `rand()`. The narrow (lang, doc_id, n_tokens)
    * projection feeds both the census and the sampling pass, so it is
    * localCheckpoint'ed once; at 100 TB n_tokens would be a precomputed
    * column and the checkpoint a real table. Rates (|langs| rows) broadcast
    * back onto the corpus. `weightsPpt` are thousandths and must cover every
    * lang (missing langs get 0 → sampled out). `budgetShare` scales the
    * corpus total into the global token budget. */
  def mixBudgetSample(docs: DataFrame, weightsPpt: Map[String, Long],
      budgetShare: Double = 0.5): DataFrame = {
    val base = docs
      .select(col("lang"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .localCheckpoint()
    val census = base.groupBy("lang")
      .agg(sum(col("n_tokens")).as("lang_tokens"))
    val tot = base.agg(
      floor(sum(col("n_tokens")).cast("double") * lit(budgetShare))
        .cast("long").as("budget"))
    val w = weightsPpt.foldLeft(lit(0L)) { case (acc, (l, ppt)) =>
      when(col("lang") === l, lit(ppt)).otherwise(acc)
    }
    val target = floor(col("budget").cast("double") * w.cast("double")
      / lit(1000.0))
    val rates = census.crossJoin(broadcast(tot))
      .select(col("lang"), col("lang_tokens"),
        least(lit(1000000L),
          floor(target * lit(1000000.0) / col("lang_tokens").cast("double"))
            .cast("long")).as("rate_ppm"))
    base
      .join(broadcast(rates), "lang")
      .where(pmod(md5Long(col("doc_id").cast("string")), lit(1000000L))
        < col("rate_ppm"))
      .groupBy(col("lang"), col("lang_tokens"), col("rate_ppm"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sampled_tokens"))
  }

  /** The training-data pipeline: token/distinct quality filter → exact
    * dedup keeping the lowest doc_id per normalized text → per-language
    * corpus stats. The keep-first step is min_by (partial→final hash
    * aggregate), never a ranking window over the norm hash: a boilerplate
    * page duplicated millions of times folds map-side instead of sorting
    * its whole group on one task. */
  def cleanPipeline(docs: DataFrame, minTokens: Long,
      minDistinctRatio: Double): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
      .where(col("n_tokens") >= minTokens &&
        col("n_distinct").cast("double") / col("n_tokens").cast("double")
          >= minDistinctRatio)
    scored
      .withColumn("norm_md5",
        normMd5(col("text")))
      .groupBy(col("norm_md5"))
      .agg(min_by(
        struct(col("lang"), col("n_tokens"), col("n_distinct")),
        col("doc_id")).as("keep"))
      .select(col("keep.lang").as("lang"), col("keep.n_tokens").as("n_tokens"),
        col("keep.n_distinct").as("n_distinct"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_distinct")).as("total_distinct"))
  }

  /** Per-doc tf-idf keyword extraction: the top `k` most characteristic
    * terms of every document — the feature every search/tagging/clustering
    * pipeline derives first. Idf uses the whole-BIT discipline of
    * [[infoScore]] (idf_bits = bits(N) − bits(df), bits = `length(bin x)` =
    * ⌊log₂⌋+1): the score tf·idf_bits stays an exact INTEGER, so ranking is
    * bit-replayable by any engine — no ln()/float-idf drift, identical plan
    * shape to the real thing.
    *
    * Scale shape: the (doc_id, token, tf) pairs aggregate is checkpointed
    * once and feeds BOTH the df table and the scoring join (never
    * re-tokenize). The df join is token-keyed (AQE skew-split absorbs
    * stopwords); N is a single-row broadcast. The final ranking window
    * partitions by doc_id — corpus-cardinality keys whose partitions are
    * bounded by a DOC's distinct-term count, so there is no hot partition
    * by construction (unlike a window over a low-cardinality key, which
    * the repo bans). */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = pairs.groupBy("token").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    pairs.join(df, "token")
      .crossJoin(broadcast(nd))
      .withColumn("score",
        col("tf") * (length(bin(col("nd"))) - length(bin(col("df")))).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("token"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** Hashed-linear text-classifier INFERENCE — the fasttext-shaped quality
    * gate every web-scale corpus passes through (keep/drop by a linear score
    * over hashed token features). The model here is the hashing trick taken
    * to its portable extreme: weight(token) = portable 60-bit md5 hash mod
    * `buckets`, recentered to a signed range — i.e. a frozen random-weight
    * model, so inference is exactly replayable by ANY engine (the oracle
    * recomputes it in SQL) while exercising the real production plan: a
    * weight LOOKUP per token occurrence and a per-doc sum.
    *
    * Scale shape: ONE typed map over (doc_id, text) — tokenize, hash, sum —
    * zero shuffles, no weight-table join (the "table" is the hash function;
    * a learned model would broadcast its weight array into the same loop).
    * Integer weights make the per-doc score exact (no float-order drift);
    * `keep` is the downstream filter predicate. Token-free docs score 0. */
  def classify(docs: DataFrame, buckets: Int = 2001, bias: Long = 0L): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val half = (buckets - 1) / 2
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val ts = tokensJvm(text)
        var score = 0L
        var i = 0
        while (i < ts.length) {
          score += md5Long60(ts(i)) % buckets - half
          i += 1
        }
        (id, ts.length.toLong, score)
      }
      .toDF("doc_id", "n_tokens", "score")
      .withColumn("keep", col("score") > lit(bias))
  }

  /** Quality-classifier TRAINING loop — the learning half of the
    * [[classify]] story (fastText-style linear model over hashed
    * bag-of-words, here labeled by "is this doc English"): batch-perceptron
    * rounds, the distributed-exact form of perceptron learning. Per round:
    * score every doc under the current weights, and fold the summed update
    * Σ y·x over MISCLASSIFIED docs (y·score ≤ 0) into the weights. All
    * arithmetic is integer (counts, ±1 labels, long weights), so the loop
    * is bit-replayable by the oracle's unrolled round CTEs — the
    * q_bpe_train discipline applied to model training.
    *
    * Scale shape: the feature matrix (doc → `buckets` hashed token counts +
    * bias) is built in ONE typed map and localCheckpoint'ed — every round
    * rescans features, never text. Each round is one mapPartitions
    * partial→final reduce emitting a MODEL-sized (buckets+1 longs +
    * mistake count) update; weights broadcast read-only into the scoring
    * loop ([[graft.operators.SimilarityOps]] Lloyd-fit shape). Rounds are
    * driver-driven and few; corpus-sized state never leaves the executors.
    * Output: the weight-table trajectory (round, bucket, w, n_mistakes) —
    * the artifact a quality gate ships, and proof every round ran. */
  def classifierTrain(docs: DataFrame, buckets: Int = 64,
      rounds: Int = 4): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val dim = buckets + 1 // + intercept feature, constant 1 per doc
    val feats = docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (_, text, lang) =>
        val x = new Array[Long](dim)
        tokensJvm(text).foreach { t =>
          x((md5Long60(t) % buckets).toInt) += 1L
        }
        x(buckets) = 1L
        (if (lang == "en") 1L else -1L, x)
      }
      .localCheckpoint()
    var w = new Array[Long](dim)
    val trajectory = Seq.newBuilder[(Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val bw = s.sparkContext.broadcast(w)
      val (nMistakes, grad) = feats
        .mapPartitions { it =>
          val g = new Array[Long](dim)
          var n = 0L
          it.foreach { case (y, x) =>
            var score = 0L
            var i = 0
            while (i < dim) { score += bw.value(i) * x(i); i += 1 }
            if (y * score <= 0L) {
              n += 1L
              i = 0
              while (i < dim) { g(i) += y * x(i); i += 1 }
            }
          }
          Iterator.single((n, g))
        }
        .reduce { (a, b) =>
          val m = new Array[Long](dim)
          var i = 0
          while (i < dim) { m(i) = a._2(i) + b._2(i); i += 1 }
          (a._1 + b._1, m)
        }
      w = Array.tabulate(dim)(i => w(i) + grad(i))
      var b = 0
      while (b < dim) {
        trajectory += ((r.toLong, b.toLong, w(b), nMistakes))
        b += 1
      }
    }
    trajectory.result().toDF("round", "bucket", "w", "n_mistakes")
  }

  /** Deterministic exact-k uniform sample per group (the "carve 10k eval
    * docs per language" op): rank = portable md5 hash of the key, keep the k
    * SMALLEST per group. Runs through the bounded [[graft.functions
    * .TopKAggregator]] (score = −hash, partial→final), so each map task
    * ships ≤ k ids per group — never a ranking window over the group (a
    * 100 TB language would sort corpus-sized partitions on one task) and,
    * unlike rate-based sampling (`q_stratified_sample`), the output size is
    * EXACTLY k. Hash-ranking is re-runnable and append-stable: a doc's rank
    * never depends on what else arrived. */
  def sampleK(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val tk = udaf(new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    docs
      .select(col(groupCol).as("grp"),
        (-md5Long(col("doc_id").cast("string"))).as("neg_rank"),
        col("doc_id"))
      .groupBy(col("grp"))
      .agg(tk(col("neg_rank"), col("doc_id")).as("ids"))
      .select(col("grp"), posexplode(col("ids")))
      .select(col("grp").as(groupCol), (col("pos") + 1).cast("long").as("rnk"),
        col("col").as("doc_id"))
      .orderBy(groupCol, "rnk")
  }

  /** Deterministic weighted priority sample — the quality-weighted
    * training-mix draw: each doc gets an integer weight (1..8 by length
    * tier here; any integer quality score works) and priority
    * min(md5₆₀(id:1) … md5₆₀(id:w)) — the min of w independent portable
    * hashes, so P(doc A outranks doc B) = wA/(wA+wB): bottom-k over these
    * priorities IS weighted sampling without replacement (the exact-integer
    * twin of A-ES exponential keys, with no cross-engine pow/log hazard).
    * Scale: the per-doc priority is a typed map (no shuffle, w ≤ 8 md5s per
    * row); the global bottom-k folds through the bounded [[TopKAggregator]]
    * partial→final (≤ k rows per task — never a global sort), and the k
    * winners broadcast back against the per-doc map for their payload.
    * Deterministic: same corpus → same sample on any engine/partitioning. */
  def weightedPrioritySample(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val m = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        (lit(1L) + least(lit(7L), expr("n_chars div 400"))).as("weight"))
      .as[(Long, Long)]
      .map { case (id, w) =>
        var best = Long.MaxValue
        var r = 1L
        while (r <= w) {
          val h = md5Long60(s"$id:$r")
          if (h < best) best = h
          r += 1
        }
        (id, w, best)
      }.toDF("doc_id", "weight", "pri")
    val tk = udaf(new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    // negated priority: the aggregator keeps the k LARGEST scores, we want
    // the smallest priorities; ties break ascending id on both forms
    val ids = m.agg(tk(-col("pri"), col("doc_id")).as("ids"))
      .select(posexplode(col("ids")))
      .select((col("pos") + 1).cast("long").as("rnk"), col("col").as("doc_id"))
    m.join(broadcast(ids), "doc_id")
      .select(col("rnk"), col("doc_id"), col("weight"), col("pri"))
      .orderBy("rnk")
  }

  /** Per-domain document cap — the crawl-pipeline guard against one host
    * flooding the corpus: keep the top `k` docs per `source` by quality
    * (here n_chars desc, doc_id asc tiebreak), drop the rest. Same bounded
    * partial→final aggregator discipline as [[sampleK]] but through the
    * (Double, id) pairs variant so the ranking score survives into the
    * output without a join-back. A hot domain (the 100 TB failure mode —
    * one SEO farm with 10⁹ pages) folds to ≤ k rows per map task instead of
    * sorting its whole group on one task. */
  def domainCap(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val tk = udaf(new graft.functions.TopKPairsAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    docs
      .select(col("source"), col("n_chars").cast("double").as("sc"), col("doc_id"))
      .groupBy(col("source"))
      .agg(tk(col("sc"), col("doc_id")).as("tk"))
      .select(col("source"), posexplode(col("tk")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("col._2").as("doc_id"), col("col._1").cast("long").as("n_chars"))
      .orderBy("source", "rnk")
  }
}
