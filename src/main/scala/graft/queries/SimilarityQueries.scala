package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import graft.operators.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The gated similarity queries: bindings of the reusable
  * [[graft.operators.SimilarityOps]] operators (encode / brute-force top-k /
  * trained-IVF / hyperplane-LSH / grid-distributed near-dup) to the fixture
  * query set (vec_id < 10), with the DuckDB oracle SQL that replays each
  * operator — including the k-means training — term for term. Scale design
  * notes live on the operators themselves. */
object SimilarityQueries {

  private val NCells = 16
  private val NProbe = 4
  private val TopK = 5

  // k-means training schedule for the IVF centroids. Everything is pinned so
  // the DuckDB oracle can replay it exactly: the sample is vec_id % 4 == 0,
  // the 16 seeds are the sampled vectors below 64 (cid = vec_id/4), and two
  // Lloyd iterations run in exact long arithmetic with floored-double means.
  private val KmSampleMod = 4
  private val KmSeedBound = NCells * KmSampleMod // 16 seeds: sampled ids < 64
  private val KmIters = 2
  // PQ: 16 subspaces of 4 dims, 16 codewords each (same Lloyd schedule per
  // subspace) — 16 small codes (1 bit/dim) per vector in place of 64 longs;
  // ADC shortlists 10·k candidates per query for the exact re-rank.
  private val PqSub = 16
  private val PqShortlist = 10 * TopK

  // JL projection: 16 deterministic Achlioptas rows (entries −1/0/+1 at
  // density 1/3, seed 23) — integer-exact on both engines.
  private val JlK = 16
  private val jlMat: Seq[Seq[Long]] = {
    val rng = new scala.util.Random(23)
    Seq.fill(JlK)(Seq.fill(64) {
      val r = rng.nextInt(6)
      if (r == 0) 1L else if (r == 1) -1L else 0L
    })
  }

  /** The pinned training schedule bound to [[SimilarityOps.trainCentroids]]
    * (the oracle SQL below replays exactly these parameters). */
  private[graft] def trainCentroids(v: DataFrame): Seq[(Int, Seq[Long])] =
    SimilarityOps.trainCentroids(v, KmSampleMod, KmSeedBound, KmIters)

  /** The pinned PQ training schedule bound to
    * [[SimilarityOps.trainPqCodebooks]] (16 subspaces, same Lloyd schedule
    * per subspace as the IVF fit). */
  private[graft] def trainPq(v: DataFrame): Seq[Seq[Seq[Long]]] =
    SimilarityOps.trainPqCodebooks(v, PqSub, KmSampleMod, KmSeedBound, KmIters)

  // Random-hyperplane LSH: deterministic integer hyperplanes → sign-bit
  // buckets; integer coefficients keep the signature exact on both the
  // Spark and DuckDB sides. The single-table query uses 6 planes (64
  // buckets, cheap and selective); the OR-amplified variant trades cost for
  // recall with 4 independent SHORTER tables (4 planes → 16 buckets each):
  // per-table collision p^4 instead of p^6, recall 1-(1-p^4)^4.
  private val NPlanes = 6
  private def planesFor(seed: Int, n: Int = NPlanes): Seq[Seq[Long]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(64)((rng.nextInt(19) - 9).toLong))
  }
  // multi-table seeds are DISJOINT from the single-table seed 7: reusing it
  // would make table 0 a prefix-coarsening of the 6-plane signature and the
  // recall-dominance spec tautological (round-2 review finding)
  private val planes: Seq[Seq[Long]] = planesFor(7)
  private val multiTables: Seq[Seq[Seq[Long]]] =
    Seq(19, 11, 13, 17).map(planesFor(_, 4))

  /** Encoded corpus: vec_id, label, int vector, exact squared norm
    * ([[SimilarityOps.encode]], localCheckpoint-materialized). Memoized per
    * (session, dir): the sim queries share one encode+checkpoint instead of
    * re-quantizing the corpus each — the in-process form of the 100 TB
    * story (write the quantized vectors once, scan them many times). LRU-
    * bounded so a long-lived process cycling sessions/dirs cannot pin
    * stopped sessions or their checkpoint blocks forever (evicted entries
    * become unreachable and the ContextCleaner reclaims the blocks). */
  private val vecsCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > 4
    }
  private def vecs(s: SparkSession, dir: String): DataFrame =
    vecsCache.synchronized {
      // fingerprint-keyed so an in-place fixture regeneration misses (one
      // LIST + bounded tail reads; same rationale as the co-purchase cache)
      val fp = graft.sources.Sinks.fingerprint(s, s"$dir/embeddings.parquet")
      val k = (s, s"$dir@$fp")
      val hit = vecsCache.get(k)
      if (hit != null) hit
      else {
        val v = SimilarityOps.encode(Tables(s, dir, "embeddings"))
        vecsCache.put(k, v)
        v
      }
    }

  /** The streaming ANN maintenance index — one sub-index (the cell
    * assignment table) over the shared epoch/generation LSM machinery
    * ([[graft.operators.EpochGenIndex]]); at 100 TB this stored table IS
    * the IVF index, appended in O(batch) and compacted O(log) per row. */
  private[graft] val AnnIndex =
    new graft.operators.EpochGenIndex(Seq("asg"))

  /** One foreachBatch body of the streaming ANN maintenance (shared by
    * the gated query and StreamingRestartSpec): assign the arriving
    * batch against the FROZEN centroids (O(batch) — never a base rescan
    * or retrain), land it as an epoch dir (overwrite-idempotent, so a
    * re-delivered batch recomputes identical content and a folded epoch
    * stays ignored below the generation cut), compact if due. */
  private[graft] def annIngestBatch(st: String, centsPath: String,
      b: DataFrame, epochId: Long, compactEvery: Int): Unit = {
    val s = b.sparkSession
    SimilarityOps.assignCells(b, s.read.parquet(centsPath))
      .write.mode("overwrite").parquet(s"$st/asg/epoch=$epochId")
    AnnIndex.maybeCompact(s, st, compactEvery)
  }

  def queries: Map[String, Q] = Map(
    // exact cosine top-k for each query vector (vec_id < 10) — the baseline.
    "sim_topk" -> { (s, dir) =>
      val v = vecs(s, dir)
      SimilarityOps.bruteForceTopK(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)), TopK)
    },

    // IVF ANN: k-means-trained 16-cell inverted file, probe 4, search
    // in-cell. Training runs driver-side on the pinned sample (see
    // SimilarityOps.trainCentroids) and broadcasts; assignment of the full
    // corpus is one distributed map pass.
    "sim_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      val cents = trainCentroids(v).toDF("cid", "civ")
      SimilarityOps.ivfTopK(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)),
        cents, TopK, NProbe)
    },

    // INCREMENTAL IVF INDEX MAINTENANCE — the append path a production
    // vector store actually runs (r15 verdict gap #4): the index
    // (centroids + cell assignments) persists as a write-once layer;
    // when a batch of new vectors arrives, ONLY the batch is assigned —
    // against the FROZEN centroids — and lands as an epoch delta next to
    // the base assignment (the LshIndex epoch pattern), so maintenance
    // costs O(batch), never a corpus retrain/re-encode. Searches serve
    // from base ∪ epochs through ivfTopKAssigned (the stored-index form
    // of the probe). Because assignment is per-row pure and the
    // centroids are frozen, base + epoch assignments are VALUE-EQUAL to
    // a full rebuild with the same training set — which is exactly what
    // the oracle replays (k-means over the base slice, assignment of
    // the full corpus), so a maintenance path that retrained, dropped a
    // batch, or double-folded an epoch hash-fails. require() pins that
    // each epoch pass touched only batch-sized data.
    "sim_ann_incr" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      val sfN = new java.io.File(dir).getName
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(graft.sources.Sinks
          .fingerprint(s, s"$dir/embeddings.parquet")
          .getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString.take(10)
      val base = s"/root/repo/target/tmp/ivfincr-$sfN-$fp"
      val inputs = Seq(s"$dir/embeddings.parquet")
      // the base corpus is vec_id % 5 <> 4; the two append batches are
      // vec_id % 10 = 4 and = 9 (disjoint, exactly the complement)
      def batch(m: Int) = v.where(pmod(col("vec_id"), lit(10L)) === m)
      graft.sources.Sinks.ensureDir(s, s"$base/cents", "v1:ivf_cents",
        inputs = inputs) {
        SimilarityOps.trainCentroids(
          v.where(pmod(col("vec_id"), lit(5L)) =!= 4),
          KmSampleMod, KmSeedBound, KmIters)
          .toDF("cid", "civ").coalesce(1)
          .write.mode("overwrite").parquet(s"$base/cents")
      }
      val cents = s.read.parquet(s"$base/cents")
      graft.sources.Sinks.ensureDir(s, s"$base/asg_base",
        "v1:ivf_asg_base", inputs = inputs) {
        SimilarityOps.assignCells(
          v.where(pmod(col("vec_id"), lit(5L)) =!= 4), cents)
          .write.mode("overwrite").parquet(s"$base/asg_base")
      }
      for ((m, i) <- Seq((4, 0), (9, 1)))
        graft.sources.Sinks.ensureDir(s, s"$base/epoch_$i",
          s"v1:ivf_epoch_$i", inputs = inputs) {
          // the append pass reads ONLY the arriving batch — frozen
          // centroids, no base rescan, no retrain
          SimilarityOps.assignCells(batch(m), cents)
            .write.mode("overwrite").parquet(s"$base/epoch_$i")
        }
      for ((m, i) <- Seq((4, 0), (9, 1))) {
        val nEpoch = s.read.parquet(s"$base/epoch_$i").count()
        val nBatch = batch(m).count()
        require(nEpoch == nBatch,
          s"epoch $i must hold exactly the batch's assignments " +
            s"($nEpoch != $nBatch) — the append path rescanned or " +
            "dropped data")
      }
      val assigned = s.read.parquet(s"$base/asg_base")
        .unionByName(s.read.parquet(s"$base/epoch_0"))
        .unionByName(s.read.parquet(s"$base/epoch_1"))
      SimilarityOps.ivfTopKAssigned(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)),
        cents, assigned, TopK, NProbe)
    },

    // STREAMING ANN INDEX MAINTENANCE — the streaming twin of
    // sim_ann_incr, run as a real multi-batch foreachBatch execution
    // with a KILL/RESTART between batches: each arriving vector batch
    // assigns against the FROZEN centroids (O(batch) — never a base
    // rescan or retrain) and lands as an epoch dir of a persistent
    // AnnIndex (the EpochGenIndex LSM machinery the LSH dedup index
    // proved: size-tiered generation compaction, _SUCCESS-gated
    // activation, best-effort sweep). The restart continues epoch ids
    // from the checkpoint (pinned: active range exactly 0-1 — a
    // re-delivered epoch would leave one epoch and no fold), the two
    // epochs FOLD into one generation inside the gated execution
    // (compactEvery = 2, pinned: no live epochs remain), and the probe
    // serves base ∪ index — hash-gated against the full-rebuild oracle.
    // The build is a write-once layer (warm-up builds it; the timed
    // query reads the consolidated assignment), and the kill/restart
    // recovery contract is additionally spec-pinned in
    // StreamingRestartSpec.
    "q_stream_ann" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      val sfN = new java.io.File(dir).getName
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(graft.sources.Sinks
          .fingerprint(s, s"$dir/embeddings.parquet")
          .getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString.take(10)
      // shared write-once layers with sim_ann_incr (identical builders)
      val base = s"/root/repo/target/tmp/ivfincr-$sfN-$fp"
      val annBase = s"/root/repo/target/tmp/streamann-$sfN-$fp"
      val inputs = Seq(s"$dir/embeddings.parquet")
      def batch(m: Int) = v.where(pmod(col("vec_id"), lit(10L)) === m)
      graft.sources.Sinks.ensureDir(s, s"$base/cents", "v1:ivf_cents",
        inputs = inputs) {
        SimilarityOps.trainCentroids(
          v.where(pmod(col("vec_id"), lit(5L)) =!= 4),
          KmSampleMod, KmSeedBound, KmIters)
          .toDF("cid", "civ").coalesce(1)
          .write.mode("overwrite").parquet(s"$base/cents")
      }
      graft.sources.Sinks.ensureDir(s, s"$base/asg_base",
        "v1:ivf_asg_base", inputs = inputs) {
        SimilarityOps.assignCells(
          v.where(pmod(col("vec_id"), lit(5L)) =!= 4),
          s.read.parquet(s"$base/cents"))
          .write.mode("overwrite").parquet(s"$base/asg_base")
      }
      graft.sources.Sinks.ensureDir(s, s"$annBase/stream_asg",
        "v1:stream_ann_asg", inputs = inputs) {
        // session-unique work dir: concurrent builders cannot collide,
        // and the ensure* layer arbitrates who publishes
        val tmp = new java.io.File(s"$annBase/work-${System.nanoTime()}")
        tmp.mkdirs()
        val st = s"$tmp/state"
        val schema = batch(4).schema
        def start() = s.readStream.schema(schema)
          .parquet(s"$tmp/in/*.parquet")
          .writeStream
          .foreachBatch { (b: DataFrame, epochId: Long) =>
            annIngestBatch(st, s"$base/cents", b, epochId,
              compactEvery = 2)
          }
          .option("checkpointLocation", s"$tmp/ckpt")
          .start()
        graft.streaming.StreamingOps.withStreamShuffle(s) {
          val q1 = start()
          try {
            batch(4).write.parquet(s"$tmp/in/b1.parquet")
            q1.processAllAvailable()
          } finally q1.stop()
          // KILL/RESTART: a fresh query on the SAME checkpoint — epoch
          // ids continue, the landed epoch is not re-delivered
          val q2 = start()
          try {
            batch(9).write.parquet(s"$tmp/in/b2.parquet")
            q2.processAllAvailable()
          } finally q2.stop()
        }
        require(AnnIndex.activeRanges(s, st) == Seq((0L, 1L)),
          s"restart must continue epoch ids and the 2-epoch fold must " +
            s"have consolidated — got ${AnnIndex.activeRanges(s, st)}")
        require(AnnIndex.liveEpochs(s, st).isEmpty,
          "folded epochs must be swept — probes would double-read")
        val idx = AnnIndex.read(s, st, "asg")
        val nIdx = idx.count()
        val nBatches = batch(4).count() + batch(9).count()
        require(nIdx == nBatches,
          s"index must hold exactly the streamed assignments " +
            s"($nIdx != $nBatches) — a dropped or double-folded epoch")
        idx.write.mode("overwrite").parquet(s"$annBase/stream_asg")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(): Unit
        }
        rm(tmp)
      }
      val assigned = s.read.parquet(s"$base/asg_base")
        .unionByName(s.read.parquet(s"$annBase/stream_asg"))
      SimilarityOps.ivfTopKAssigned(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)),
        s.read.parquet(s"$base/cents"), assigned, TopK, NProbe)
    },

    // FILTERED ANN — the hybrid-search shape every production vector store
    // serves: nearest neighbors constrained by a metadata predicate
    // (label ≡ 0 mod 3 here, ~40% of the corpus). Pre-filtering composes
    // exactly with IVF because cell assignment is per-row pure: filtering
    // the corpus before assignment is value-identical to precomputing
    // corpus-wide assignments and intersecting the probed cells with the
    // predicate at query time (the index-layout form — at 100 TB the
    // assignment IS a stored column and this query is one predicate+cell
    // scan). Probes come from the FULL centroid geometry; the filter
    // narrows candidates, never the probe selection. The oracle replays
    // the filtered IVF end to end, k-means included.
    "sim_filtered_ann" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      val cents = trainCentroids(v).toDF("cid", "civ")
      SimilarityOps.ivfTopK(v.where(pmod(col("label"), lit(3)) === 0),
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)),
        cents, TopK, NProbe)
    },

    // Random-hyperplane LSH ANN: sign-bit bucket per vector (6 codegen'd
    // graft_dot projections), candidates = same bucket, exact cosine top-k.
    "sim_lsh" -> { (s, dir) =>
      val v = vecs(s, dir)
      SimilarityOps.lshTopK(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)), planes, TopK)
    },

    // Global most-similar pairs (SimilarityOps.globalTopPairs): corpus-wide
    // redundancy report off the same LSH buckets — TakeOrdered global
    // top-k, nothing pair-sized sorted.
    "sim_global_topk" -> { (s, dir) =>
      SimilarityOps.globalTopPairs(vecs(s, dir), planes, 20)
    },

    // OR-amplified LSH over four independent short hyperplane tables: a
    // candidate collides in ANY table (recall 1-(1-p^4)^4 vs the single
    // table's p^6), deduped on the narrow pair before one exact scoring
    // pass — the high-recall dial the single-table docs promise, gated.
    "sim_lsh_multi" -> { (s, dir) =>
      val v = vecs(s, dir)
      SimilarityOps.lshTopKMulti(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)),
        multiTables, TopK)
    },

    // embedding-cosine near-dup pairs, blocked by label, grid-distributed
    // (a hot label spreads across gridWidth² = 16 tasks; exactness and the
    // regime boundary are documented on SimilarityOps.nearDupPairs).
    "sim_neardup" -> { (s, dir) =>
      SimilarityOps.nearDupPairs(vecs(s, dir), minCos = 0.35,
        blockCol = "label", gridWidth = 4)
        .orderBy("vec_a", "vec_b")
    },

    // SemDeDup: semantic dedup bounded by the trained k-means cells
    // (SimilarityOps.semDedup) — assignment bounds the pair search to
    // Σ cell², within-cell pairs reuse the grid-distributed exact join,
    // keep = no smaller-id duplicate at cos ≥ 0.3 in the cell.
    "sim_semdedup" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      SimilarityOps.semDedup(v, trainCentroids(v).toDF("cid", "civ"),
        minCos = 0.3, gridWidth = 4)
    },

    // k-means clustering surfaced directly (SimilarityOps.kmeansStats): the
    // pinned-schedule centroids, full-corpus assignment, per-cell size +
    // exact integer inertia — the cluster-balance telemetry an IVF index
    // and a topic-mix monitor both read.
    "sim_kmeans" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      SimilarityOps.kmeansStats(v, trainCentroids(v).toDF("cid", "civ"))
        .orderBy("cid")
    },

    // int8 scalar-quantized search, gated by the exact-companion pattern
    // (like q_approx_distinct): the OUTPUT rows are the exact brute-force
    // top-k the oracle replays; the quantized path (byte-packed vectors,
    // native graft_dot_i8 kernel — a 4× scan-byte cut at 100 TB) re-ranks
    // the same queries and the appended boolean asserts its min per-query
    // recall@k stayed ≥ 0.6 — a drifting quantizer now FAILS the hash gate
    // instead of going unmeasured. (Measured min recall@5 on the fixtures is
    // 0.8 — near-tie flips, the one error class int8 rounding introduces —
    // so 0.6 leaves one more flip of slack without accepting a broken
    // quantizer, which scores ~0 recall.)
    "sim_quantized" -> { (s, dir) =>
      val v = vecs(s, dir)
      // exact fans into three branches (hits, per-qid k, output rows):
      // checkpoint the 50-row result instead of recomputing the corpus pass
      val exact = SimilarityOps.bruteForceTopK(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)), TopK)
        .localCheckpoint()
      val qz = SimilarityOps.quantizeI8(v).localCheckpoint()
      val qzq = SimilarityOps.asQuantizedQueries(qz.where(col("vec_id") < 10))
      val qtop = SimilarityOps.quantizedTopK(qz, qzq, TopK)
        .select(col("qid"), col("nbr_id"))
      val hits = exact.select(col("qid"), col("nbr_id"))
        .join(qtop, Seq("qid", "nbr_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("nhit"))
      val ok = exact.groupBy(col("qid")).agg(count(lit(1)).as("nk"))
        .join(hits, Seq("qid"), "left")
        .agg(min(coalesce(col("nhit"), lit(0L)).cast("double")
          / col("nk").cast("double")).as("min_recall"))
        .select((col("min_recall") >= lit(0.6)).as("quant_ok"))
      exact.crossJoin(broadcast(ok)).orderBy("qid", "rnk")
    },

    // Product-quantization ANN (SimilarityOps.trainPqCodebooks / pqEncode /
    // pqSearch: ADC shortlist over the 16-codes-per-vector compressed scan,
    // exact re-rank of the shortlist only), gated by the same
    // exact-companion pattern as sim_quantized: output rows are the exact
    // brute-force top-k the oracle replays, and the appended boolean
    // asserts the PQ path's min per-query recall@k stayed ≥ 0.4. PQ is the
    // aggressive end of the compression spectrum (16 codes/vector vs int8's
    // 64 bytes — 32× fewer scan bytes than the long-vector form), so its
    // gate is looser than int8's 0.6: measured min recall@5 on the fixtures
    // is 0.6 (mean 0.82) at shortlist 10·k; 0.4 leaves one flip of slack
    // while a broken codebook (shortlist ≈ random, recall ~0.1) still
    // fails the hash.
    "sim_pq" -> { (s, dir) =>
      val v = vecs(s, dir)
      val exact = SimilarityOps.bruteForceTopK(v,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)), TopK)
        .localCheckpoint()
      val books = trainPq(v)
      val codes = SimilarityOps.pqEncode(v, books)
      val ptop = SimilarityOps.pqSearch(v, codes,
        SimilarityOps.asQueries(v.where(col("vec_id") < 10)), books,
        TopK, PqShortlist)
        .select(col("qid"), col("nbr_id"))
      val hits = exact.select(col("qid"), col("nbr_id"))
        .join(ptop, Seq("qid", "nbr_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("nhit"))
      val ok = exact.groupBy(col("qid")).agg(count(lit(1)).as("nk"))
        .join(hits, Seq("qid"), "left")
        .agg(min(coalesce(col("nhit"), lit(0L)).cast("double")
          / col("nk").cast("double")).as("min_recall"))
        .select((col("min_recall") >= lit(0.4)).as("pq_ok"))
      exact.crossJoin(broadcast(ok)).orderBy("qid", "rnk")
    },

    // Exact integer Gram matrix of the embedding corpus
    // (SimilarityOps.gramMatrix): dimension-sized state per task, one
    // corpus scan, a 2080-row shuffle — the PCA/whitening second-moment
    // pass at its scale-honest shape.
    "sim_gram" -> { (s, dir) =>
      SimilarityOps.gramMatrix(vecs(s, dir))
    },

    // JL random projection (SimilarityOps.randomProject): 64 → 16 dims via
    // a deterministic ±1/0 Achlioptas matrix, all-integer so the oracle
    // replays it bit-exactly. Output is the distance-distortion telemetry
    // over a deterministic pair sample: original vs projected exact squared
    // L2 plus the normalized ratio (×3/k corrects the density-1/3 entry
    // variance; expectation 1 under JL). The ratios ARE the gate — a wrong
    // projection shows as wildly dispersed ratios and hash-fails.
    "sim_project" -> { (s, dir) =>
      val v = vecs(s, dir)
      val p = SimilarityOps.randomProject(v, jlMat)
        .select(col("vec_id"), col("iv"), col("pv"))
      val q = p.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"),
          col("pv").as("qpv"))
      val c = p.where(col("vec_id") >= 10
        && pmod(col("vec_id"), lit(11L)) === 0)
      c.crossJoin(broadcast(q))
        .withColumn("d2_orig",
          graft.functions.ArrayExprs.l2sq(col("qiv"), col("iv")))
        .withColumn("d2_proj",
          graft.functions.ArrayExprs.l2sq(col("qpv"), col("pv")))
        .where(col("d2_orig") > 0)
        .select(col("qid"), col("vec_id").as("nbr_id"), col("d2_orig"),
          col("d2_proj"),
          ((col("d2_proj").cast("double") * lit(3.0))
            / (col("d2_orig").cast("double") * lit(16.0))).as("ratio"))
        .orderBy("qid", "nbr_id")
    })

  private val vecSql =
    s"""SELECT vec_id, label, ${INTVEC("embedding")} AS iv FROM embeddings"""

  private val normSql =
    s"""SELECT vec_id, label, iv,
       |  CAST(list_sum(list_transform(iv, x -> x*x)) AS BIGINT) AS nrm
       |FROM ($vecSql)""".stripMargin

  private def dotSql(a: String, b: String) =
    s"CAST(list_sum(list_transform(list_zip($a, $b), z -> z[1]*z[2])) AS BIGINT)"

  private def cosSql(dot: String, na: String, nb: String) =
    s"CAST($dot AS DOUBLE)/sqrt(CAST($na AS DOUBLE)*CAST($nb AS DOUBLE))"

  private def l2Sql(a: String, b: String) =
    s"CAST(list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT)"

  private def bucketSqlFor(ps: Seq[Seq[Long]]): String =
    ps.zipWithIndex.map { case (p, j) =>
      val lit = p.mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql("iv", lit)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** One Lloyd iteration as CTEs: assign sample to nearest `prev` centroid
    * (l2 asc, cid asc — the argmin tie-break trainCentroids uses), then
    * per-(cid, dim) floored-double means rebuilt into 64-lists, empty cells
    * carrying the previous centroid. Mirrors trainCentroids term for term. */
  private def kmIterSql(prev: String, a: String, m: String, next: String): String =
    s"""$a AS (
       |  SELECT vec_id, iv, cid FROM (
       |    SELECT s.vec_id, s.iv, c.cid, row_number() OVER
       |      (PARTITION BY s.vec_id ORDER BY ${l2Sql("s.iv", "c.civ")}, c.cid) AS rn
       |    FROM samp s, $prev c)
       |  WHERE rn = 1),
       |$m AS (
       |  SELECT cid, list(cv ORDER BY i) AS civ FROM (
       |    SELECT a.cid, r.i,
       |      CAST(floor(CAST(SUM(list_extract(a.iv, r.i + 1)) AS DOUBLE)
       |        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cv
       |    FROM $a a, range(64) r(i) GROUP BY a.cid, r.i)
       |  GROUP BY cid),
       |$next AS (
       |  SELECT c.cid, COALESCE(u.civ, c.civ) AS civ
       |  FROM $prev c LEFT JOIN $m u ON c.cid = u.cid)""".stripMargin

  /** samp/c0/…/cf CTE chain reproducing trainCentroids; `cf` is the trained
    * centroid set (cid, civ). `sampExtra` narrows the training corpus (the
    * incremental-index oracle trains on the BASE slice only). */
  private def kmeansSqlWhere(sampExtra: String): String = {
    val iters = (1 to KmIters).map { k =>
      kmIterSql(if (k == 1) "c0" else s"c${k - 1}", s"a$k", s"m$k", s"c$k")
    }.mkString(",\n")
    s"""samp AS (SELECT vec_id, iv FROM n
       |  WHERE vec_id % $KmSampleMod = 0$sampExtra),
       |c0 AS (SELECT CAST(vec_id // $KmSampleMod AS INTEGER) AS cid, iv AS civ
       |  FROM samp WHERE vec_id < $KmSeedBound),
       |$iters,
       |cf AS (SELECT cid, civ FROM c$KmIters)""".stripMargin
  }

  private def kmeansSql: String = kmeansSqlWhere("")

  /** The full-rebuild IVF replay both incremental-maintenance gates
    * (batch `sim_ann_incr`, streaming `q_stream_ann`) must equal:
    * k-means trained on the BASE slice only (the frozen centroids), then
    * the WHOLE corpus assigned — value-identical to base + epoch
    * assignment because per-row assignment against frozen centroids is
    * pure. A retrain on append, a dropped batch, or a double-folded
    * epoch all diverge and hash-fail. */
  private lazy val annIncrOracle: String =
    s"""WITH n AS ($normSql),
         |${kmeansSqlWhere(" AND vec_id % 5 <> 4")},
         |asg AS (
         |  SELECT vec_id, iv, nrm, cid FROM (
         |    SELECT n.vec_id, n.iv, n.nrm, c.cid, row_number() OVER
         |      (PARTITION BY n.vec_id
         |       ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS arn
         |    FROM n, cf c)
         |  WHERE arn = 1),
         |probes AS (
         |  SELECT qid, qiv, qnrm, cid FROM (
         |    SELECT n.vec_id AS qid, n.iv AS qiv, n.nrm AS qnrm, c.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS prn
         |    FROM n, cf c WHERE n.vec_id < 10)
         |  WHERE prn <= $NProbe),
         |s AS (
         |  SELECT p.qid, a.vec_id AS nbr_id,
         |    ${cosSql(dotSql("p.qiv", "a.iv"), "p.qnrm", "a.nrm")} AS cos
         |  FROM probes p JOIN asg a ON p.cid = a.cid AND a.vec_id <> p.qid),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin

  def oracles: Map[String, String] = Map(
    "sim_topk" ->
      s"""WITH n AS ($normSql),
         |s AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nbr_id,
         |    ${cosSql(dotSql("q.iv", "e.iv"), "q.nrm", "e.nrm")} AS cos
         |  FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin,

    "sim_ann_ivf" ->
      s"""WITH n AS ($normSql),
         |$kmeansSql,
         |asg AS (
         |  SELECT vec_id, iv, nrm, cid FROM (
         |    SELECT n.vec_id, n.iv, n.nrm, c.cid, row_number() OVER
         |      (PARTITION BY n.vec_id
         |       ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS arn
         |    FROM n, cf c)
         |  WHERE arn = 1),
         |probes AS (
         |  SELECT qid, qiv, qnrm, cid FROM (
         |    SELECT n.vec_id AS qid, n.iv AS qiv, n.nrm AS qnrm, c.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS prn
         |    FROM n, cf c WHERE n.vec_id < 10)
         |  WHERE prn <= $NProbe),
         |s AS (
         |  SELECT p.qid, a.vec_id AS nbr_id,
         |    ${cosSql(dotSql("p.qiv", "a.iv"), "p.qnrm", "a.nrm")} AS cos
         |  FROM probes p JOIN asg a ON p.cid = a.cid AND a.vec_id <> p.qid),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin,

    // the full-rebuild replay the incremental index must equal: k-means
    // trained on the BASE slice only (the frozen centroids), then the
    // WHOLE corpus assigned to cf — value-identical to base + epoch
    // assignment because per-row assignment against frozen centroids is
    // pure. A retrain on append (different cf), a dropped batch, or a
    // double-folded epoch all diverge and hash-fail.
    "sim_ann_incr" -> annIncrOracle,

    // the streaming maintenance gate must equal the SAME full rebuild:
    // frozen-centroid assignment is per-row pure, so base + streamed
    // epochs (kill/restart + fold included) = one corpus-wide assignment
    "q_stream_ann" -> annIncrOracle,

    // the sim_ann_ivf replay with the candidate side filtered on the
    // metadata predicate; probes and assignments keep the full geometry.
    "sim_filtered_ann" ->
      s"""WITH n AS ($normSql),
         |$kmeansSql,
         |asg AS (
         |  SELECT vec_id, iv, nrm, cid FROM (
         |    SELECT n.vec_id, n.iv, n.nrm, c.cid, row_number() OVER
         |      (PARTITION BY n.vec_id
         |       ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS arn
         |    FROM n, cf c WHERE n.label % 3 = 0)
         |  WHERE arn = 1),
         |probes AS (
         |  SELECT qid, qiv, qnrm, cid FROM (
         |    SELECT n.vec_id AS qid, n.iv AS qiv, n.nrm AS qnrm, c.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS prn
         |    FROM n, cf c WHERE n.vec_id < 10)
         |  WHERE prn <= $NProbe),
         |s AS (
         |  SELECT p.qid, a.vec_id AS nbr_id,
         |    ${cosSql(dotSql("p.qiv", "a.iv"), "p.qnrm", "a.nrm")} AS cos
         |  FROM probes p JOIN asg a ON p.cid = a.cid AND a.vec_id <> p.qid),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin,

    "sim_global_topk" ->
      s"""WITH n AS ($normSql),
         |b AS (SELECT vec_id, iv, nrm, ${bucketSqlFor(planes)} AS bucket FROM n),
         |s AS (
         |  SELECT a.vec_id AS vec_a, e.vec_id AS vec_b,
         |    ${cosSql(dotSql("a.iv", "e.iv"), "a.nrm", "e.nrm")} AS cos
         |  FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id)
         |SELECT rnk, vec_a, vec_b, cos FROM (
         |  SELECT *, CAST(row_number() OVER
         |    (ORDER BY cos DESC, vec_a, vec_b) AS BIGINT) AS rnk
         |  FROM s)
         |WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    "sim_lsh" ->
      s"""WITH n AS ($normSql),
         |b AS (SELECT vec_id, iv, nrm, ${bucketSqlFor(planes)} AS bucket FROM n),
         |s AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nbr_id,
         |    ${cosSql(dotSql("q.iv", "e.iv"), "q.nrm", "e.nrm")} AS cos
         |  FROM b q JOIN b e ON q.vec_id < 10 AND e.bucket = q.bucket
         |    AND e.vec_id <> q.vec_id),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin,

    // candidate = same-bucket in ANY table (UNION dedups the pair), then
    // one exact scoring pass + ranking — mirrors lshTopKMulti exactly.
    "sim_lsh_multi" -> {
      val tableCtes = multiTables.zipWithIndex.map { case (ps, i) =>
        s"b$i AS (SELECT vec_id, ${bucketSqlFor(ps)} AS bucket FROM n)"
      }.mkString(",\n")
      val unions = multiTables.indices.map { i =>
        s"""SELECT q.vec_id AS qid, e.vec_id AS nbr_id
           |  FROM b$i q JOIN b$i e ON q.vec_id < 10 AND e.bucket = q.bucket
           |    AND e.vec_id <> q.vec_id""".stripMargin
      }.mkString("\n  UNION\n  ")
      s"""WITH n AS ($normSql),
         |$tableCtes,
         |c AS (
         |  $unions),
         |s AS (
         |  SELECT c.qid, c.nbr_id,
         |    ${cosSql(dotSql("q.iv", "e.iv"), "q.nrm", "e.nrm")} AS cos
         |  FROM c JOIN n q ON q.vec_id = c.qid JOIN n e ON e.vec_id = c.nbr_id),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin
    },

    // same kmeansSql CTE chain as sim_ann_ivf/sim_kmeans; pairs are the
    // within-cell cos ≥ 0.3 join (vec_a < vec_b), keep = never a vec_b.
    "sim_semdedup" ->
      s"""WITH n AS ($normSql),
         |$kmeansSql,
         |asg AS (
         |  SELECT vec_id, iv, nrm, cid FROM (
         |    SELECT n.vec_id, n.iv, n.nrm, c.cid, row_number() OVER
         |      (PARTITION BY n.vec_id
         |       ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS arn
         |    FROM n, cf c)
         |  WHERE arn = 1),
         |p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE ${cosSql(dotSql("a.iv", "b.iv"), "a.nrm", "b.nrm")} >= 0.3),
         |cnt AS (
         |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dup_nbrs FROM (
         |    SELECT vec_a AS vec_id FROM p
         |    UNION ALL SELECT vec_b AS vec_id FROM p)
         |  GROUP BY vec_id)
         |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cell,
         |  COALESCE(c.n_dup_nbrs, 0) AS n_dup_nbrs,
         |  a.vec_id NOT IN (SELECT vec_b FROM p) AS keep
         |FROM asg a LEFT JOIN cnt c ON a.vec_id = c.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    // same kmeansSql CTE chain; the assignment argmin (l2 asc, cid asc)
    // mirrors the min(struct) aggregate; inertia summed as DECIMAL(38,0)
    // to match the Spark side's overflow-safe decimal sum, then cast to
    // DOUBLE at the boundary (values ≤ ~5e13, exactly representable) —
    // decimal output columns fail the driver's hash canonicalization.
    "sim_kmeans" ->
      s"""WITH n AS ($normSql),
         |$kmeansSql,
         |asg AS (
         |  SELECT vec_id, l2, cid FROM (
         |    SELECT n.vec_id, c.cid, ${l2Sql("n.iv", "c.civ")} AS l2,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${l2Sql("n.iv", "c.civ")}, c.cid) AS arn
         |    FROM n, cf c)
         |  WHERE arn = 1)
         |SELECT cid, COUNT(*) AS n_members,
         |  CAST(CAST(SUM(l2) AS DECIMAL(38,0)) AS DOUBLE) AS inertia
         |FROM asg GROUP BY cid ORDER BY cid""".stripMargin,

    "sim_neardup" ->
      s"""WITH n AS ($normSql)
         |SELECT CAST(a.label AS BIGINT) AS label, a.vec_id AS vec_a,
         |  b.vec_id AS vec_b,
         |  ${cosSql(dotSql("a.iv", "b.iv"), "a.nrm", "b.nrm")} AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql(dotSql("a.iv", "b.iv"), "a.nrm", "b.nrm")} >= 0.35
         |ORDER BY vec_a, vec_b""".stripMargin,

    // exact top-k + literal TRUE: the Spark side's quantized-recall boolean
    // must come back true or the hash gate fails.
    "sim_quantized" ->
      s"""WITH n AS ($normSql),
         |s AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nbr_id,
         |    ${cosSql(dotSql("q.iv", "e.iv"), "q.nrm", "e.nrm")} AS cos
         |  FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos, TRUE AS quant_ok FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin,

    // exact top-k + literal TRUE, as sim_quantized: the Spark side's
    // PQ/ADC recall boolean must come back true or the hash gate fails.
    "sim_pq" ->
      s"""WITH n AS ($normSql),
         |s AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nbr_id,
         |    ${cosSql(dotSql("q.iv", "e.iv"), "q.nrm", "e.nrm")} AS cos
         |  FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id),
         |r AS (
         |  SELECT qid, nbr_id, cos, CAST(row_number() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT qid, nbr_id, rnk, cos, TRUE AS pq_ok FROM r WHERE rnk <= $TopK
         |ORDER BY qid, rnk""".stripMargin,

    // the projection rows paste in as list literals (same trick as
    // bucketSqlFor); distances and the ratio are the identical expressions.
    "sim_project" -> {
      val pvSql = jlMat.map { row =>
        dotSql("iv", row.mkString("[", ", ", "]"))
      }.mkString("[", ",\n    ", "]")
      s"""WITH n AS ($vecSql),
         |pj AS (SELECT vec_id, iv, $pvSql AS pv FROM n),
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nbr_id,
         |    ${l2Sql("q.iv", "c.iv")} AS d2_orig,
         |    ${l2Sql("q.pv", "c.pv")} AS d2_proj
         |  FROM pj c JOIN pj q ON q.vec_id < 10
         |  WHERE c.vec_id >= 10 AND c.vec_id % 11 = 0)
         |SELECT qid, nbr_id, d2_orig, d2_proj,
         |  (CAST(d2_proj AS DOUBLE) * 3.0) / (CAST(d2_orig AS DOUBLE) * 16.0)
         |    AS ratio
         |FROM pairs WHERE d2_orig > 0
         |ORDER BY qid, nbr_id""".stripMargin
    },

    // the i<=j pair expansion is oracle-scale brute force (n·d² rows); the
    // engine never materializes it — its state is one triangle per task.
    "sim_gram" ->
      s"""WITH n AS ($vecSql),
         |p AS (
         |  SELECT i.i AS i, j.j AS j,
         |    list_extract(iv, i.i + 1) * list_extract(iv, j.j + 1) AS prod
         |  FROM n, range(64) i(i), range(64) j(j) WHERE i.i <= j.j)
         |SELECT i, j, CAST(CAST(SUM(prod) AS DECIMAL(38,0)) AS DOUBLE) AS gram
         |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin)
}
