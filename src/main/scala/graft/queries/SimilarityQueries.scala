package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * All scoring uses exact integer arithmetic (micro-scaled vectors, long dot
  * products) so cosine values — and therefore rankings and the DuckDB oracle
  * hash — are bit-deterministic regardless of partitioning or SIMD summation
  * order. See [[graft.functions.Portable.intVec]].
  *
  * Scale design:
  * - brute-force top-k broadcasts the (small) query set and makes one pass
  *   over the corpus: embarrassingly parallel. The per-query top-k runs
  *   through [[graft.functions.TopKPairsAggregator]] (ObjectHashAggregate,
  *   partial→final): each map task keeps at most k pairs per query id, so the
  *   shuffle carries ≤ k·partitions rows per query — NOT a ranking window,
  *   which would move the entire scored corpus onto |Q| tasks and sort it
  *   there (the round-1 scale-killer this replaced).
  * - IVF is the scale path: centroid set broadcasts, every vector is assigned
  *   to its nearest cell in one map pass, queries probe nProbe cells, and the
  *   candidate join hits only |probed cells| of the corpus — the classic
  *   inverted-file trade of recall for a ~cells/nProbe scan reduction.
  */
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

  /** Driver-side Lloyd fit over a deterministic sample, for broadcast.
    *
    * Deliberately a driver loop: the sample is metadata-sized (|corpus|/4
    * vectors of 64 longs here; at 100 TB you'd cap it with a fixed-rate
    * deterministic sample the same way), while the per-vector ASSIGNMENT of
    * the full corpus stays distributed. Tie-breaks (equal l2 → smaller cid)
    * and floored means mirror the oracle SQL term for term; empty cells keep
    * their previous centroid. */
  private[graft] def trainCentroids(v: DataFrame): Seq[(Int, Seq[Long])] = {
    val sample = v.where(pmod(col("vec_id"), lit(KmSampleMod)) === 0)
      .select(col("vec_id"), col("iv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    var cents: Array[(Int, Array[Long])] = sample
      .filter(_._1 < KmSeedBound)
      .map { case (id, iv) => ((id / KmSampleMod).toInt, iv) }
    var it = 0
    while (it < KmIters) {
      val sums = scala.collection.mutable.HashMap.empty[Int, (Array[Long], Long)]
      sample.foreach { case (_, iv) =>
        var best = -1
        var bd = Long.MaxValue
        var j = 0
        while (j < cents.length) { // cents ascend by cid; strict < keeps ties on the smaller cid
          val civ = cents(j)._2
          var d = 0L
          var i = 0
          while (i < iv.length) { val t = iv(i) - civ(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = cents(j)._1 }
          j += 1
        }
        val (acc, n) = sums.getOrElseUpdate(best, (new Array[Long](iv.length), 0L))
        var i = 0
        while (i < iv.length) { acc(i) += iv(i); i += 1 }
        sums.update(best, (acc, n + 1))
      }
      cents = cents.map { case (cid, old) =>
        sums.get(cid) match {
          case Some((acc, n)) =>
            (cid, acc.map(x => math.floor(x.toDouble / n.toDouble).toLong))
          case None => (cid, old)
        }
      }
      it += 1
    }
    cents.map { case (cid, civ) => (cid, civ.toSeq) }.toSeq
  }

  // Random-hyperplane LSH: 6 deterministic integer hyperplanes (seed fixed)
  // → 64 sign-buckets. Integer coefficients keep the signature exact on both
  // the Spark and DuckDB sides.
  private val NPlanes = 6
  private val planes: Seq[Seq[Long]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(NPlanes)(Seq.fill(64)((rng.nextInt(19) - 9).toLong))
  }

  // Native codegen'd kernels for the hot pairwise scoring paths: identical
  // long arithmetic to the Catalyst zip_with/aggregate forms (so oracle
  // hashes are unchanged), but the whole scoring stage stays inside
  // whole-stage codegen — no per-row ArrayData→Seq conversion, no
  // interpreted per-element lambdas. See [[graft.functions.ArrayExprs]].
  private def dotU(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.ArrayExprs.dot(a, b)
  private def l2U(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.ArrayExprs.l2sq(a, b)

  /** vec_id, label, int vector, exact squared norm. Materialized once per
    * query (localCheckpoint): the float→micro-int encode is an interpreted
    * higher-order transform, and every similarity query fans the table into
    * 2-3 plan branches — the 100 TB analogue is writing the quantized
    * vectors once and scanning those. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), intVec(col("embedding")).as("iv"))
      .withColumn("nrm", dotU(col("iv"), col("iv")))
      .localCheckpoint()

  private def l2(a: String, b: String) = l2U(col(a), col(b))

  /** (qid, nbr_id, cos) → exact per-qid top-k as (qid, nbr_id, rnk, cos),
    * best first, via the bounded partial→final aggregator. Output is
    * bit-identical to `row_number over (partition by qid order by cos desc,
    * nbr_id) <= k` — the form the DuckDB oracles keep expressing — but the
    * shuffle carries at most k pairs per (qid, map task). */
  private def topkByQid(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val tk = udaf(new graft.functions.TopKPairsAggregator(TopK),
      ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(col("qid"))
      .agg(tk(col("cos"), col("nbr_id")).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col._2").as("nbr_id"),
        (col("pos") + 1).cast("long").as("rnk"), col("col._1").as("cos"))
      .orderBy("qid", "rnk")
  }

  def queries: Map[String, Q] = Map(
    // exact cosine top-k for each query vector (vec_id < 10) — the baseline.
    "sim_topk" -> { (s, dir) =>
      val v = vecs(s, dir)
      val q = v.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"), col("nrm").as("qnrm"))
      topkByQid(v.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("qid"))
        .withColumn("cos", cosine(dotU(col("qiv"), col("iv")), col("qnrm"), col("nrm")))
        .select(col("qid"), col("vec_id").as("nbr_id"), col("cos")))
    },

    // IVF ANN: k-means-trained 16-cell inverted file, probe 4, search in-cell.
    "sim_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      val v = vecs(s, dir)
      val cents = trainCentroids(v).toDF("cid", "civ")
      // one map pass: assign every vector to its nearest centroid cell.
      // argmin as min(struct(dist, cid)) over a hash aggregate — partial
      // aggregation combines the 16 candidate cells map-side, and the
      // aggregate carries only 12 bytes per vector (not the vector itself);
      // the (vec_id, cid) assignment then joins back to the corpus, which
      // AQE broadcast-joins at this scale and co-partitions beyond.
      val cellOf = v.crossJoin(broadcast(cents))
        .withColumn("dist", l2("iv", "civ"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      val assigned = v.join(cellOf, "vec_id")
      // queries probe their nProbe nearest cells. This window is NOT the
      // scale hazard the final ranking was: its partitions are bounded at
      // NCells rows each (one per centroid), whatever |Q| or corpus size.
      val byDist = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist"), col("cid"))
      val probes = v.where(col("vec_id") < 10).crossJoin(broadcast(cents))
        .withColumn("dist", l2("iv", "civ"))
        .withColumn("prn", row_number().over(byDist))
        .where(col("prn") <= NProbe)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"),
          col("nrm").as("qnrm"), col("cid"))
      topkByQid(probes.join(assigned, "cid")
        .where(col("vec_id") =!= col("qid"))
        .withColumn("cos", cosine(dotU(col("qiv"), col("iv")), col("qnrm"), col("nrm")))
        .select(col("qid"), col("vec_id").as("nbr_id"), col("cos")))
    },

    // Random-hyperplane LSH ANN: sign-bit bucket per vector (6 codegen'd
    // graft_dot projections), candidates = same bucket, exact cosine top-k.
    // The scale shape: one map pass computes buckets, the only join is
    // per-bucket — the classic cosine-LSH trade of recall for ~1/|buckets|
    // of the corpus scanned per query.
    "sim_lsh" -> { (s, dir) =>
      val v = vecs(s, dir)
      val bucket = planes.zipWithIndex.map { case (p, j) =>
        when(dotU(col("iv"), typedLit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val withSig = v.withColumn("bucket", bucket)
      val q = withSig.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("iv").as("qiv"),
          col("nrm").as("qnrm"), col("bucket"))
      topkByQid(withSig.join(broadcast(q), "bucket")
        .where(col("vec_id") =!= col("qid"))
        .withColumn("cos", cosine(dotU(col("qiv"), col("iv")), col("qnrm"), col("nrm")))
        .select(col("qid"), col("vec_id").as("nbr_id"), col("cos")))
    },

    // embedding-cosine near-dup pairs, blocked by label, grid-distributed.
    //
    // Exact all-pairs within a label is inherently Σ per-label² work — no
    // lossless pruning exists at cosine ≥ 0.35 (a hyperplane-LSH block at
    // this threshold keeps only ~5% recall per bucket, so bucketing cannot
    // preserve the exact oracle). What CAN be fixed is the skew: a bare join
    // on `label` lands a hot label's entire quadratic block on ONE task. The
    // 2-D grid decomposition below splits it across m² tasks: each side
    // chunks by hash(vec_id) mod m, each row replicates to its m grid
    // blocks, and the join key (label, bi, bj) gives every chunk_i × chunk_j
    // sub-block its own reduce key. Work is unchanged — every ordered pair
    // meets exactly once (A in grid row bi=its chunk, B in grid column
    // bj=its chunk) — and the straggler is gone at m× replication of the
    // compact int vectors. REGIME BOUNDARY: the exact form is for bounded
    // label groups; unbounded corpora should generate candidates with
    // sim_lsh's bucketing (recall tunable via OR-ed tables) and verify
    // exactly, as dedup_minhash does for Jaccard.
    "sim_neardup" -> { (s, dir) =>
      val m = 4 // grid width: a hot label spreads across m² = 16 tasks
      val v = vecs(s, dir)
        .withColumn("ck", pmod(xxhash64(col("vec_id")), lit(m)).cast("int"))
      val grid = explode(sequence(lit(0), lit(m - 1)))
      val a = v.select(col("label"), col("ck").as("bi"), col("vec_id").as("vec_a"),
          col("iv").as("ia"), col("nrm").as("na"))
        .withColumn("bj", grid)
      val b = v.select(col("label"), col("ck").as("bj"), col("vec_id").as("vec_b"),
          col("iv").as("ib"), col("nrm").as("nb"))
        .withColumn("bi", grid)
      a.join(b, Seq("label", "bi", "bj"))
        .where(col("vec_a") < col("vec_b"))
        .withColumn("cos", cosine(dotU(col("ia"), col("ib")), col("na"), col("nb")))
        .where(col("cos") >= 0.35)
        .select(col("label").cast("long").as("label"),
          col("vec_a"), col("vec_b"), col("cos"))
        .orderBy("vec_a", "vec_b")
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
    * centroid set (cid, civ). */
  private def kmeansSql: String = {
    val iters = (1 to KmIters).map { k =>
      kmIterSql(if (k == 1) "c0" else s"c${k - 1}", s"a$k", s"m$k", s"c$k")
    }.mkString(",\n")
    s"""samp AS (SELECT vec_id, iv FROM n WHERE vec_id % $KmSampleMod = 0),
       |c0 AS (SELECT CAST(vec_id // $KmSampleMod AS INTEGER) AS cid, iv AS civ
       |  FROM samp WHERE vec_id < $KmSeedBound),
       |$iters,
       |cf AS (SELECT cid, civ FROM c$KmIters)""".stripMargin
  }

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

    "sim_lsh" -> {
      val bucketSql = planes.zipWithIndex.map { case (p, j) =>
        val lit = p.mkString("[", ", ", "]")
        s"(CASE WHEN ${dotSql("iv", lit)} > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH n AS ($normSql),
         |b AS (SELECT vec_id, iv, nrm, $bucketSql AS bucket FROM n),
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
         |ORDER BY qid, rnk""".stripMargin
    },

    "sim_neardup" ->
      s"""WITH n AS ($normSql)
         |SELECT CAST(a.label AS BIGINT) AS label, a.vec_id AS vec_a,
         |  b.vec_id AS vec_b,
         |  ${cosSql(dotSql("a.iv", "b.iv"), "a.nrm", "b.nrm")} AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql(dotSql("a.iv", "b.iv"), "a.nrm", "b.nrm")} >= 0.35
         |ORDER BY vec_a, vec_b""".stripMargin)
}
