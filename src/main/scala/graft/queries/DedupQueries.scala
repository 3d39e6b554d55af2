package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for the LLM-data-pipeline layer: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash — each designed for the 100 TB shape.
  *
  * Scale design notes:
  * - Exact dedup is a hash groupBy on a normalized key: one shuffle, map-side
  *   partial agg, no driver-side state.
  * - n-gram Jaccard uses an *inverted-index join* (pairs meet on shared
  *   grams), never an O(n²) cross join: cost is Σ freq(gram)² — bounded in
  *   real corpora by vocabulary size; a df-cutoff on pathological hot grams is
  *   the standard mitigation and composes as one extra filter.
  * - MinHash+LSH is the classic shingle → signature → band-bucket join: the
  *   only shuffles are the band groupBy and the candidate verification join.
  *   Parameters r=3, b=42 ⇒ P(miss | J≥0.85) < 1e-17, so LSH output equals
  *   the exact-Jaccard oracle on any realistic near-dup distribution.
  * - SimHash blocks by 4×15-bit bands; by pigeonhole, hamming ≤ 3 guarantees
  *   an exact band match, so the blocked join is *lossless* vs the O(n²)
  *   oracle while scaling as Σ bucket².
  */
object DedupQueries {

  // ---- MinHash parameters (deterministic, seed fixed) ----
  private val P = 2147483647L // 2^31 - 1
  private val NumHashes = 126 // r * b
  private val R = 3 // rows per band
  private val B = 42 // bands
  private val (hashA, hashB) = {
    val rng = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(1L + rng.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(NumHashes)(rng.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** doc_id + distinct word-trigram shingle set. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      // guard: Spark sequence(1, n) with n<1 counts *down*; DuckDB range is
      // empty. Docs too short to shingle can never pair, so drop them.
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(col("t")) - 2),
        i => concat_ws(" ", element_at(col("t"), i),
          element_at(col("t"), i + 1), element_at(col("t"), i + 2)))).as("s"))

  /** Exact Jaccard ≥ threshold over distinct gram sets via inverted-index
    * join; shared shape of dedup_ngram (bigrams) and the minhash verifier. */
  private def jaccardPairs(grams: DataFrame, threshold: Double): DataFrame = {
    val e = grams.select(col("doc_id"), size(col("s")).cast("long").as("ng"),
      explode(col("s")).as("gram"))
    e.as("a").join(e.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ng").as("na"), col("b.ng").as("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jac", col("common").cast("double")
        / (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  def queries: Map[String, Q] = Map(
    // Exact dedup on whitespace-normalized text: keep min doc_id per group.
    "dedup_exact" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(trim(lower(col("text"))), "[ \\t\\r\\n]+", " ").as("norm"))
        .groupBy(col("norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), md5(col("norm")).as("norm_md5"))
        .orderBy("keep_id")
    },

    // Word-bigram Jaccard near-dup pairs via inverted-index join.
    "dedup_ngram" -> { (s, dir) =>
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), array_distinct(transform(
          sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
          .as("s"))
      jaccardPairs(grams, 0.5).orderBy("doc_a", "doc_b")
    },

    // MinHash + LSH banding, then exact-Jaccard verification of candidates.
    "dedup_minhash" -> { (s, dir) =>
      val sh = shingles(s, dir)
      val aLit = typedLit(hashA.toSeq)
      val bLit = typedLit(hashB.toSeq)
      // 126 min-hashes per doc: min over shingles of (a_j * h32(x) + b_j) mod P.
      val sig = sh.select(col("doc_id"),
        transform(sequence(lit(0), lit(NumHashes - 1)), j =>
          array_min(transform(col("s"), x =>
            pmod(element_at(aLit, j + 1) * pmod(xxhash64(x), lit(P)) +
              element_at(bLit, j + 1), lit(P))))).as("sig"))
      // band hash = xxhash64 of the band's r signature values.
      val bands = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(B - 1)), b =>
          xxhash64(slice(col("sig"), b * R + 1, lit(R))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // verify candidates with exact Jaccard on the shingle sets.
      val withSets = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
        .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("jac", col("common").cast("double")
          / (size(col("sa")).cast("long") + size(col("sb")).cast("long")
            - col("common")).cast("double"))
      withSets.where(col("jac") >= 0.7)
        .select(col("doc_a"), col("doc_b"), col("jac"))
        .orderBy("doc_a", "doc_b")
    },

    // SimHash (60-bit, portable md5-based token hash), hamming ≤ 3 pairs via
    // lossless 4×15-bit band blocking.
    "dedup_simhash" -> { (s, dir) =>
      val tf = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("h", md5Long(col("tok")))
      val sim = tf
        .select(col("doc_id"), col("tf"), col("h"),
          explode(sequence(lit(0), lit(59))).as("i"))
        .withColumn("contrib", col("tf") * (expr("shiftright(h, i) & 1") * 2 - 1))
        .groupBy(col("doc_id"), col("i"))
        .agg(sum(col("contrib")).as("bsum"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("bsum") > 0, expr("shiftleft(CAST(1 AS BIGINT), i)"))
          .otherwise(0L)).as("simhash"))
      val bands = sim.select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("bh", expr("shiftright(simhash, 15 * j) & 32767"))
      bands.as("x").join(bands.as("y"),
          col("x.j") === col("y.j") && col("x.bh") === col("y.bh")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash").as("sa"), col("y.simhash").as("sb"))
        .distinct()
        .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
        .where(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy("doc_a", "doc_b")
    })

  private def gramSql(n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""SELECT doc_id, list_distinct(list_transform(
       |  range(1, len(t) - ${n - 2}), i -> $parts)) AS s
       |FROM (SELECT doc_id, ${TOKENS("text")} AS t FROM documents)""".stripMargin
  }

  private def jaccardSql(gramCte: String, threshold: String): String =
    s"""WITH g AS ($gramCte),
       |e AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS ng, unnest(s) AS gram FROM g),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    any_value(a.ng) AS na, any_value(b.ng) AS nb, COUNT(*) AS common
       |  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(common AS DOUBLE)/CAST(na + nb - common AS DOUBLE) AS jac
       |FROM p
       |WHERE CAST(common AS DOUBLE)/CAST(na + nb - common AS DOUBLE) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      s"""WITH n AS (
         |  SELECT doc_id,
         |    regexp_replace(trim(lower(text)), '[ \\t\\r\\n]+', ' ', 'g') AS norm
         |  FROM documents)
         |SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(norm) AS norm_md5
         |FROM n GROUP BY norm ORDER BY keep_id""".stripMargin,

    "dedup_ngram" -> jaccardSql(gramSql(2), "0.5"),

    // LSH recall at these parameters is 1 - (1-J^3)^42 ≈ 1 for J ≥ 0.7+ε on
    // this corpus (pair similarity is bimodal: ≥0.85 or ≤0.15), so the
    // banded+verified output equals the exact-Jaccard result.
    "dedup_minhash" -> jaccardSql(gramSql(3), "0.7"),

    "dedup_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${TOKENS("text")}) AS tok FROM documents),
         |tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf, ${MD5LONG("tok")} AS h
         |  FROM tok GROUP BY doc_id, tok),
         |bits AS (
         |  SELECT doc_id, i.i AS i,
         |    CAST(SUM(tf * (((h >> i.i) & 1) * 2 - 1)) AS BIGINT) AS bsum
         |  FROM tf, range(60) i(i) GROUP BY doc_id, i.i),
         |sh AS (
         |  SELECT doc_id, CAST(SUM(CASE WHEN bsum > 0
         |    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin)
}
