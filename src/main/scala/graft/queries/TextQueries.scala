package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import graft.functions.RollingHash31
import org.apache.spark.sql.functions._

/** Wordcount flagship + text-analysis operators over `documents`.
  *
  * Wordcount is the reference's whole client capability: tokenize
  * (reference main.c:20-27) → emit (word,"1") (main.c:26) → count per key
  * (main.c:33-43). Spark-first form is explode+groupBy.count, which gets the
  * map-side partial aggregation the reference lacks (mapreduce.c:75-86 ships
  * one pair per token occurrence across the shuffle; HashAggregateExec ships
  * one partial count per distinct word per partition — the difference between
  * O(tokens) and O(vocab·partitions) shuffle bytes at 100 TB).
  */
object TextQueries {

  // Stopword lists for the language-ID heuristic (tiny, deterministic).
  private val stops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "que", "un"))

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  def queries: Map[String, Q] = Map(
    "wordcount" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    },

    "wordcount_topk" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    },

    // One typed map per doc (raw JVM loops): the earlier Catalyst
    // filter-lambda form paid the interpreted-HOF tax (~50× codegen, see
    // CLAUDE.md) on every token of every doc. A single flat pass computes
    // all four language scores at once.
    "text_langid" -> { (s, dir) =>
      import s.implicits._
      val stopSets = stops.map { case (l, ws) => (l, ws.toSet) }
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val t = text.toLowerCase.split("[ \t\r\n]+").filter(_.nonEmpty)
          val Seq(en, de, es, fr) =
            stopSets.map { case (_, ws) => t.count(ws.contains).toLong }
          val pred =
            if (en + de + es + fr == 0) "unknown"
            else if (en >= de && en >= es && en >= fr) "en"
            else if (de >= es && de >= fr) "de"
            else if (es >= fr) "es"
            else "fr"
          (id, pred, en, de, es, fr)
        }
        .toDF("doc_id", "pred_lang", "s_en", "s_de", "s_es", "s_fr")
        .orderBy("doc_id")
    },

    // All six per-doc stats in one typed map. Lengths count code points
    // (the JVM mirror of Spark/DuckDB length()); the ratio formulas keep the
    // exact double evaluation order of the oracle SQL, and token-free docs
    // emit zeros on both sides (oracle COALESCE/CASE guards) instead of the
    // NULL/NaN divergence flagged in round-1 advice.
    "text_quality" -> { (s, dir) =>
      import s.implicits._
      val stopSet = stops.head._2.toSet
      val alpha = java.util.regex.Pattern.compile("[a-z]+")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val t = text.toLowerCase.split("[ \t\r\n]+").filter(_.nonEmpty)
          val nChars = text.codePointCount(0, text.length).toLong
          val nTokens = t.length.toLong
          val nDistinct = t.distinct.length.toLong
          var sumTokLen = 0L
          var nStop = 0L
          var nAlpha = 0L
          t.foreach { tk =>
            sumTokLen += tk.codePointCount(0, tk.length)
            if (stopSet.contains(tk)) nStop += 1
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
        .orderBy("doc_id")
    },

    "text_tokencount" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 \\t\\r\\n]"), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          size(array_distinct(tokens(col("text")))).cast("long").as("n_vocab"))
        .orderBy("doc_id")
    },

    // The training-data user story end-to-end: quality filter → exact dedup
    // (keep lowest doc_id per normalized text) → per-language corpus stats.
    // Every stage is one of the engine's operators composed declaratively;
    // only the 32-byte norm hash and small aggregates cross shuffles. The
    // keep-first step is min_by (a partial→final hash aggregate), NOT a
    // ranking window over norm_md5: a boilerplate page duplicated millions
    // of times at 100 TB would put its whole group on one window task,
    // while min_by folds it map-side to one row per partition.
    "q_pipeline_clean" -> { (s, dir) =>
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("t"))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
        .where(col("n_tokens") >= 10 &&
          col("n_distinct").cast("double") / col("n_tokens").cast("double") >= 0.3)
      val deduped = scored
        .withColumn("norm_md5",
          md5(regexp_replace(trim(lower(col("text"))), "[ \\t\\r\\n]+", " ")))
        .groupBy(col("norm_md5"))
        .agg(min_by(
          struct(col("lang"), col("n_tokens"), col("n_distinct")),
          col("doc_id")).as("keep"))
        .select(col("keep.lang").as("lang"), col("keep.n_tokens").as("n_tokens"),
          col("keep.n_distinct").as("n_distinct"))
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_distinct")).as("total_distinct"))
        .orderBy("lang")
    },

    // The reference's literal input shape: a LIST of text files passed like
    // argv[1..] (reference main.c:13-18, mapreduce.c:177-189), tokenized and
    // counted. The corpus round-trips through multi-file line-oriented text
    // (write text → explicit multi-path spark.read.textFile), and the oracle
    // is the parquet wordcount SQL: whitespace tokenization is invariant to
    // how the writer splits rows across lines and files.
    "q_text_source" -> { (s, dir) =>
      val tmp = s"/root/repo/target/tmp/textsrc-${new java.io.File(dir).getName}"
      Tables(s, dir, "documents").select(col("text"))
        .repartition(4) // several part files, so the read is genuinely multi-path
        .write.mode("overwrite").text(tmp)
      val parts = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
      s.read.textFile(parts.toIndexedSeq: _*)
        .select(explode(tokens(col("value"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    },

    "text_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          RollingHash31.column(col("text")).as("fp31"),
          md5(regexp_replace(trim(lower(col("text"))), "[ \\t\\r\\n]+", " "))
            .as("fp_md5"))
        .orderBy("doc_id")
    })

  private val tokFrom =
    s"SELECT doc_id, ${TOKENS("text")} AS t FROM documents"

  def oracles: Map[String, String] = Map(
    "wordcount" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(t) AS word FROM ($tokFrom))
         |GROUP BY word ORDER BY word""".stripMargin,

    "wordcount_topk" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(t) AS word FROM ($tokFrom))
         |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    // identical corpus whether read from parquet or the text round-trip:
    // tokenization collapses line/file boundaries.
    "q_text_source" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(t) AS word FROM ($tokFrom))
         |GROUP BY word ORDER BY word""".stripMargin,

    "text_langid" -> {
      val scoreCols = stops.map { case (l, ws) =>
        s"CAST(len(list_filter(t, tk -> list_contains(${sqlList(ws)}, tk))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'unknown'
         |       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es >= s_fr THEN 'es'
         |       ELSE 'fr' END AS pred_lang,
         |  s_en, s_de, s_es, s_fr
         |FROM (SELECT doc_id, $scoreCols FROM ($tokFrom))
         |ORDER BY doc_id""".stripMargin
    },

    "text_quality" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(t) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |    CAST(COALESCE(list_sum(list_transform(t,
         |      tk -> CAST(length(tk) AS BIGINT))), 0) AS BIGINT) AS sum_tok_len,
         |    CAST(len(list_filter(t, tk -> list_contains(${sqlList(stops.head._2)}, tk))) AS BIGINT) AS n_stop,
         |    CAST(len(list_filter(t, tk -> regexp_full_match(tk, '[a-z]+'))) AS BIGINT) AS n_alpha
         |  FROM (SELECT doc_id, text, ${TOKENS("text")} AS t FROM documents))
         |SELECT doc_id, n_chars, n_tokens, n_distinct, sum_tok_len, n_stop, n_alpha,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    CAST(sum_tok_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) END AS avg_tok_len,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) END AS stop_ratio,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    CAST(n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE)*0.5
         |    + CAST(n_alpha AS DOUBLE)/CAST(n_tokens AS DOUBLE)*0.3
         |    + CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE)*0.2 END AS quality_score
         |FROM b ORDER BY doc_id""".stripMargin,

    "text_tokencount" ->
      s"""SELECT doc_id,
         |  CAST(len(${TOKENS("text")}) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 \\t\\r\\n]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(len(list_distinct(${TOKENS("text")})) AS BIGINT) AS n_vocab
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_pipeline_clean" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, text, ${TOKENS("text")} AS t FROM documents),
         |q AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(t) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
         |  FROM d
         |  WHERE CAST(len(t) AS BIGINT) >= 10
         |    AND CAST(len(list_distinct(t)) AS DOUBLE)/CAST(len(t) AS DOUBLE) >= 0.3),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY md5(regexp_replace(trim(lower(text)), '[ \\t\\r\\n]+', ' ', 'g'))
         |    ORDER BY doc_id) AS rn
         |  FROM q)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_distinct) AS BIGINT) AS total_distinct
         |FROM r WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  CAST(list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (a, b) -> (a*31 + b) % 2147483647) AS BIGINT) AS fp31,
         |  md5(regexp_replace(trim(lower(text)), '[ \\t\\r\\n]+', ' ', 'g')) AS fp_md5
         |FROM documents ORDER BY doc_id""".stripMargin)
}
