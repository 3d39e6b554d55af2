package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.functions._

/** Reshaping + statistics slice of the §2.2 charter: pivot/unpivot, exact
  * correlation/covariance statistics, deterministic stratified sampling, and
  * the manually-salted skew join.
  *
  * Scale notes:
  * - pivot with an explicit value list is ONE hash aggregate (no second pass
  *   to discover the pivot domain — at 100 TB the domain scan would be a
  *   full extra job; the engine takes the domain as an argument);
  * - unpivot is a generate-side expand, no shuffle at all;
  * - the correlation is computed from algebraic integer sums (n, Σx, Σy,
  *   Σx², Σy², Σxy as exact decimals) in one partial→final aggregate — the
  *   textbook one-pass parallel form; doubles appear only in the final
  *   scalar formula, written identically in the oracle so the hash gate
  *   holds bit-exactly;
  * - the stratified sample filters on a portable md5-derived hash of the
  *   row key, so membership is a pure per-row predicate: pushes to the scan,
  *   nothing shuffles, and the SAME rows are selected on any cluster layout
  *   (and by the DuckDB oracle);
  * - the skew join replicates the dimension side S× and salts the fact side
  *   by a deterministic row hash, spreading one hot join key over S tasks.
  *   (AQE's runtime skew-split covers sort-merge joins; the manual salt is
  *   the pattern for the cases AQE cannot see, e.g. pre-AQE engines or
  *   skewed aggregations — its result is provably the plain join's.)
  */
object StatsQueries {

  private val SkewSalts = 8

  /** Per-customer spend snapshot over a year window — the ONE snapshot
    * definition behind both CDC queries (q_cdc_diff, q_merge_apply): the
    * diff→apply reconstruction law only means something if both halves
    * compute the same snapshot. */
  private def spendSnap(s: org.apache.spark.sql.SparkSession, dir: String,
      yrLo: Int, yrHi: Int) = Tables(s, dir, "orders")
    .where(year(col("o_orderdate")).between(yrLo, yrHi))
    .groupBy(col("o_custkey").cast("long").as("key"))
    .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))

  def queries: Map[String, Q] = Map(
    // PIVOT: order counts per year × status, explicit domain (F/O/P).
    "q_pivot" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("yr"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("yr")
    },

    // UNPIVOT (melt): wide per-nation metrics back to long (metric, value)
    // rows — the inverse reshape, expand-only.
    "q_unpivot" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(cents(col("c_acctbal"))).as("acct_cents"))
        .unpivot(Array(col("nationkey")),
          Array(col("n_cust"), col("acct_cents")), "metric", "value")
        .orderBy("nationkey", "metric")
    },

    // Pearson correlation + sample stddev per group from one pass of exact
    // integer sums (decimal accumulators; cents² × 100 TB row counts
    // overflow a long, decimal(38,0) does not: sxy ≤ n·maxq·maxp ≈ 10²³ at
    // 10¹² rows). The SUMS are exact; the final scalar uses mean-centered
    // DOUBLE arithmetic (sxy/n − mx·my etc.) because raw cross products
    // like n·sxy or sx·sy reach ~10³⁵⁺ and would NULL out a decimal(38,0)
    // under non-ANSI overflow — the oracle mirrors the identical IEEE
    // expression tree so the hash gate stays bit-exact.
    "q_corr_stats" -> { (s, dir) =>
      val qc = cents(col("l_quantity"))
      val pc = cents(col("l_extendedprice"))
      val dec = "decimal(38,0)"
      val a = Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(qc.cast(dec)).as("sx"),
          sum(pc.cast(dec)).as("sy"),
          sum((qc * qc).cast(dec)).as("sxx"),
          sum((pc * pc).cast(dec)).as("syy"),
          sum((qc * pc).cast(dec)).as("sxy"))
      val nD = col("n").cast("double")
      val mx = col("sx").cast("double") / nD
      val my = col("sy").cast("double") / nD
      a.select(col("l_returnflag"), col("n"),
          (((col("sxy").cast("double") / nD) - mx * my)
            / (sqrt((col("sxx").cast("double") / nD) - mx * mx)
              * sqrt((col("syy").cast("double") / nD) - my * my)))
            .as("corr_qty_price"),
          (sqrt((col("syy").cast("double") - nD * my * my) / (nD - lit(1.0)))
            / lit(100.0)).as("stddev_price"))
        .orderBy("l_returnflag")
    },

    // Per-group least-squares trend (price-vs-size per brand) from ONE
    // partial→final pass of exact integer sufficient statistics (n, Σx,
    // Σy, Σx², Σxy as decimal(38,0) — exact at 100 TB row counts), like
    // q_corr_stats finished in mean-centered DOUBLE arithmetic (cov/var
    // of the centered form stay ~10¹⁰; the raw n·Σxy − Σx·Σy cross terms
    // would overflow decimal(38,0) at scale) with the identical IEEE
    // expression tree in the oracle. A zero-x-variance group yields NULL
    // slope/intercept on both engines via the guarded denominator — no
    // divide-by-zero engine split. The fitted-trend shape of drift
    // monitoring: "is quality/price trending with size within each brand".
    "q_regression" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val a = Tables(s, dir, "part")
        .select(col("p_brand").as("brand"),
          col("p_size").cast("long").as("x"),
          cents(col("p_retailprice")).as("y"))
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
      val nD = col("n").cast("double")
      val mx = col("sx").cast("double") / nD
      val my = col("sy").cast("double") / nD
      val cov = (col("sxy").cast("double") / nD) - mx * my
      val varx = (col("sxx").cast("double") / nD) - mx * mx
      val slope = cov / when(varx =!= 0.0, varx)
      a.select(col("brand"), col("n"),
          slope.as("slope_cents_per_size"),
          (my - slope * mx).as("icept_cents"))
        .orderBy("brand")
    },

    // Deterministic stratified sample: per-stratum rates (BUILDING 50%,
    // others 20%) via a portable hash predicate on the row key — same rows
    // on any engine, any partitioning.
    "q_stratified_sample" -> { (s, dir) =>
      val rate = when(col("c_mktsegment") === "BUILDING", lit(5)).otherwise(lit(2))
      Tables(s, dir, "customer")
        .where(pmod(md5Long(col("c_custkey").cast("string")), lit(10)) < rate)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_sampled"),
          moneySum(col("c_acctbal")).as("acct_sum"))
        .orderBy("c_mktsegment")
    },

    // Entity-resolution fuzzy match: edit-distance pairs under first-letter
    // BLOCKING — the scale-honest shape (an unblocked distance join is a
    // cartesian product; blocking turns it into an equi-join whose work is
    // Σ per-block², with the block key chosen so true matches share it).
    "q_fuzzy_match" -> { (s, dir) =>
      def side(k: String, n: String) = Tables(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as(k), col("n_name").as(n),
          substring(col("n_name"), 1, 1).as("blk"))
      side("k1", "name1").join(side("k2", "name2"), Seq("blk"))
        .where(col("k1") < col("k2"))
        .withColumn("edit_dist",
          levenshtein(col("name1"), col("name2")).cast("long"))
        .where(col("edit_dist") <= 6)
        .select(col("k1"), col("k2"), col("name1"), col("name2"),
          col("edit_dist"))
        .orderBy("k1", "k2")
    },

    // Distributed MapPut (KvSink.upsert): a keyed balance snapshot upserted
    // with a batch of per-customer totals — update-wins rows, untouched base
    // rows, and pure inserts (custkeys excluded from the base) all in one
    // full-outer join. The literal O12 store semantics at snapshot scale.
    "q_upsert" -> { (s, dir) =>
      val base = Tables(s, dir, "customer")
        .where(col("c_acctbal") >= 0)
        .select(col("c_custkey").cast("long").as("key"),
          cents(col("c_acctbal")).as("val_cents"))
      val upd = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").cast("long").as("key"))
        .agg(sum(cents(col("o_totalprice"))).as("val_cents"))
      graft.operators.KvSink.upsert(base, upd).orderBy("key")
    },

    // CDC snapshot diff (KvSink.diff, the inverse of q_upsert's MapPut):
    // (snapshot definition shared with q_merge_apply via spendSnap — the
    // diff→apply law must test ONE definition, not two copies)
    // per-customer spend snapshots over two sliding year windows. Customers
    // whose orders all fall in the overlap (1996-97) have identical sums and
    // are dropped as unchanged; window-edge customers produce I/U/D rows.
    // Output is change-sized — the delta-feed shape, not a snapshot reship.
    "q_cdc_diff" -> { (s, dir) =>
      def snap(yrLo: Int, yrHi: Int) = spendSnap(s, dir, yrLo, yrHi)
      graft.operators.KvSink.diff(snap(1995, 1997), snap(1996, 1998))
        .select(col("key"), col("op"),
          coalesce(col("old_spend_cents"), lit(-1L)).as("old_cents"),
          coalesce(col("new_spend_cents"), lit(-1L)).as("new_cents"))
        .orderBy("key")
    },

    // MERGE-apply (KvSink.applyChanges — SQL MERGE INTO with matched-
    // update, matched-delete, and not-matched-insert in ONE full-outer
    // join): the previous spend snapshot plus its CDC delta feed must
    // reconstruct the next snapshot EXACTLY — the incremental-maintenance
    // loop at 100 TB (ship change-sized deltas, never re-ship the
    // snapshot). The engine runs diff → applyChanges end to end; the
    // oracle builds the next snapshot directly from raw orders, so any
    // drift in either direction of the CDC machinery hash-fails.
    "q_merge_apply" -> { (s, dir) =>
      def snap(yrLo: Int, yrHi: Int) = spendSnap(s, dir, yrLo, yrHi)
      // prev fans into both the diff and the apply (repo rule: checkpoint
      // fanned subtrees)
      val prev = snap(1995, 1997).localCheckpoint()
      val changes = graft.operators.KvSink.diff(prev, snap(1996, 1998))
        .select(col("key"), col("op"), col("new_spend_cents"))
      graft.operators.KvSink.applyChanges(prev, changes).orderBy("key")
    },

    // Salted fact-dim join: dimension replicated SkewSalts×, fact salted by
    // a deterministic row hash — a hot o_orderkey's lineitems spread across
    // SkewSalts tasks. Result == the plain join (the oracle).
    // Group-wise z-score normalization — the feature-scaling pass every
    // training pipeline runs before mixing scores across strata. Two-phase:
    // (1) one partial→final aggregate collapses each segment to exact
    // integer moments (n, Σx, Σx² in cents — the same algebraic-sum
    // discipline as q_corr_stats, so 100 TB row counts can't drift a
    // float); (2) the metadata-sized stats table (|segments| rows) joins
    // back BROADCAST, so the fact side never reshuffles — at 100 TB the
    // normalization costs one scan plus one aggregate, not a repartition.
    // Doubles only in the final per-row formula, mirrored in the oracle;
    // population variance (÷n) keeps the formula total for 1-row groups.
    "q_zscore" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("custkey"),
          col("c_mktsegment").as("segment"), cents(col("c_acctbal")).as("xc"))
      val dec = "decimal(38,0)"
      val st = c.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("xc").cast(dec)).as("sx"),
          sum((col("xc") * col("xc")).cast(dec)).as("sxx"))
      val nD = col("n").cast("double")
      val mean = col("sx").cast("double") / nD
      val sd = sqrt(col("sxx").cast("double") / nD - mean * mean)
      val stats = st.select(col("segment"), mean.as("mean_c"), sd.as("sd_c"))
      c.join(broadcast(stats), "segment")
        .select(col("custkey"), col("segment"),
          // a degenerate segment (all-equal balances) has sd = 0 and the
          // z-score is undefined: emit NULL on both sides, never NaN/±Inf
          // (NaN != NaN under the gate's value compare)
          when(col("sd_c") =!= 0.0,
            (col("xc").cast("double") - col("mean_c")) / col("sd_c"))
            .as("z"))
        .orderBy("custkey")
    },

    // Robust outlier detection: per-group exact median + MAD (median
    // absolute deviation), flag rows with |x − med| > k·MAD — the
    // data-quality screen that, unlike the z-score, is not itself dragged
    // by the outliers it hunts. Exact grouped medians are domain-bounded,
    // not corpus-bounded: Spark's percentile aggregate buffers a
    // counts-map keyed by DISTINCT cents values (partial→final mergeable),
    // so a 100 TB fact with a bounded price domain folds map-side — the
    // same bounded-domain argument as q_collect_set; for genuinely
    // unbounded domains the approx_percentile twin of the q_approx_quantile
    // gate is the scale path. The two metadata-sized stats tables
    // (|priorities| rows) broadcast back; the fact side never reshuffles.
    // The deviation join is RECOMPUTED for the MAD pass rather than
    // checkpointed: one extra scan + broadcast join beats materializing a
    // fact-sized intermediate at 100 TB. Doubles appear only where the
    // oracle writes the identical expression (interpolated halves/quarters
    // of exact cents — every value exactly representable).
    "q_outliers" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("orderkey"),
        col("o_orderpriority").as("priority"),
        cents(col("o_totalprice")).as("price_c"))
      val med = o.groupBy(col("priority"))
        .agg(percentile(col("price_c"), lit(0.5)).as("med_c"))
      val dev = o.join(broadcast(med), "priority")
        .withColumn("adev",
          abs(col("price_c").cast("double") - col("med_c")))
      val mad = dev.groupBy(col("priority"))
        .agg(percentile(col("adev"), lit(0.5)).as("mad_c"))
      dev.join(broadcast(mad), "priority")
        .where(col("adev") > lit(2.0) * col("mad_c"))
        .select(col("orderkey"), col("priority"), col("price_c"),
          col("med_c"), col("mad_c"))
        .orderBy("orderkey")
    },

    // Winsorization — q_outliers' transform-side counterpart: instead of
    // flagging tail rows, CLIP them to per-group percentile bounds (the
    // feature-robustification pass before regression/normalization).
    // Bounds snap to integers (ceil of P05, floor of P95), so the clipped
    // values and their sums stay EXACT longs — no double-summation order
    // hazard; the only doubles are the bound derivations, mirrored in the
    // oracle. Same scale shape as q_zscore: one domain-bounded percentile
    // aggregate, metadata-sized bounds broadcast back, fact never
    // reshuffles; one final partial→final rollup.
    "q_winsorize" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        col("o_orderpriority").as("priority"),
        cents(col("o_totalprice")).as("price_c"))
      val st = o.groupBy(col("priority")).agg(
        ceil(percentile(col("price_c"), lit(0.05))).cast("long").as("lo_c"),
        floor(percentile(col("price_c"), lit(0.95))).cast("long").as("hi_c"))
      o.join(broadcast(st), "priority")
        .withColumn("w_c",
          least(greatest(col("price_c"), col("lo_c")), col("hi_c")))
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("price_c") < col("lo_c"), 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("price_c") > col("hi_c"), 1L).otherwise(0L))
            .as("n_clip_hi"),
          min(col("lo_c")).as("lo_c"), min(col("hi_c")).as("hi_c"),
          sum(col("price_c")).as("sum_raw_c"),
          sum(col("w_c")).as("sum_wins_c"))
        .orderBy("priority")
    },

    // Change-point detection (binary-segmentation CUSUM) over the daily
    // 1997 revenue series: the split day k maximizing
    // |(n−k)·L_k − k·(T−L_k)| — the scaled between-segment mean gap, ALL
    // in exact decimal integers (argmax over exact scores cannot flip
    // between engines; doubles appear only in the reported means). The
    // monitoring primitive behind "did the corpus/revenue mix shift and
    // WHEN" — q_drift answers between two named snapshots, this finds the
    // split point itself. Scale: one fact-scan partial→final daily
    // aggregate; everything after is day-domain-sized (≤366 rows), so the
    // unpartitioned cumulative window runs on one task BY DESIGN — the
    // same dispensation as the vocab-sized dictionary windows. Tiebreak:
    // earliest day.
    "q_changepoint" -> { (s, dir) =>
      val daily = Tables(s, dir, "orders")
        .where(year(col("o_orderdate")) === 1997)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(exactSum(cents(col("o_totalprice"))).as("v"))
        .localCheckpoint() // domain-sized; fans into the total and the scan
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = daily.agg(sum(col("v")).as("t"), count(lit(1)).as("n"))
      val cum = daily.select(col("day"),
        sum(col("v")).over(w).as("l"), count(lit(1)).over(w).as("k"))
      cum.crossJoin(broadcast(tot))
        .where(col("k") < col("n"))
        .select(col("day"), col("k"), col("n"),
          abs((col("n") - col("k")) * col("l")
            - col("k") * (col("t") - col("l"))).as("score"),
          col("l"), col("t"))
        .orderBy(col("score").desc, col("day"))
        .limit(1)
        .select(col("day").as("split_day"),
          col("score").cast("double").as("score"),
          (col("l").cast("double") / lit(100.0)
            / col("k").cast("double")).as("mean_before"),
          ((col("t") - col("l")).cast("double") / lit(100.0)
            / (col("n") - col("k")).cast("double")).as("mean_after"),
          col("k").as("n_before"), (col("n") - col("k")).as("n_after"))
    },

    // Distribution-drift monitor: the order-priority mix of 1996 vs 2000 as
    // exact parts-per-million, with the total-variation distance
    // (Σ|p_a − p_b| / 2) stamped on every row — the category-mix drift
    // check a training-data pipeline runs between corpus snapshots before
    // retraining. One fact scan: both periods fold in ONE conditional
    // partial→final aggregate; everything after is category-domain-sized
    // (broadcast totals, broadcast TVD). All integer floor arithmetic
    // (ppm = n·10⁶ div total), so the hash gate needs no double discipline.
    "q_drift" -> { (s, dir) =>
      val yr = year(col("o_orderdate"))
      val f = Tables(s, dir, "orders")
        .where(yr.isin(1996, 2000))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(sum(when(yr === 1996, 1L).otherwise(0L)).as("n_a"),
          sum(when(yr === 2000, 1L).otherwise(0L)).as("n_b"))
        .localCheckpoint() // 5 rows; fans into totals + the scored output
      val tot = f.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
        // an empty comparison period makes the drift undefined AND splits
        // the engines (Spark `div` by 0 → NULL, DuckDB `//` by 0 → error):
        // fail loudly on a fixture drift, same discipline as
        // q_quantile_merge's negative-cents guard
        .select(
          when(col("ta") === 0, raise_error(lit(
            "q_drift: comparison year 1996 has no orders — fixture drifted")))
            .otherwise(col("ta")).as("ta"),
          when(col("tb") === 0, raise_error(lit(
            "q_drift: comparison year 2000 has no orders — fixture drifted")))
            .otherwise(col("tb")).as("tb"))
      val scored = f.crossJoin(broadcast(tot))
        .withColumn("p_a_ppm", expr("(n_a * 1000000) div ta"))
        .withColumn("p_b_ppm", expr("(n_b * 1000000) div tb"))
        .withColumn("diff_ppm", abs(col("p_a_ppm") - col("p_b_ppm")))
      val tvd = scored.agg(expr("sum(diff_ppm) div 2").as("tvd_ppm"))
      scored.crossJoin(broadcast(tvd))
        .select(col("priority"), col("n_a"), col("n_b"), col("p_a_ppm"),
          col("p_b_ppm"), col("diff_ppm"), col("tvd_ppm"))
        .orderBy("priority")
    },

    // EXACT quantiles (p25/p50/p75/p99) without a global sort — distributed
    // two-phase selection. percentile_approx answers fast but approximately;
    // the exact path most engines take (ORDER BY the fact table) is a full
    // range-shuffle sort at 100 TB. This does it with TWO domain-sized
    // aggregates instead: phase 1 folds the table to a high-bit histogram
    // (v div 2¹⁶ — ~900 buckets for the cents domain; a partial→final agg
    // whose partials are bucket-count-sized), the driver walks cumulative
    // counts to locate each target rank's bucket (rank k = ⌈q·n⌉, the
    // quantile_disc rule, computed as (p·n+99) div 100 in exact integers);
    // phase 2 rescans ONLY the target buckets (the bucket predicate pushes
    // to the scan) into a value-level histogram — ≤2¹⁶ distinct values per
    // bucket, so both collects are bounded by construction, never
    // fact-sized. Zero fact-sized shuffles, zero sorts of fact rows.
    "q_exact_quantile" -> { (s, dir) =>
      val ps = Seq(25, 50, 75, 99)
      val vals = Tables(s, dir, "orders")
        .select(cents(col("o_totalprice")).as("v"))
      val hist = vals.groupBy(expr("v div 65536").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy("b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val n = hist.map(_._2).sum
      // (p, k, bucket, rank-within-bucket) for each target quantile
      val targets = ps.map { p =>
        val k = (p * n + 99) / 100
        var cum = 0L
        var found = Option.empty[(Long, Long)]
        for ((b, c) <- hist if found.isEmpty) {
          if (k <= cum + c) found = Some((b, k - cum))
          cum += c
        }
        val (b, r) = found.getOrElse(
          throw new IllegalStateException(s"rank $k beyond n=$n"))
        (p, k, b, r)
      }
      val needed = targets.map(_._3).distinct
      val fine = vals.where(expr("v div 65536").isin(needed: _*))
        .groupBy(expr("v div 65536").as("b"), col("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy("b", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val rows = targets.map { case (p, k, b, r) =>
        var cum = 0L
        val v = fine.collectFirst {
          case (`b`, v, c) if { cum += c; r <= cum } => v
        }.getOrElse(throw new IllegalStateException(s"rank $r missing in $b"))
        (s"p$p", k, v.toDouble / 100.0)
      }
      import s.implicits._
      rows.toDF("q", "k", "value").orderBy("q")
    },

    "q_skew_join" -> { (s, dir) =>
      val l = Tables(s, dir, "lineitem")
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(SkewSalts)).cast("int"))
      val o = Tables(s, dir, "orders")
        .withColumn("salt",
          explode(sequence(lit(0), lit(SkewSalts - 1))))
      l.join(o, l("l_orderkey") === o("o_orderkey")
          && l("salt") === o("salt"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice")).as("rev"))
        .orderBy("o_orderstatus")
    })

  def oracles: Map[String, String] = Map(
    // quantile_disc IS the ⌈q·n⌉-rank rule the engine's two-phase selection
    // implements (verified empirically across parities); k replayed as the
    // same exact-integer ceiling.
    "q_exact_quantile" ->
      s"""WITH c AS (
         |  SELECT ${CENTS("o_totalprice")} AS v FROM orders),
         |t AS (SELECT COUNT(*) AS n FROM c)
         |SELECT 'p25' AS q, (25*t.n+99)//100 AS k,
         |  CAST(quantile_disc(v, 0.25) AS DOUBLE)/100.0 AS value FROM c, t GROUP BY t.n
         |UNION ALL
         |SELECT 'p50', (50*t.n+99)//100,
         |  CAST(quantile_disc(v, 0.50) AS DOUBLE)/100.0 FROM c, t GROUP BY t.n
         |UNION ALL
         |SELECT 'p75', (75*t.n+99)//100,
         |  CAST(quantile_disc(v, 0.75) AS DOUBLE)/100.0 FROM c, t GROUP BY t.n
         |UNION ALL
         |SELECT 'p99', (99*t.n+99)//100,
         |  CAST(quantile_disc(v, 0.99) AS DOUBLE)/100.0 FROM c, t GROUP BY t.n
         |ORDER BY q""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,

    "q_unpivot" ->
      s"""WITH w AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_cust,
         |    CAST(SUM(${CENTS("c_acctbal")}) AS BIGINT) AS acct_cents
         |  FROM customer GROUP BY 1)
         |SELECT nationkey, 'n_cust' AS metric, n_cust AS value FROM w
         |UNION ALL
         |SELECT nationkey, 'acct_cents' AS metric, acct_cents AS value FROM w
         |ORDER BY nationkey, metric""".stripMargin,

    "q_corr_stats" ->
      s"""WITH a AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    SUM(CAST(qc AS HUGEINT)) AS sx, SUM(CAST(pc AS HUGEINT)) AS sy,
         |    SUM(CAST(qc AS HUGEINT) * qc) AS sxx,
         |    SUM(CAST(pc AS HUGEINT) * pc) AS syy,
         |    SUM(CAST(qc AS HUGEINT) * pc) AS sxy
         |  FROM (SELECT l_returnflag, ${CENTS("l_quantity")} AS qc,
         |      ${CENTS("l_extendedprice")} AS pc FROM lineitem)
         |  GROUP BY l_returnflag),
         |d AS (
         |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
         |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
         |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
         |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
         |    CAST(sxy AS DOUBLE) AS sxyd
         |  FROM a)
         |SELECT l_returnflag, n,
         |  (sxyd / nd - mx * my)
         |    / (sqrt(sxxd / nd - mx * mx)
         |      * sqrt(syyd / nd - my * my)) AS corr_qty_price,
         |  sqrt((syyd - nd * my * my) / (nd - 1.0)) / 100.0 AS stddev_price
         |FROM d ORDER BY l_returnflag""".stripMargin,

    // same exact-integer CUSUM argmax; HUGEINT keeps the products exact
    "q_changepoint" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    SUM(CAST(${CENTS("o_totalprice")} AS HUGEINT)) AS v
         |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
         |tot AS (SELECT SUM(v) AS t, COUNT(*) AS n FROM daily),
         |cum AS (
         |  SELECT day,
         |    SUM(v) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS l,
         |    COUNT(*) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS k
         |  FROM daily),
         |sc AS (
         |  SELECT day, k, n, l, t,
         |    abs((n - k) * l - k * (t - l)) AS score
         |  FROM cum, tot WHERE k < n)
         |SELECT day AS split_day, CAST(score AS DOUBLE) AS score,
         |  CAST(l AS DOUBLE) / 100.0 / CAST(k AS DOUBLE) AS mean_before,
         |  CAST(t - l AS DOUBLE) / 100.0 / CAST(n - k AS DOUBLE) AS mean_after,
         |  CAST(k AS BIGINT) AS n_before, CAST(n - k AS BIGINT) AS n_after
         |FROM sc ORDER BY score DESC, day LIMIT 1""".stripMargin,

    "q_regression" ->
      s"""WITH a AS (
         |  SELECT brand, COUNT(*) AS n,
         |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM (SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS x,
         |      ${CENTS("p_retailprice")} AS y FROM part)
         |  GROUP BY brand),
         |d AS (
         |  SELECT brand, n, CAST(n AS DOUBLE) AS nd,
         |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
         |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
         |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd
         |  FROM a),
         |e AS (
         |  SELECT brand, n, mx, my,
         |    (sxyd / nd - mx * my) / NULLIF(sxxd / nd - mx * mx, 0.0)
         |      AS slope
         |  FROM d)
         |SELECT brand, n, slope AS slope_cents_per_size,
         |  my - slope * mx AS icept_cents
         |FROM e ORDER BY brand""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_sampled,
         |  ${MONEY("c_acctbal")} AS acct_sum
         |FROM customer
         |WHERE ${MD5LONG("CAST(c_custkey AS VARCHAR)")} % 10 <
         |  CASE WHEN c_mktsegment = 'BUILDING' THEN 5 ELSE 2 END
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_fuzzy_match" ->
      """WITH a AS (SELECT CAST(n_nationkey AS BIGINT) AS k1, n_name AS name1,
        |    substr(n_name, 1, 1) AS blk FROM nation),
        |b AS (SELECT CAST(n_nationkey AS BIGINT) AS k2, n_name AS name2,
        |    substr(n_name, 1, 1) AS blk FROM nation)
        |SELECT k1, k2, name1, name2,
        |  CAST(levenshtein(name1, name2) AS BIGINT) AS edit_dist
        |FROM a JOIN b USING (blk)
        |WHERE k1 < k2 AND levenshtein(name1, name2) <= 6
        |ORDER BY k1, k2""".stripMargin,

    "q_upsert" ->
      s"""WITH base AS (
         |  SELECT CAST(c_custkey AS BIGINT) AS key, ${CENTS("c_acctbal")} AS val_cents
         |  FROM customer WHERE c_acctbal >= 0),
         |upd AS (
         |  SELECT CAST(o_custkey AS BIGINT) AS key,
         |    CAST(SUM(${CENTS("o_totalprice")}) AS BIGINT) AS val_cents
         |  FROM orders GROUP BY 1)
         |SELECT COALESCE(u.key, b.key) AS key,
         |  COALESCE(u.val_cents, b.val_cents) AS val_cents
         |FROM base b FULL OUTER JOIN upd u ON b.key = u.key
         |ORDER BY key""".stripMargin,

    "q_cdc_diff" ->
      s"""WITH prev AS (
         |  SELECT CAST(o_custkey AS BIGINT) AS key,
         |    CAST(SUM(${CENTS("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 1997
         |  GROUP BY 1),
         |nxt AS (
         |  SELECT CAST(o_custkey AS BIGINT) AS key,
         |    CAST(SUM(${CENTS("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |  GROUP BY 1)
         |SELECT COALESCE(p.key, n.key) AS key,
         |  CASE WHEN p.key IS NULL THEN 'I'
         |       WHEN n.key IS NULL THEN 'D' ELSE 'U' END AS op,
         |  COALESCE(p.c, -1) AS old_cents, COALESCE(n.c, -1) AS new_cents
         |FROM prev p FULL OUTER JOIN nxt n ON p.key = n.key
         |WHERE p.key IS NULL OR n.key IS NULL OR p.c <> n.c
         |ORDER BY key""".stripMargin,

    // prev + delta must land exactly on the directly-built next snapshot.
    "q_merge_apply" ->
      s"""SELECT CAST(o_custkey AS BIGINT) AS key,
         |  CAST(SUM(${CENTS("o_totalprice")}) AS BIGINT) AS spend_cents
         |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |GROUP BY 1 ORDER BY key""".stripMargin,

    // bound derivation mirrored (quantile_cont == Spark's exact
    // interpolated percentile; ceil/floor snap to BIGINT), clipped sums
    // all-integer on both sides.
    "q_winsorize" ->
      s"""WITH o AS (
         |  SELECT o_orderpriority AS priority,
         |    ${CENTS("o_totalprice")} AS price_c
         |  FROM orders),
         |st AS (
         |  SELECT priority,
         |    CAST(ceil(quantile_cont(CAST(price_c AS DOUBLE), 0.05))
         |      AS BIGINT) AS lo_c,
         |    CAST(floor(quantile_cont(CAST(price_c AS DOUBLE), 0.95))
         |      AS BIGINT) AS hi_c
         |  FROM o GROUP BY priority)
         |SELECT o.priority, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN o.price_c < st.lo_c THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_clip_lo,
         |  CAST(SUM(CASE WHEN o.price_c > st.hi_c THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_clip_hi,
         |  MIN(st.lo_c) AS lo_c, MIN(st.hi_c) AS hi_c,
         |  CAST(SUM(o.price_c) AS BIGINT) AS sum_raw_c,
         |  CAST(SUM(least(greatest(o.price_c, st.lo_c), st.hi_c))
         |    AS BIGINT) AS sum_wins_c
         |FROM o JOIN st USING (priority)
         |GROUP BY o.priority ORDER BY o.priority""".stripMargin,

    // all-integer ppm mirror (// is DuckDB floor division on BIGINTs).
    "q_drift" ->
      s"""WITH f AS (
         |  SELECT o_orderpriority AS priority,
         |    CAST(SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN year(o_orderdate) = 2000 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_b
         |  FROM orders WHERE year(o_orderdate) IN (1996, 2000)
         |  GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
         |             CAST(SUM(n_b) AS BIGINT) AS tb FROM f),
         |sc AS (
         |  SELECT priority, n_a, n_b,
         |    CAST((n_a * 1000000) // ta AS BIGINT) AS p_a_ppm,
         |    CAST((n_b * 1000000) // tb AS BIGINT) AS p_b_ppm,
         |    CAST(abs((n_a * 1000000) // ta - (n_b * 1000000) // tb)
         |      AS BIGINT) AS diff_ppm
         |  FROM f, t)
         |SELECT priority, n_a, n_b, p_a_ppm, p_b_ppm, diff_ppm,
         |  (SELECT CAST(SUM(diff_ppm) // 2 AS BIGINT) FROM sc) AS tvd_ppm
         |FROM sc ORDER BY priority""".stripMargin,

    // quantile_cont mirrors Spark's exact interpolated percentile: both
    // interpolate halves/quarters of exact cents, so every double is
    // exactly representable and the hash holds bit-exactly.
    "q_outliers" ->
      s"""WITH o AS (
         |  SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
         |    o_orderpriority AS priority, ${CENTS("o_totalprice")} AS price_c
         |  FROM orders),
         |med AS (
         |  SELECT priority,
         |    quantile_cont(CAST(price_c AS DOUBLE), 0.5) AS med_c
         |  FROM o GROUP BY priority),
         |dev AS (
         |  SELECT o.orderkey, o.priority, o.price_c, m.med_c,
         |    abs(CAST(o.price_c AS DOUBLE) - m.med_c) AS adev
         |  FROM o JOIN med m USING (priority)),
         |mad AS (SELECT priority, quantile_cont(adev, 0.5) AS mad_c
         |        FROM dev GROUP BY priority)
         |SELECT d.orderkey, d.priority, d.price_c, d.med_c, m.mad_c
         |FROM dev d JOIN mad m USING (priority)
         |WHERE d.adev > 2.0 * m.mad_c
         |ORDER BY d.orderkey""".stripMargin,

    // identical IEEE expression tree: mean once in a CTE, reused — so the
    // double z values hash bit-exactly.
    "q_zscore" ->
      s"""WITH c AS (
         |  SELECT CAST(c_custkey AS BIGINT) AS custkey,
         |    c_mktsegment AS segment, ${CENTS("c_acctbal")} AS xc
         |  FROM customer),
         |st AS (
         |  SELECT segment, COUNT(*) AS n,
         |    SUM(CAST(xc AS HUGEINT)) AS sx,
         |    SUM(CAST(xc AS HUGEINT) * xc) AS sxx
         |  FROM c GROUP BY segment),
         |m AS (
         |  SELECT segment,
         |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
         |    sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS sd_c
         |  FROM st)
         |SELECT c.custkey, c.segment,
         |  CASE WHEN m.sd_c <> 0.0
         |    THEN (CAST(c.xc AS DOUBLE) - m.mean_c) / m.sd_c END AS z
         |FROM c JOIN m USING (segment)
         |ORDER BY custkey""".stripMargin,

    "q_skew_join" ->
s"""SELECT o_orderstatus, COUNT(*) AS n_items,
         |  ${MONEY("l_extendedprice")} AS rev
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
