package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A persistent epoch-appended index with size-tiered generation
  * compaction — the LSM discipline shared by the streaming LSH dedup
  * index (sub-indexes `sh` + `bands`) and the streaming ANN assignment
  * index (sub-index `asg`):
  *
  *  - each ingested batch lands as `st/<sub>/epoch=<id>` (one dir per
  *    sub-index, exactly-once via overwrite-idempotent writes);
  *  - when `every` epochs accumulate, they fold into a tier-1 generation
  *    `st/<sub>_gen/r=<lo>-<hi>`, and same-tier ADJACENT generation runs
  *    merge upward — every fold reads ONLY the dirs it replaces, so
  *    lifetime write amplification is O(log_every N) per row;
  *  - probes read the ACTIVE generations (committed in EVERY sub-index —
  *    the joint crash-safety gate — minus ranges strictly contained in a
  *    larger active range) plus the epoch dirs above the covered cut;
  *  - folded inputs sweep last and best-effort: a crash between fold and
  *    sweep leaves superseded dirs that the active-range rule already
  *    ignores, and a RE-DELIVERED epoch below the cut is likewise never
  *    read (the at-least-once foreachBatch hole the cut exists to close).
  *
  * All state is `_SUCCESS`-gated dirs — restart-safe with zero driver
  * memory, the only viable index-maintenance story at 100 TB. */
final class EpochGenIndex(subs: Seq[String]) {
  require(subs.nonEmpty, "an index needs at least one sub-index")

  private def fsOf(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** `prefix=value` child dirs of `dir` whose write committed
    * (`_SUCCESS` present), as (value, absolute path). */
  private def liveDirs(s: SparkSession, dir: String,
      prefix: String): Seq[(Long, String)] = {
    val f = fsOf(s, dir)
    val d = new Path(dir)
    if (!f.exists(d)) Nil
    else f.listStatus(d).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(prefix + "=") &&
          f.exists(new Path(st.getPath, "_SUCCESS")))
        Some(n.stripPrefix(prefix + "=").toLong -> st.getPath.toString)
      else None
    }
  }

  /** Committed `r=LO-HI` generation ranges of one sub-index. */
  private def rangesOf(s: SparkSession, st: String,
      sub: String): Set[(Long, Long)] = {
    val f = fsOf(s, s"$st/${sub}_gen")
    val d = new Path(s"$st/${sub}_gen")
    if (!f.exists(d)) Set.empty
    else f.listStatus(d).toSeq.filter(_.isDirectory).flatMap { dir =>
      val n = dir.getPath.getName
      val m = """r=(\d+)-(\d+)""".r
      n match {
        case m(lo, hi) if f.exists(new Path(dir.getPath, "_SUCCESS")) =>
          Some((lo.toLong, hi.toLong))
        case _ => None
      }
    }.toSet
  }

  /** The generation set a probe reads: ranges committed in EVERY
    * sub-index (the joint crash-safety gate), minus any range strictly
    * contained in another such range (superseded by a tier merge whose
    * input sweep hasn't run yet). Active ranges are disjoint. */
  def activeRanges(s: SparkSession, st: String): Seq[(Long, Long)] = {
    val joint = subs.map(rangesOf(s, st, _)).reduce(_ intersect _)
    joint.filterNot { case (lo, hi) =>
      joint.exists { case (lo2, hi2) =>
        (lo2, hi2) != (lo, hi) && lo2 <= lo && hi <= hi2 }
    }.toSeq.sortBy(_._1)
  }

  /** Highest epoch covered by the active generation set — epochs at or
    * below it are served from generations, never from epoch dirs. */
  def baseUpto(s: SparkSession, st: String): Option[Long] =
    activeRanges(s, st).map(_._2).maxOption

  /** Epoch dirs the next probe will read as DIRS (those above the
    * covered cut) — the quantity the epoch fold exists to bound. */
  def liveEpochs(s: SparkSession, st: String): Seq[Long] = {
    val cut = baseUpto(s, st).getOrElse(-1L)
    liveDirs(s, s"$st/${subs.head}", "epoch").map(_._1)
      .filter(_ > cut).sorted
  }

  /** The probe view of one sub-index: the active generations unioned
    * with the epoch dirs above the cut. Leaf dirs are read individually
    * so the schema never grows a partition column and stale
    * (already-folded) dirs are never seen. */
  def read(s: SparkSession, st: String, sub: String): DataFrame = {
    require(subs.contains(sub), s"unknown sub-index $sub (have $subs)")
    val cut = baseUpto(s, st).getOrElse(-1L)
    val genPaths = activeRanges(s, st)
      .map { case (lo, hi) => s"$st/${sub}_gen/r=$lo-$hi" }
    val epochPaths = liveDirs(s, s"$st/$sub", "epoch")
      .filter(_._1 > cut).map(_._2)
    val paths = genPaths ++ epochPaths
    require(paths.nonEmpty, s"empty index under $st/$sub")
    s.read.parquet(paths: _*)
  }

  /** Size tier of a generation covering `size` epochs: fresh epoch
    * folds land in tier 1 (size = every), `every` merged tier-t
    * generations land in tier t+1. */
  private def tier(size: Long, every: Int): Int = {
    var t = 0
    var c = every.toLong
    while (size >= c) { t += 1; c *= every }
    t
  }

  /** Fold live epochs into a new tier-1 generation when at least
    * `every` have accumulated, then merge generations size-tiered while
    * any tier holds `every` adjacent members. EVERY write reads only
    * the dirs it folds — the epoch fold never touches the accumulated
    * index, and a tier merge reads exactly the generations it replaces
    * — so lifetime write amplification is O(log_every N) per row.
    * Write order per step: every sub-index first, joint-gated
    * activation second (via [[activeRanges]]), deletion of folded
    * inputs last and best-effort (the final sweep). */
  def maybeCompact(s: SparkSession, st: String, every: Int): Unit = {
    require(every >= 2, s"compactEvery must be >= 2, got $every")
    val eps = liveEpochs(s, st)
    if (eps.size >= every) {
      val (lo, hi) = (eps.min, eps.max)
      for (sub <- subs)
        s.read.parquet(eps.map(e => s"$st/$sub/epoch=$e"): _*)
          .write.mode("overwrite").parquet(s"$st/${sub}_gen/r=$lo-$hi")
    }
    // size-tiered merges: oldest run of `every` ADJACENT same-tier
    // generations folds into one; loop because a merge can promote its
    // tier into another full run (bounded by the tier count, O(log N))
    var again = true
    while (again) {
      again = false
      val act = activeRanges(s, st)
      val tiers = act.map { case (lo, hi) => tier(hi - lo + 1, every) }
      var i = 0
      while (!again && i + every <= act.length) {
        val run = act.slice(i, i + every)
        val sameTier = tiers.slice(i, i + every).distinct.size == 1
        val adjacent = run.iterator.sliding(2).withPartial(false)
          .forall { case Seq(a, b) => b._1 == a._2 + 1 }
        if (sameTier && adjacent) {
          val (lo, hi) = (run.head._1, run.last._2)
          for (sub <- subs)
            s.read.parquet(run.map { case (l, h) =>
                s"$st/${sub}_gen/r=$l-$h" }: _*)
              .write.mode("overwrite").parquet(s"$st/${sub}_gen/r=$lo-$hi")
          again = true
        } else i += 1
      }
    }
    // best-effort input sweep, against the JOINT active set re-derived
    // after all writes (the crash-safety gate): covered epochs and
    // generations strictly contained in an active range
    val act = activeRanges(s, st)
    val cut = act.map(_._2).maxOption.getOrElse(-1L)
    val f = fsOf(s, st)
    for (sub <- subs) {
      for ((e, pth) <- liveDirs(s, s"$st/$sub", "epoch"); if e <= cut)
        f.delete(new Path(pth), true)
      for ((lo, hi) <- rangesOf(s, st, sub)
           if act.exists { case (lo2, hi2) =>
             (lo2, hi2) != (lo, hi) && lo2 <= lo && hi <= hi2 })
        f.delete(new Path(s"$st/${sub}_gen/r=$lo-$hi"), true)
    }
  }
}
