package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent materialized-view ROUTING — the consumption half of the MV
  * story (q_ivm_join maintains view partials incrementally; this serves
  * queries FROM a view without the query author knowing it exists).
  *
  * A registered MV is (analyzed definition plan, materialized parquet dir,
  * input fingerprint). [[MvRewriteRule]] — injected by GraftExtensions as a
  * post-hoc resolution rule, the same extension point DataSource resolution
  * uses — matches any [[Aggregate]] subtree against the registered
  * definitions with `sameResult` (canonicalized plan equality: attribute
  * ids and cosmetic aliases normalized away, so any construction of the
  * same aggregate matches, not just the registering one) and substitutes a
  * scan of the MV files, aliasing the MV's columns back to the query's
  * attribute ids so every downstream operator resolves unchanged.
  *
  * Freshness is a HARD gate, checked at match time: the entry records
  * `Sinks.fingerprint` of the base inputs at materialization; a query whose
  * base files have since changed silently falls back to the base-table plan
  * (correct, just slower) rather than serving stale aggregates. Production
  * systems key this on a snapshot/commit version (the SnapshotTable
  * manifests here) instead of re-fingerprinting per query; the gate's
  * placement — inside the match, before substitution — is the part that
  * matters.
  *
  * Scale shape: the rewrite replaces a fact-table scan + partial→final
  * aggregate with a group-domain-sized MV scan — the canonical 100 TB win
  * (the MV is KBs where the base is TBs). Matching cost is one canonicalized
  * compare per Aggregate node per registered view; the fingerprint LIST
  * runs only on a structural match. */
object MvCatalog {

  final case class Entry(definition: LogicalPlan, mvPath: String,
      fingerprint: String, inputs: Seq[String])

  // WEAK-keyed by session: a static strong-keyed map would pin every
  // SparkSession (and its whole state) for JVM lifetime (r12 ADVICE).
  // Collections.synchronizedMap overrides compute/get with mutex-held
  // versions, so the registration read-modify-write stays atomic.
  private val entries: java.util.Map[SparkSession, List[Entry]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, List[Entry]]())

  /** Materialize `df` at `mvPath` (write-once via ensureDir) and register
    * its analyzed plan for rewriting. Idempotent per (session, mvPath):
    * a repeat call in a session where the entry is live returns without
    * touching the registration — necessary, not cosmetic, because the
    * caller's rebuilt `df` has itself been REWRITTEN by the live rule
    * (its plan is a Project over the MV scan) and registering that as the
    * definition would break every later structural match. */
  def register(spark: SparkSession, df: DataFrame, mvPath: String,
      tag: String, inputs: Seq[String]): Unit = {
    val fp = graft.sources.Sinks.fingerprint(spark, inputs: _*)
    val live = Option(entries.get(spark)).getOrElse(Nil)
    if (live.exists(e => e.mvPath == mvPath && e.fingerprint == fp)) return
    graft.sources.Sinks.ensureDir(spark, mvPath, s"$tag@mv", inputs) {
      df.write.mode("overwrite").parquet(mvPath)
    }
    val e = Entry(df.queryExecution.analyzed, mvPath, fp, inputs)
    entries.compute(spark, (_, v) =>
      e :: (if (v == null) Nil else v.filterNot(_.mvPath == mvPath)))
  }

  /** Structural match first (cheap, in-memory), THEN the freshness
    * fingerprint (one LIST of the base inputs) only on a hit. */
  def lookup(spark: SparkSession, plan: LogicalPlan): Option[Entry] =
    Option(entries.get(spark)).getOrElse(Nil).find { e =>
      plan.sameResult(e.definition) &&
        graft.sources.Sinks.fingerprint(spark, e.inputs: _*) == e.fingerprint
    }

  def clear(spark: SparkSession): Unit = { entries.remove(spark); () }

  /** Did this DataFrame's plan get served from a materialized view?
    * (Inspects the optimized plan's file-source roots — the loud-check
    * seam queries and specs use to pin that routing actually engaged.) */
  def servedFromMv(df: DataFrame, mvPath: String): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.exists(_.endsWith(new java.io.File(mvPath).getName))
}

/** The rewrite itself (see [[MvCatalog]]). Runs once per analysis as a
  * post-hoc resolution rule; reads of the MV parquet re-enter the analyzer
  * with a bare relation plan (no Aggregate), so the rule cannot recurse. */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate =>
      MvCatalog.lookup(spark, agg) match {
        case Some(e) =>
          val mv = spark.read.parquet(e.mvPath).queryExecution.analyzed
          val byName = mv.output.map(a => a.name -> a).toMap
          // alias MV columns back to the query's attribute ids so parents
          // (sorts, filters, projects above the aggregate) resolve unchanged
          val projections: Seq[NamedExpression] = agg.output.map { o =>
            Alias(byName(o.name), o.name)(exprId = o.exprId)
          }
          Project(projections, mv)
        case None => agg
      }
  }
}
