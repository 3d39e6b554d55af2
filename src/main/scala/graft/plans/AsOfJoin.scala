package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

/** Native as-of join: for every left row, the single right row with the same
  * key and the greatest timestamp ≤ the left timestamp (ties broken by the
  * greatest `rightTie`), or nulls if none — LEFT OUTER as-of semantics.
  * With `forward = true` the direction flips: the SMALLEST right timestamp
  * ≥ the left timestamp (ties → smallest `rightTie`) — "the next reading at
  * or after this event". The forward merge is strictly simpler than the
  * backward one: the eligible row is the right cursor's head after advancing
  * past everything earlier, so it is peeked, never buffered.
  *
  * This is the charter's custom-operator ladder rung (c): Spark has no as-of
  * operator, and while the union+window composition (AdvancedQueries
  * "q_asof_join") expresses the semantics, a dedicated operator does it with
  * one sort-merge pass and no union blow-up. The pieces are the standard
  * extension points: a [[AsOfJoinPlan]] logical node, [[AsOfJoinStrategy]]
  * injected through SparkSessionExtensions (GraftExtensions), and a
  * [[AsOfJoinExec]] physical operator that declares ClusteredDistribution +
  * (key, ts) ordering requirements so EnsureRequirements plans exactly the
  * same exchanges/sorts a sort-merge join would get — one shuffle per side,
  * streaming merge, no state beyond one buffered row.
  */
object AsOfJoin {

  /** leftOn/rightOn: equality key; leftTs/rightTs: the as-of axis;
    * rightTie: unique tiebreaker for equal timestamps (determinism). */
  def apply(left: DataFrame, right: DataFrame,
      leftOn: Column, rightOn: Column,
      leftTs: Column, rightTs: Column, rightTie: Column,
      forward: Boolean = false): DataFrame = {
    val plan = AsOfJoinPlan(
      ColumnBridge.expr(leftOn), ColumnBridge.expr(rightOn),
      ColumnBridge.expr(leftTs), ColumnBridge.expr(rightTs),
      ColumnBridge.expr(rightTie), forward,
      planOf(left), planOf(right))
    DatasetBridge.ofRows(left.sparkSession, plan)
  }

  private def planOf(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}

case class AsOfJoinPlan(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression, rightTie: Expression,
    forward: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer extension for the custom node: Catalyst's PushDownPredicates
  * stops at operators it doesn't know, so a Filter above an as-of join would
  * otherwise evaluate post-join and the parquet scan would read every left
  * row. Left-side conjuncts are safe to push — each left row produces exactly
  * one output row regardless of the others — so they migrate below the join
  * (and from there Catalyst continues down to the scan's PushedFilters).
  * Right-side predicates must NOT push: the operator's "latest eligible right
  * row" selection depends on right rows a predicate might remove, and
  * unmatched lefts emit nulls (outer semantics). Deterministic-only, like the
  * builtin rule. Injected via `ext.injectOptimizerRule`. */
object PushFilterThroughAsOf
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        if (kept.isEmpty) pushed else Filter(kept.reduce(And), pushed)
      }
  }
}

/** Plans AsOfJoinPlan → AsOfJoinExec; injected via
  * `ext.injectPlannerStrategy(_ => AsOfJoinStrategy)`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lts, rts, rtie, fwd, l, r) =>
      AsOfJoinExec(lk, rk, lts, rts, rtie, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression, rightTie: Expression,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // the merge reads right-side slots with the LEFT side's data types — a
  // silent-garbage hazard unless the types genuinely agree, so fail loudly
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp types differ: ${leftTs.dataType} vs ${rightTs.dataType}")

  // the merge carries the previous match across left rows via a shallow copy
  // that is only safe for atomic types (UTF8String cloned explicitly,
  // fixed-width primitives copied by value). A nested (array/struct/map) key
  // would alias the reused projection buffer and silently corrupt matches —
  // reject until a caller needs one (then: InternalRow.copyValue).
  private def atomic(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.ArrayType => false
    case _: org.apache.spark.sql.types.MapType => false
    case _: org.apache.spark.sql.types.StructType => false
    case _: org.apache.spark.sql.types.UserDefinedType[_] => false
    case org.apache.spark.sql.types.NullType => false
    case _ => true
  }
  require(atomic(leftKey.dataType),
    s"as-of join key must be an atomic type, got ${leftKey.dataType}")
  require(atomic(leftTs.dataType),
    s"as-of timestamp must be an atomic type, got ${leftTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  // one output row per left row, produced in place by the partition zip:
  // the left child's hash partitioning survives the join exactly as it
  // does through SortMergeJoinExec's LEFT OUTER — declaring it saves a
  // redundant Exchange under any downstream per-key operator (groupBy /
  // window over the join key). Without this override the node reports
  // UnknownPartitioning and every consumer reshuffles.
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces; projections/orderings are
    // constructed per partition on the executor (codegen happens there,
    // exactly like SortMergeJoinExec)
    val lKeyExpr = leftKey; val lTsExpr = leftTs
    val rKeyExpr = rightKey; val rTsExpr = rightTs
    val fwd = forward
    val lOut = left.output; val rOut = right.output
    val keyType = leftKey.dataType
    val tsTypeL = leftTs.dataType
    val rightArity = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr, lTsExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr, rTsExpr), rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsTypeL)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val rBuf = ri.buffered
      new Iterator[InternalRow] {
        private var matchKey: Any = null
        private var matchRow: InternalRow = null
        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKeyProj(l)
          val lKey = lk.get(0, keyType)
          val lTs = lk.get(1, tsTypeL)
          if (lKey == null || lTs == null) {
            // no right row satisfies ts <= NULL; null keys never match
            resultProj(joined(l, nullRight))
          } else if (fwd) {
            // FORWARD: consume everything strictly before the boundary —
            // (key < lKey), null-ts rows, or (key == lKey && ts < lTs); the
            // boundary is monotone across left rows (keys then ts ascend),
            // so consumed rows can never be a later left row's match. The
            // match, if any, is then the un-consumed head: smallest
            // (ts, tie) ≥ lTs within the key, by the right sort order.
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rk = rKeyProj(rBuf.head)
              val rKey = rk.get(0, keyType)
              val cmp = if (rKey == null) -1 else keyOrd.compare(rKey, lKey)
              if (cmp < 0) { rBuf.next() }
              else if (cmp == 0 && rk.isNullAt(1)) { rBuf.next() }
              else if (cmp == 0 &&
                  tsOrd.compare(rk.get(1, tsTypeL), lTs) < 0) { rBuf.next() }
              else advancing = false
            }
            val ok = rBuf.hasNext && {
              val rk = rKeyProj(rBuf.head)
              val rKey = rk.get(0, keyType)
              rKey != null && keyOrd.compare(rKey, lKey) == 0
            }
            resultProj(joined(l, if (ok) rBuf.head else nullRight))
          } else {
            // advance the right side past everything (key < lKey) and absorb
            // rows of lKey with ts <= lTs as the running best match
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rk = rKeyProj(rBuf.head)
              val rKey = rk.get(0, keyType)
              val cmp = if (rKey == null) -1 else keyOrd.compare(rKey, lKey)
              if (cmp < 0) { rBuf.next() }
              else if (cmp == 0 && rk.isNullAt(1)) {
                // null-ts rows sort first within the key run and can never
                // match — skip, don't hand null to the interpreted ordering
                rBuf.next()
              }
              else if (cmp == 0 &&
                  tsOrd.compare(rk.get(1, tsTypeL), lTs) <= 0) {
                // defensive copy for reference-typed keys (the projection
                // buffer is reused across rows)
                matchKey = lKey match {
                  case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
                  case x => x
                }
                matchRow = rBuf.next().copy()
              } else advancing = false
            }
            val ok = matchRow != null && matchKey != null &&
              keyOrd.compare(matchKey, lKey) == 0
            resultProj(joined(l, if (ok) matchRow else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
