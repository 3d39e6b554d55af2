package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot array kernels.
  *
  * These replace Scala UDFs on the pairwise scoring paths (similarity dot /
  * L2, dedup set-intersection). A UDF pays per-row CatalystConverter
  * boxing (ArrayData → Seq[Long]) and breaks whole-stage codegen; these
  * expressions read `ArrayData` primitives in place and emit a plain Java
  * loop via `doGenCode`, so the join/filter stage they sit in stays one
  * codegen'd pipeline. Preference order per the engine charter: builtin
  * functions > native Expression > UDF; these kernels have no builtin.
  *
  * The reference engine has no expression language at all (its only scalar
  * op is strcmp, reference mapreduce.c:62); this is the §2.2 "scalar
  * functions" engine plan applied to the LLM-pipeline extension columns.
  */
object ArrayExprs {

  sealed abstract class LongArrayFold extends BinaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    /** Java statement folding element i of arrays `a`,`b` into long acc `s`. */
    protected def foldJava(a: String, b: String): String
    protected def foldScala(x: Long, y: Long): Long

    // Element-wise folds are only defined for equal dimensions: silently
    // truncating to the shorter side (min) would return a PARTIAL dot/L2 —
    // a plausible wrong similarity score with no error, exactly the
    // mixed-dimension-corpus bug class. One comparison per call; the
    // branch is never taken on well-formed data. NULL array slots are out
    // of contract (nullIntolerant covers only top-level nulls) — embedding
    // columns are built from non-null element arrays.
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements())
        throw new IllegalArgumentException(
          s"$prettyName: array length mismatch: $n vs ${b.numElements()}")
      var s = 0L
      var i = 0
      while (i < n) { s += foldScala(a.getLong(i), b.getLong(i)); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "$prettyName: array length mismatch: " + $n + " vs " +
           |      $b.numElements());
           |}
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${foldJava(s"$a.getLong($i)", s"$b.getLong($i)").replace("ACC", s)}
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
  }

  /** Exact dot product of two long arrays (micro-scaled embeddings). */
  case class LongArrayDot(left: Expression, right: Expression)
      extends LongArrayFold {
    override def prettyName: String = "graft_dot"
    override protected def foldJava(x: String, y: String): String =
      s"ACC += $x * $y;"
    override protected def foldScala(x: Long, y: Long): Long = x * y
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Exact squared L2 distance of two long arrays. */
  case class LongArrayL2Sq(left: Expression, right: Expression)
      extends LongArrayFold {
    override def prettyName: String = "graft_l2sq"
    override protected def foldJava(x: String, y: String): String =
      s"long d = $x - $y; ACC += d * d;"
    override protected def foldScala(x: Long, y: Long): Long = {
      val d = x - y; d * d
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** |A ∩ B| for two SORTED primitive arrays via merge walk — the PPJoin
    * verification kernel. One base, two element widths: int gids cover
    * vocabularies to 2^31; the long variant is the swap beyond that (the
    * web-corpus regime DedupQueries documents). */
  sealed abstract class SortedIntersectBase extends BinaryExpression
      with ExpectsInputTypes {
    protected def elem: DataType
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(elem), ArrayType(elem))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    private def at(a: ArrayData, i: Int): Long =
      if (elem == IntegerType) a.getInt(i).toLong else a.getLong(i)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var c = 0L
      while (i < na && j < nb) {
        val x = at(a, i); val y = at(b, j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (jt, getter) =
          if (elem == IntegerType) ("int", "getInt") else ("long", "getLong")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $na = $a.numElements(); int $nb = $b.numElements();
           |int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $na && $j < $nb) {
           |  $jt $x = $a.$getter($i); $jt $y = $b.$getter($j);
           |  if ($x == $y) { $c++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })
  }

  case class SortedIntIntersectSize(left: Expression, right: Expression)
      extends SortedIntersectBase {
    override def prettyName: String = "graft_intersect_size"
    override protected def elem: DataType = IntegerType
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class SortedLongIntersectSize(left: Expression, right: Expression)
      extends SortedIntersectBase {
    override def prettyName: String = "graft_intersect_size_l"
    override protected def elem: DataType = LongType
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Signed-int8 dot product of two BinaryType columns — the scoring kernel
    * for scalar-quantized embeddings (4× smaller than the int-array form;
    * at 100 TB the embedding table is usually the biggest table there is,
    * so byte-packed vectors are the difference between an in-memory scan
    * and a spilling one). Bytes sign-extend; products fit int; the
    * accumulator is long (64 dims × 127² ≪ 2⁶³). */
  case class ByteArrayDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def prettyName: String = "graft_dot_i8"
    override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    // equal-length contract, same rationale as LongArrayFold: a truncated
    // byte-dot is a silently wrong score, not a smaller answer
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[Array[Byte]]
      val b = r.asInstanceOf[Array[Byte]]
      if (a.length != b.length)
        throw new IllegalArgumentException(
          s"$prettyName: vector length mismatch: ${a.length} vs ${b.length}")
      var s = 0L
      var i = 0
      while (i < a.length) { s += a(i).toLong * b(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.length;
           |if ($n != $b.length) {
           |  throw new IllegalArgumentException(
           |    "$prettyName: vector length mismatch: " + $n + " vs " +
           |      $b.length);
           |}
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (long) $a[$i] * $b[$i];
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** True SQL UDTF (a Catalyst [[Generator]], the `explode`/`json_tuple`
    * class): `graft_ngrams(text, n)` emits one (pos, gram) row per word
    * n-gram of the reference-shaped token stream — registered through
    * [[GraftExtensions]] so `LATERAL VIEW graft_ngrams(text, 3)` works in
    * raw SQL text, completing the UDF/UDAF/UDTF surface with the table-
    * function member (the other two are native expressions and
    * TopKAggregator). Tokenization delegates to [[Portable.tokensJvm]] —
    * the ONE definition every dedup/text path shares — so its grams equal
    * the oracle's TOKENS-built list exactly. CodegenFallback: generators
    * feed GenerateExec, which evaluates the generator once per input row
    * (the per-ELEMENT interpreted-HOF tax this repo bans does not apply);
    * Spark's own json_tuple ships the same way. */
  case class NGramsGenerator(text: Expression, n: Expression)
      extends Generator with CodegenFallback {
    override def children: Seq[Expression] = Seq(text, n)
    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      if (text.dataType == StringType && n.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams(text STRING, n INT) got (${text.dataType.sql}, " +
          s"${n.dataType.sql})")
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val t = text.eval(input)
      val nv = n.eval(input)
      if (t == null || nv == null) Iterator.empty
      else {
        val k = nv.asInstanceOf[Int]
        if (k < 1) throw new IllegalArgumentException(
          s"graft_ngrams: n must be >= 1, got $k")
        val toks = Portable.tokensJvm(t.toString)
        if (toks.length < k) Iterator.empty
        else (0 to toks.length - k).iterator.map { i =>
          val sb = new java.lang.StringBuilder(toks(i))
          var j = i + 1
          while (j < i + k) { sb.append(' ').append(toks(j)); j += 1 }
          InternalRow(i, UTF8String.fromString(sb.toString))
        }
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(text = newChildren(0), n = newChildren(1))
  }

  // ---- Column wrappers (the library's public algebra) ----

  def dot(a: Column, b: Column): Column =
    ColumnBridge(LongArrayDot(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  def l2sq(a: Column, b: Column): Column =
    ColumnBridge(LongArrayL2Sq(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  def intersectSize(a: Column, b: Column): Column =
    ColumnBridge(SortedIntIntersectSize(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  def intersectSizeLong(a: Column, b: Column): Column =
    ColumnBridge(SortedLongIntersectSize(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  def dotI8(a: Column, b: Column): Column =
    ColumnBridge(ByteArrayDot(ColumnBridge.expr(a), ColumnBridge.expr(b)))
}

/** SQL-surface registration: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) makes the kernels available as
  * `graft_dot`, `graft_l2sq`, `graft_intersect_size` in any SQL text. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import ArrayExprs._
  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom whole-operator semantics: the native as-of join planner rule
    // plus the predicate-pushdown optimizer rule for its logical node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOf)
    // transparent MV routing: post-hoc resolution (the DataSource-resolution
    // extension point) so matching aggregates read the materialized view
    ext.injectPostHocResolutionRule(s => graft.plans.MvRewriteRule(s))
    // snapshot-catalog row-level SQL: UPDATE/MERGE → SnapshotTable API
    // commands, delete-carrying versions → merge-on-read read plans
    ext.injectPostHocResolutionRule(s => graft.plans.SnapshotDmlRule(s))
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[ArrayExprs.type].getName, null, name, usage, "")
    // arity-checked like graft_bloom_agg below: a wrong argument count from
    // the SQL surface must name the function, not die in a raw
    // IndexOutOfBoundsException from cs(1)
    def binary(name: String, f: (Expression, Expression) => Expression)
        : Seq[Expression] => Expression = {
      case Seq(a, b) => f(a, b)
      case cs => throw new IllegalArgumentException(
        s"$name takes exactly 2 arguments, got ${cs.length}")
    }
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - exact dot product of long arrays"),
      binary("graft_dot", LongArrayDot.apply)))
    ext.injectFunction((FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "graft_l2sq(a, b) - exact squared L2 distance"),
      binary("graft_l2sq", LongArrayL2Sq.apply)))
    ext.injectFunction((FunctionIdentifier("graft_intersect_size"),
      info("graft_intersect_size",
        "graft_intersect_size(a, b) - |A∩B| of sorted int arrays"),
      binary("graft_intersect_size", SortedIntIntersectSize.apply)))
    ext.injectFunction((FunctionIdentifier("graft_intersect_size_l"),
      info("graft_intersect_size_l",
        "graft_intersect_size_l(a, b) - |A∩B| of sorted long arrays"),
      binary("graft_intersect_size_l", SortedLongIntersectSize.apply)))
    ext.injectFunction((FunctionIdentifier("graft_dot_i8"),
      info("graft_dot_i8",
        "graft_dot_i8(a, b) - signed-int8 dot product of binary columns"),
      binary("graft_dot_i8", ByteArrayDot.apply)))
    ext.injectFunction((FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams",
        "graft_ngrams(text, n) - UDTF: one (pos, gram) row per word n-gram"),
      binary("graft_ngrams", NGramsGenerator.apply)))
    // SQL surface for Spark's internal runtime-filter bloom expressions:
    // lets a query express the manual semi-join prefilter pattern
    // (`graft_might_contain((SELECT graft_bloom_agg(xxhash64(k)) FROM dim
    // WHERE ...), xxhash64(fact_key))`) — the scalar subquery satisfies
    // BloomFilterMightContain's foldable-or-subquery input contract, so the
    // filter materializes once and broadcasts like Spark's own injected
    // runtime filters.
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(xxhash64(k)[, est_items]) - bloom filter of a key set"),
      (cs: Seq[Expression]) => cs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg takes 1 or 2 arguments")
      }))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, xxhash64(k)) - bloom membership probe"),
      binary("graft_might_contain",
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(_, _))))
    // TABLE-VALUED function surface for the snapshot change feed: SQL
    // consumers read a version window as a relation —
    //   SELECT * FROM graft_changes('/warehouse/t', 1, 3, 'k')
    // — the same O(delta) readChanges the API serves (inserts carry the
    // full row + change='insert'; deletes carry the key + 'delete').
    // Arguments must be literals: the builder runs at ANALYSIS time and
    // resolves the window's manifests then, like any table reference.
    ext.injectTableFunction((FunctionIdentifier("graft_changes"),
      info("graft_changes",
        "graft_changes(base, vFrom, vTo, keyCol) - TVF: the snapshot " +
          "table's change feed over a version window"),
      (cs: Seq[Expression]) => cs match {
        case Seq(b, f, t, k) if cs.forall(_.foldable) =>
          def str(e: Expression) = e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => String.valueOf(other)
          }
          def int(e: Expression) = e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => String.valueOf(other).toInt
          }
          graft.sources.SnapshotTable.readChanges(
            org.apache.spark.sql.SparkSession.active,
            str(b), int(f), int(t), str(k)).queryExecution.analyzed
        case other => throw new IllegalArgumentException(
          "graft_changes(base, vFrom, vTo, keyCol) takes 4 LITERAL " +
            s"arguments, got ${other.length}")
      }))
  }
}
