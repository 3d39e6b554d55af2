package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash over the code points of
  * a string — `h = (h*31 + codepoint) mod (2^31-1)` — the document
  * fingerprinting primitive for the LLM-pipeline layer.
  *
  * Implemented as a codegen'd `UnaryExpression` (not a Scala UDF) so it stays
  * inside whole-stage codegen: no boxing, no serialization of a closure, and
  * the loop compiles to straight-line Java in the generated stage — the
  * preferred extension path when built-in `functions._` can't express an op.
  *
  * Value-identical DuckDB form (used by the oracle):
  * `list_reduce(list_prepend(0, list_transform(string_split(text,''),
  *   c -> CAST(ascii(c) AS BIGINT))), (a,b) -> (a*31+b) % 2147483647)`.
  */
case class RollingHash31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash31 requires a string input, got ${child.dataType}")
  override def prettyName: String = "rolling_hash31"

  override def nullSafeEval(input: Any): Any =
    RollingHash31.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $str = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $str.length(); ) {
         |  int $cp = $str.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * 31L + (long) $cp) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}

object RollingHash31 {
  /** Interpreted path (also the unit-test reference model). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 2147483647L
    }
    h
  }

  def column(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge(RollingHash31(
      org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)))
}
