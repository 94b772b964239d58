package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Ratcliff/Obershelp similarity (0-100),
  * replacing the Scala UDF wrapper around [[RatcliffObershelp]].
  *
  * Why an Expression instead of a UDF (SURVEY.md §7.2): a UDF forces
  * Catalyst to treat the call as an opaque black box (breaks filter
  * pushdown reasoning, adds encoder round-trips per row); this node gets
  * standard null-intolerant semantics for free and participates in
  * WholeStageCodegen — `doGenCode` emits a direct static call on the
  * UTF8String inputs, the same pattern Spark's own `levenshtein` uses
  * (a generated call into a library kernel, no interpreted fallback).
  *
  * The reference's semantics anchor: string_similarity
  * (/root/reference/soulutionOne.py:8-11) = difflib ratio * 100.
  */
case class RatcliffObershelpSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType admitted like the built-in string functions do (a NULL
    // literal argument types as void; the null-intolerant eval returns null)
    def ok(t: DataType) = t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ro_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    RatcliffObershelpSimilarity.compute(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = RatcliffObershelpSimilarity.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $kernel.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RatcliffObershelpSimilarity =
    copy(left = newLeft, right = newRight)
}

object RatcliffObershelpSimilarity {
  /** Codegen kernel — static entry point referenced by generated Java. */
  def compute(l: UTF8String, r: UTF8String): Double =
    RatcliffObershelp.similarity(l.toString, r.toString)
}
