package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native codegen dot product of two `array<double>` columns.
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) =>
  * acc + x)` in the ANN hot path. Higher-order functions are
  * CodegenFallback in Spark — every pair evaluation materializes a zipped
  * array and runs interpreted lambda dispatch per element, which dominates
  * the brute-force cosine scorer (O(|Q|·N·d) dot products). This node
  * emits a tight fused multiply-add loop over the two ArrayData buffers
  * inside WholeStageCodegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF formulation (and to the DuckDB
  * oracle's `list_reduce(list_transform(...))` mirror) — the accumulation
  * is the same sequential left fold over the same IEEE doubles, so
  * similarity values hash-match:
  *  - null array on either side → null (null-intolerant);
  *  - length mismatch → null (zip_with pads with null, null product
  *    nullifies the fold);
  *  - any null element → null (null product nullifies the fold).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Result can be null even for non-null inputs (length mismatch / null
  // element), so nullability must not collapse to the children's.
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
