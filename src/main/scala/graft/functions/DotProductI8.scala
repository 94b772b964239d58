package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType, NullType}

/** Native codegen dot product of two `array<tinyint>` columns,
  * accumulated exactly in a long — the SQ8 candidate scorer's kernel
  * (see [[graft.operators.Ann.sq8Search]]).
  *
  * Why a dedicated expression instead of the HOF formulation: same
  * reason as [[DotProduct]] — `aggregate(zip_with(...))` is
  * CodegenFallback, materializing a zipped array and dispatching an
  * interpreted lambda per element in an O(|Q|·N·d) loop. This node is a
  * tight fused loop over the two byte buffers inside WholeStageCodegen.
  *
  * Exactness: byte products are at most 127·127 and corpora are bounded
  * far below 2^56/16129 elements, so the long accumulation can never
  * overflow — the result is EXACT integer arithmetic, which is what
  * makes the SQ8 stage-1 ranking bit-reproducible in any engine (the
  * DuckDB oracle mirrors it with BIGINT lists; no FP-parity argument
  * needed at all, unlike the double kernels).
  *
  * Null semantics match [[DotProduct]]: null array → null; length
  * mismatch → null; any null element → null.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(ByteType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<tinyint>, array<tinyint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_i8"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getByte(i).toLong * b.getByte(i).toLong
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
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
}
