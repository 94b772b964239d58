package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, NullType}

/** Native codegen 2-D Hilbert-curve index of two long columns (low 16
  * bits each → one index in [0, 2^32)) — [[ZOrder]]'s locality-better
  * sibling: consecutive Hilbert indices are always MANHATTAN-ADJACENT
  * cells (|Δx| + |Δy| = 1, the curve's defining property — pinned in
  * LayoutSpec), where Morton order takes long diagonal jumps at quadrant
  * boundaries. Same use: `repartitionByRange` + sort by the index gives
  * every file a tight min/max envelope in both dimensions, and Hilbert's
  * envelopes are tighter for the same file count (why Delta's OPTIMIZE
  * offers Hilbert clustering next to Z-order).
  *
  * Algorithm: the classic xy2d walk (Hilbert 1891; the loop formulation
  * is public domain — e.g. Warren, Hacker's Delight §16): descend 16
  * quadrant levels, add s²·((3·rx) XOR ry) per level, rotate/reflect the
  * frame. 16 bits per dim keeps d < 2^32 — comfortably inside BIGINT for
  * any engine (32-bit coords would need the unsigned 2^64 range).
  * Inputs contribute only their low 16 bits (documented, like ZOrder's
  * 32: bucket or rank upstream if the domain is wider). Pure integer
  * math, sequential but fixed-depth — bit-identical in any engine, so
  * the DuckDB oracle replays the 16 levels as unrolled CTE stages.
  */
case class HilbertOrder(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType || t == NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_order"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long] & 0xFFFFL
    var y = r.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 1L << 15; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertOrder =
    copy(left = newLeft, right = newRight)
}
