package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, NullType}

/** Native codegen Z-order (Morton) interleave of two long columns: the low
  * 32 bits of `left` and `right` interleave into one 64-bit key (left
  * takes the even bit positions, right the odd).
  *
  * The point is LAYOUT, not lookup: range-partitioning and sorting a
  * corpus by `z_order(a, b)` gives every parquet file a narrow min/max
  * envelope in BOTH dimensions at once, so single-dimension predicates on
  * either column still prune files (a lexicographic sort by (a, b) only
  * prunes on `a`; at 100 TB the difference is scanning one dimension's
  * worth of files vs all of them). Classic multi-dimensional clustering —
  * Morton 1966, the same technique behind Delta/Iceberg Z-ORDER layout
  * maintenance — here as a plain deterministic Expression usable in
  * `repartitionByRange` / `sortWithinPartitions` (see
  * [[graft.sources.Layout.writeClustered]]).
  *
  * The interleave is the branchless shift-mask spread (Hacker's Delight
  * §7-2 / the "interleave by binary magic numbers" bit-twiddling identity):
  * 5 mask-shift rounds per operand, fused by whole-stage codegen. Inputs
  * outside [0, 2^32) contribute only their low 32 bits (documented: the
  * caller buckets/offsets first — rank or clamp upstream if the domain can
  * exceed 32 bits). Pure integer math → bit-identical in any engine, so
  * queries over it stay DuckDB-oracle-able.
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression {

  // Strictly (bigint, bigint): AbstractDataType/ImplicitCastInputTypes is
  // private[sql], so widening from narrower integrals happens in the
  // wrappers (functions.z_order casts; the SQL builder in GraftExtensions
  // wraps args in Cast) rather than via analyzer coercion here.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType || t == NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "z_order"

  @inline private def spread(v: Long): Long = {
    // 0x00000000FFFFFFFF -> one zero bit between each of the low 32 bits
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    spread(l.asInstanceOf[Long]) | (spread(r.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = $a & 0xFFFFFFFFL;
         |$x = ($x | ($x << 16)) & 0x0000FFFF0000FFFFL;
         |$x = ($x | ($x << 8)) & 0x00FF00FF00FF00FFL;
         |$x = ($x | ($x << 4)) & 0x0F0F0F0F0F0F0F0FL;
         |$x = ($x | ($x << 2)) & 0x3333333333333333L;
         |$x = ($x | ($x << 1)) & 0x5555555555555555L;
         |long $y = $b & 0xFFFFFFFFL;
         |$y = ($y | ($y << 16)) & 0x0000FFFF0000FFFFL;
         |$y = ($y | ($y << 8)) & 0x00FF00FF00FF00FFL;
         |$y = ($y | ($y << 4)) & 0x0F0F0F0F0F0F0F0FL;
         |$y = ($y | ($y << 2)) & 0x3333333333333333L;
         |$y = ($y | ($y << 1)) & 0x5555555555555555L;
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}
