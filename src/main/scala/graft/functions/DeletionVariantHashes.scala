package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen ≤k-deletion-neighborhood hashes: the distinct 64-bit
  * FNV-1a hashes of every string reachable from the input by at most `k`
  * code-point deletions (including the input itself) — the SymSpell
  * candidate generator of [[graft.operators.EditDistanceJoin]] as one
  * primitive-array kernel.
  *
  * Replaces the Scala UDF formulation: a UDF returning Array[Long] pays
  * per-row catalyst conversion (boxing every element into a
  * GenericArrayData) and breaks whole-stage codegen around the explode's
  * input projection. This node writes an UnsafeArrayData straight from
  * the primitive long[] and stays inside the generated code. Parity with
  * `deletionVariants(s, k).map(fnv1a64)` is asserted in
  * EditDistanceJoinSpec.
  */
case class DeletionVariantHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 0, s"k must be >= 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deletion_variant_hashes"

  override protected def nullSafeEval(input: Any): Any =
    DeletionVariantHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = DeletionVariantHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.compute($c, $k);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeletionVariantHashes = copy(child = newChild)
}

object DeletionVariantHashes {

  /** Codegen kernel — static entry point referenced by generated Java. */
  def compute(s: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      graft.operators.EditDistanceJoin.deletionVariantHashes(s.toString, k))
}
