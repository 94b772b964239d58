package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen word n-grams: all space-joined runs of `n` consecutive
  * elements of a string array (fewer than n elements → empty array).
  *
  * Replaces the `transform(sequence(1, size-n+1), i => concat_ws(" ",
  * slice(toks, i, n)))` formulation in the shingling hot path: the
  * higher-order `transform` is CodegenFallback, so every document paid
  * interpreted lambda dispatch plus a slice allocation per gram — which
  * dominated MinHash signature generation (the gram builder ran ~500µs/doc
  * interpreted vs scan-speed here). This node is a tight loop over the
  * ArrayData buffer and keeps the projection inside WholeStageCodegen.
  *
  * Semantics are identical to the HOF form (parity-tested in
  * PipelineOpsSpec): null elements are skipped by the join exactly like
  * `concat_ws` (tokens from `split` are never null, but the contract
  * matches); a null array is null (null-intolerant).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordNGrams.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.compute($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Codegen kernel — static entry point referenced by generated Java. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements() - n + 1
    if (m <= 0) return Empty
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
