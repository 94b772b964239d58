package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** Native codegen winnowing selection: token array → DISTINCT selected
  * fingerprints (Schleimer+ SIGMOD'03 — see [[graft.operators.Winnow]]).
  *
  * Replaces the interpreted HOF chain (`transform(md5hash60)` →
  * rolling-hash `transform(aggregate(slice))` → window-min `transform`)
  * with one kernel call per document, keeping the projection inside
  * WholeStageCodegen. Values are BIT-IDENTICAL to the HOF form and the
  * DuckDB oracle mirror (parity-tested in WinnowSpec):
  *  - token hash = first 15 hex chars of md5 as a 60-bit long, computed
  *    here as (big-endian first 8 digest bytes) >>> 4 — exactly what
  *    `conv(substr(md5(s),1,15),16,10)` parses;
  *  - rolling k-gram hash folds (acc*Base + x) % Mod over signed-64, the
  *    same arithmetic both engines run (no overflow, class Scaladoc);
  *  - fewer than w grams → one global minimum; fewer than k tokens →
  *    empty array (the caller's size filter makes it unreachable).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
                              base: Long, mod: Long) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], k, w, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WinnowFingerprints.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.compute($c, $k, $w, ${base}L, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** md5hash60 of one token: first 15 hex chars of md5 as a long. */
  private def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    be >>> 4
  }

  /** Codegen kernel — static entry point referenced by generated Java. */
  def compute(toks: ArrayData, k: Int, w: Int, base: Long, mod: Long): ArrayData = {
    val n = toks.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    // token hashes (null token hashes like md5 of null -> the built-in md5
    // is null-intolerant per ELEMENT only inside transform; tokens from
    // split are never null, but guard with 0 to stay total)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 0L
        else hash60(toks.getUTF8String(i).getBytes)
      i += 1
    }
    val hs = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * base + th(i + j)) % mod; j += 1 }
      hs(i) = h
      i += 1
    }
    val out = new java.util.LinkedHashSet[Long]()
    if (nGrams < w) {
      var mn = hs(0); i = 1
      while (i < nGrams) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out.add(mn)
    } else {
      var j = 0
      while (j <= nGrams - w) {
        var mn = hs(j)
        var p = j + 1
        while (p < j + w) { if (hs(p) < mn) mn = hs(p); p += 1 }
        out.add(mn)
        j += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}
