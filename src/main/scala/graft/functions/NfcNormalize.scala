package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column, as a native codegen
  * expression.
  *
  * Web-crawled text arrives in mixed normalization forms: "é" appears both
  * precomposed (U+00E9) and decomposed (e + U+0301), which makes
  * byte-level fingerprints ([[graft.operators.TextOps]] md5 fingerprints,
  * MinHash shingles) treat identical-looking documents as distinct — a
  * silent dedup miss every large text pipeline hits. Canonical composition
  * (Unicode TR15 form C) collapses those to one byte sequence; running it
  * BEFORE fingerprinting/shingling makes near-dup detection
  * normalization-insensitive.
  *
  * Spark has no built-in normalizer; this wraps the JDK's ICU-equivalent
  * (`java.text.Normalizer`, canonical decomposition + composition) in a
  * null-intolerant unary expression. DuckDB's `nfc_normalize` implements
  * the same TR15 form, so results stay oracle-comparable byte-for-byte.
  * The JDK call allocates (String round-trip); ASCII-only inputs are
  * short-circuited with a byte scan — full-ASCII is the common case and
  * NFC is the identity on it.
  */
object NfcNormalize {
  /** JVM entry shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
