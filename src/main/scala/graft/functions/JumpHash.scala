package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, NullType}

/** Jump consistent hash (Lamping & Veach 2014, arXiv:1406.2294) as a
  * native codegen expression: maps a 64-bit key to a bucket in
  * [0, numBuckets) such that growing the bucket count from n to n+1 moves
  * EXACTLY the keys that land in the new bucket (an expected 1/(n+1)
  * fraction) and no others.
  *
  * This is the incremental-publishing shard assigner: `hash(key) % n`
  * reshuffles ~(n-1)/n of a 100 TB corpus when a shard is added, jump
  * hash moves ~1/(n+1) — the difference between rewriting the whole
  * dataset and appending one shard's worth. Balance matches mod-hash
  * (keys spread uniformly given a well-mixed key; feed it
  * [[md5hash60]]-style content hashes, not raw sequential ids).
  *
  * Determinism: the loop is integer LCG steps (64-bit wraparound
  * multiply — identical in Java's two's complement and any unsigned
  * 64-bit machine) plus one correctly-rounded IEEE double division and
  * multiply per step, with both operands exactly representable
  * (2^31 and (key >>> 33) + 1 <= 2^31) — so the DuckDB oracle replays
  * the loop bit-for-bit as a recursive CTE over HUGEINT state
  * (SparkEntry.sqlJumpHash). Expected iterations: ln(n) + O(1).
  *
  * Semantics notes: numBuckets <= 0 yields null (mirrors an invalid
  * configuration surfacing as a null shard, not a crash mid-pipeline);
  * the key's SIGNED long bits are treated as the unsigned 2^64 domain,
  * exactly as the paper's uint64_t.
  */
case class JumpHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType || t == NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jump_hash"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val n = r.asInstanceOf[Long]
    if (n <= 0L) null
    else {
      var key = l.asInstanceOf[Long]
      var b = -1L
      var j = 0L
      while (j < n) {
        b = j
        key = key * 2862933555777941757L + 1L
        j = ((b + 1L) * (2147483648.0 / (((key >>> 33) + 1L).toDouble))).toLong
      }
      b
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, n) => {
      val key = ctx.freshName("key")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      s"""
         |if ($n <= 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $key = $k;
         |  long $b = -1L;
         |  long $j = 0L;
         |  while ($j < $n) {
         |    $b = $j;
         |    $key = $key * 2862933555777941757L + 1L;
         |    $j = (long) (($b + 1L) * (2147483648.0D / (double) (($key >>> 33) + 1L)));
         |  }
         |  ${ev.value} = $b;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JumpHash =
    copy(left = newLeft, right = newRight)
}
