package graft

import graft.functions.RatcliffObershelpSimilarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("... ro_similarity(a, b) ...")` works alongside the Column
  * API (SURVEY §2.1 S7 — the reference exposes a SQL entry point; our
  * custom functions join it).
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for `spark.sql.extensions` /
  *    `SparkSession.builder().withExtensions` (cluster-wide, survives new
  *    sessions);
  *  - [[Graft.registerFunctions]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RoSimilarityBound)
    ext.injectOptimizerRule(_ => graft.plans.TimeRangeJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {
  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ro_similarity"),
      new ExpressionInfo(classOf[RatcliffObershelpSimilarity].getName, "ro_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ro_similarity expects exactly 2 arguments")
        RatcliffObershelpSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product expects exactly 2 arguments")
        graft.functions.DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("z_order"),
      new ExpressionInfo(classOf[graft.functions.ZOrder].getName, "z_order"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "z_order expects exactly 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        graft.functions.ZOrder(Cast(args(0), LongType), Cast(args(1), LongType))
      }),
    (FunctionIdentifier("hilbert_order"),
      new ExpressionInfo(classOf[graft.functions.HilbertOrder].getName, "hilbert_order"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hilbert_order expects exactly 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        graft.functions.HilbertOrder(Cast(args(0), LongType), Cast(args(1), LongType))
      }),
    (FunctionIdentifier("jump_hash"),
      new ExpressionInfo(classOf[graft.functions.JumpHash].getName, "jump_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jump_hash expects exactly 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        graft.functions.JumpHash(Cast(args(0), LongType), Cast(args(1), LongType))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize expects exactly 1 argument")
        graft.functions.NfcNormalize(args(0))
      }),
    (FunctionIdentifier("deletion_variant_hashes"),
      new ExpressionInfo(classOf[graft.functions.DeletionVariantHashes].getName,
        "deletion_variant_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "deletion_variant_hashes expects exactly 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        val k = args(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"deletion_variant_hashes: k must be an integer literal, got $other")
        }
        graft.functions.DeletionVariantHashes(args(0), k)
      }))
}

object Graft {
  /** Register graft SQL functions on a live session. */
  def registerFunctions(spark: SparkSession): Unit = {
    GraftExtensions.descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
    // Aggregators register through the UDF surface, not FunctionRegistry
    // builders (they need their encoders carried along), so min_3 exists
    // ONLY on this live-session path — SparkSessionExtensions has no
    // hook for session-scoped UDF registration, so a cluster configured
    // via spark.sql.extensions must still call registerFunctions once
    // per session for the aggregate (documented asymmetry). Fixed small
    // k variant for SQL; the Column API takes any k (MinK.min_k).
    spark.udf.register("min_3",
      org.apache.spark.sql.functions.udaf(new graft.functions.MinK(3)))
  }

  /** Add graft's optimizer rules ([[graft.plans.RoSimilarityBound]],
    * [[graft.plans.TimeRangeJoinRewrite]]) and planner strategy
    * ([[graft.plans.TopKPerKeyStrategy]]) to a live session. Idempotent.
    */
  def enableOptimizations(spark: SparkSession): Unit = {
    val rules = Seq(graft.plans.RoSimilarityBound, graft.plans.TimeRangeJoinRewrite)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
  }
}
