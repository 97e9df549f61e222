package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** X2 (SURVEY §2.12): native Catalyst expression for cosine similarity over
  * two float-vector columns, with whole-stage codegen.
  *
  * Why a custom Expression (the documented escalation path — compose
  * built-ins first, Expression second): the higher-order-function form
  * `aggregate(zip_with(a,b,*), …)` runs interpreted (lambda functions are
  * not codegen'd), allocates an intermediate zipped array, and needs three
  * passes (dot, |a|², |b|²). This is THE hot inner loop of similarity
  * search — at 100 TB it runs per (query × candidate) pair. The codegen'd
  * loop is one pass, zero allocation.
  *
  * Numerics are IDENTICAL to the composed form: each element is widened
  * float→double (exact), products/sums accumulate in double in array
  * order, result = dot/(√nx·√ny) — so oracle SQL written for the composed
  * form stays valid bit-for-bit.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // Each side independently array<float> or array<double> (the trained
  // IVF codebook is a per-cell MEAN — double — scored against the float
  // corpus). Floats are widened float→double (exact), so a float side
  // computes bit-identically to the oracle's CAST(... AS DOUBLE[]) form.
  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e).isDefined)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float|double> args, got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType

  @transient private lazy val leftIsFloat =
    elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat =
    elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var nx = 0d; var ny = 0d; var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val getX = if (leftIsFloat) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Companion to CosineSim for the LSH bucket hot path: dot of a float
  * vector column against a double literal array (hyperplane). Same
  * escalation rationale — the composed transform+zip_with+aggregate form
  * is interpreted per element and re-inlined per consumer.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<float>, array<double>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object CosineSim {
  private val info = new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim")
  private val builder = (children: Seq[Expression]) =>
    CosineSim(children(0), children(1))

  /** Idempotent session-level registration (works on any session). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("cosine_sim"), info, builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))
  }
}

/** Injected optimizer rule (the SURVEY §2.12 Rule[LogicalPlan] path):
  * `x RLIKE 'lit'` with a metacharacter-free literal pattern is exactly
  * substring containment (Java-regex find() semantics are unanchored and
  * NULL-propagating, same as Contains) — rewrite it to the codegen'd
  * string Contains, skipping regex compilation/matching per row. Catalyst
  * ships LikeSimplification for LIKE but nothing for RLIKE, and text
  * pipelines emit literal rlike filters constantly (quality/langid
  * marker scans). Conservative guard: ASCII letters/digits/space/_ only.
  */
object SimplifyLiteralRLike extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.expressions.{Contains, Literal, RLike}
  import org.apache.spark.unsafe.types.UTF8String

  private def metaFree(p: String): Boolean =
    p.nonEmpty && p.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == ' ' || c == '_')

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // Guard on the DEFAULT (UTF8_BINARY) string collation: RLike always
      // matches with binary semantics, but Contains is collation-aware in
      // Spark 4 — under e.g. UTF8_LCASE the rewrite would change results
      // ('FAST' contains 'fast' but does not rlike 'fast').
      case RLike(l, Literal(p: UTF8String, _))
          if metaFree(p.toString) &&
            l.dataType == org.apache.spark.sql.types.StringType =>
        Contains(l, Literal(p, org.apache.spark.sql.types.StringType))
    }
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes `cosine_sim` AND `dot_product` available in every session of the
  * JVM — the same pair CosineSim.register installs per-session — and
  * installs the SimplifyLiteralRLike optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectOptimizerRule(_ => SimplifyLiteralRLike)
    ext.injectPlannerStrategy(_ => graft.plans.BoundedTopKStrategy)
  }
}
