package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * The composable formulation (`zip_with` + `aggregate` higher-order
  * functions, [[graft.operators.Similarity.cosine]]) materializes an
  * intermediate product array and evaluates three lambda chains per row;
  * this expression is one fused loop with no allocation, and `doGenCode`
  * keeps it inside whole-stage codegen — the preference order the engine
  * follows when built-ins can't express an operator efficiently
  * (composition > native Expression > UDF).
  *
  * Accumulation order is index-ascending, identical to the sequential
  * HOF fold and to DuckDB's `list_dot_product` — for non-degenerate
  * inputs, swapping this in does not change a single output bit.
  *
  * Degenerate-input semantics (deliberately SAFER than the HOF): a
  * zero-norm or empty array yields null, where the HOF formulation
  * produces NaN (which ranks above every real cosine in a descending
  * window) or throws under ANSI. Null arrays → null (BinaryExpression
  * default); null elements are treated as 0.0; length mismatch
  * zip-truncates like `zip_with`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Manual check instead of ExpectsInputTypes: AbstractDataType is
  // private[sql]. No implicit coercion — callers cast to array<double>.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Result can be null even for non-null inputs (zero-norm guard below).
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // Zero-norm (or empty) input has no defined angle: return null rather
    // than NaN — NaN sorts ABOVE every real cosine in a descending rank,
    // which would crown a zero vector nearest-neighbor of everything.
    if (nx * ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  double $yi = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |if ($nx * $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
