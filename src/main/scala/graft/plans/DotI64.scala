package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two bigint
  * arrays — the inner loop of the quantized ANN family
  * ([[graft.operators.Similarity.quantizedTopK]]), where int8 codes make
  * the dot a BIGINT sum of ≤127² terms.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * allocates a product array and walks two interpreted lambda chains per
  * pair (higher-order functions are CodegenFallback); evaluated inside a
  * query×corpus cross join that is the whole cost of the coarse pass.
  * This expression is one fused loop, no allocation, inside whole-stage
  * codegen — the same cure `minhash_sig` and `min_gram_hash` applied to
  * their hot loops (BASELINE.md rounds 6–7).
  *
  * Exactness: integer adds are associative-commutative, but the loop
  * keeps index order anyway; results are bit-identical to the HOF form.
  * Null semantics match the HOF chain exactly: a null array → null
  * (BinaryExpression default); any null ELEMENT nulls its product and
  * a null term nulls `aggregate`'s running sum, so the result is null;
  * mismatched lengths zip-extend with nulls under `zip_with`, so the
  * result is null there too (quantized codes always share the model
  * dim — the case exists only to keep the twin semantics total).
  */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i64 expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  // Null for length mismatch / null elements (HOF-equivalent semantics).
  override def nullable: Boolean = true

  override def prettyName: String = "dot_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}
