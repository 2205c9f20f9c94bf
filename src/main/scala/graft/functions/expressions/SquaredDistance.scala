package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Σ (aᵢ−bᵢ)² over two array<double> columns, with whole-stage
  * codegen — the k-means / SemDeDup assignment inner loop.
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder, case (b)): the built-in
  * composition `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, _+_)`
  * is semantically identical but `HigherOrderFunction`s are
  * CodegenFallback — at k centroids × n vectors × d dimensions per
  * iteration this interpreted lambda is the hottest loop in the building
  * (VERDICT r4 #2); this node generates a tight primitive loop instead,
  * the same treatment [[DotProduct]] gave the ANN cosine loop.
  *
  * Numerical parity: the sum stays Σ(x−y)² — NOT the |a|²+|b|²−2ab
  * identity, which cancels catastrophically for near-duplicate vectors —
  * and accumulates as the same sequential left fold, so results are
  * bit-identical to the composition (pinned by VectorExpressionsSpec) and
  * to the DuckDB oracles' accumulation order.
  *
  * Null semantics match the composition: null array → null; arrays of
  * different lengths or any null element → null (zip_with pads the shorter
  * side with null and null propagates through the fold).
  */
case class SquaredDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_distance expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val d = aa.getDouble(i) - bb.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "squared_distance"
}
