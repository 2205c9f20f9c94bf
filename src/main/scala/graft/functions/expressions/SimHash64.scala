package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash of a pre-hashed token array (array<long>) in one pass:
  * bit i of the result is set iff Σ_tokens (2·bit_i(hash)−1) > 0.
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder, case (b)): the built-in
  * composition needs `explode` + a 64-expression aggregation — a shuffle of
  * every (doc, token) pair just to fold bits that are a narrow per-row loop.
  * This node turns the whole signature into a map-side computation (no
  * shuffle at all until the near-dup pair join), which is the difference
  * between one wide stage and none at 100 TB. Bit-for-bit equal to the
  * explode+aggregate composition (pinned by VectorExpressionsSpec).
  *
  * Null semantics: null array → null; null elements are skipped (they carry
  * no token).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |final int[] $counts = new int[64];
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += ((int) (($h >>> $b) & 1L) << 1) - 1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
