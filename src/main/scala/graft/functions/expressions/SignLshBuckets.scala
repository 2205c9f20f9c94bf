package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `bands` sign-LSH band buckets of a vector in ONE pass: plane
  * `h = band*bitsPerBand + bit` has hash-derived weight
  * `w(i,h) = pmod(xxhash64(i,h), 1e6)/1e6 − 0.5` for dimension i (uniform in
  * [−0.5, 0.5), deterministic — no external randomness, reproducible across
  * runs), and band bucket bit `bit` is set iff `Σᵢ vᵢ·w(i,h) > 0`. The
  * per-plane accumulation replicates the `aggregate(zip_with(...))` left
  * fold of the composed form bit-for-bit ON NULL-FREE INPUT (same fp
  * addition order; pinned by VectorExpressionsSpec), with the per-position
  * hash matching Spark's two-argument `xxhash64(i, h)` fold exactly
  * (seed 42, int-typed inputs). Null handling deliberately DIVERGES from
  * the composition (which nulls every plane sum and so zeroes every
  * bucket): here a null array → null row and a null ELEMENT is skipped —
  * the same contract as [[MinHashSignature]], also pinned in the spec.
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder, case (b)): the composed
  * form builds `bands·bitsPerBand` separate zip_with+aggregate trees, each
  * re-walking the vector through interpreted higher-order functions — H
  * passes over every vector. This node is a narrow map doing one pass
  * (O(d·H) multiplies, no allocation per plane), which is what a
  * 100 TB corpus needs from its candidate generator.
  */
case class SignLshBuckets(child: Expression, bitsPerBand: Int, bands: Int)
  extends UnaryExpression {

  require(bitsPerBand >= 1 && bitsPerBand <= 63,
    s"bitsPerBand must be in [1, 63], got $bitsPerBand")
  require(bands >= 1, s"bands must be >= 1, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets expects array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(SignLshBuckets.buckets(
      v.asInstanceOf[ArrayData], bitsPerBand, bands))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.SignLshBuckets.buckets($arr, $bitsPerBand, $bands));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_buckets"
}

object SignLshBuckets {
  private val Seed = 42L

  /** Static so generated code can call it. */
  def buckets(arr: ArrayData, bitsPerBand: Int, bands: Int): Array[Long] = {
    val h = bitsPerBand * bands
    val acc = new Array[Double](h)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getDouble(i)
        // xxhash64(i, p) == hashInt(p, hashInt(i, 42)) — both arguments are
        // IntegerType in the composed form, so both go through hashInt
        val s1 = XXH64.hashInt(i, Seed)
        var p = 0
        while (p < h) {
          val m = XXH64.hashInt(p, s1) % 1000000L
          val w = (if (m < 0) m + 1000000L else m) / 1000000.0 - 0.5
          acc(p) += x * w
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var v = 0L
      var r = 0
      while (r < bitsPerBand) {
        if (acc(b * bitsPerBand + r) > 0) v |= 1L << r
        r += 1
      }
      out(b) = v
      b += 1
    }
    out
  }
}
