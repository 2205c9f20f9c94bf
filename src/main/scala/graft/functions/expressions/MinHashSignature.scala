package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full MinHash signature in ONE pass over a pre-hashed token array:
  * `sig[j] = min_tokens xxhash64(tok, j)` for j in [0, nHashes), where the
  * per-position hash replicates Spark's two-argument `xxhash64(tok, j)`
  * fold exactly (seed 42, then the literal j hashed with the running seed) —
  * so signatures are bit-identical to the explode + groupBy + nHashes
  * min-aggregate composition (pinned by VectorExpressionsSpec).
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder, case (b)): the
  * composition explodes every (doc, token) pair into a SHUFFLE feeding
  * nHashes aggregates — at 100 TB that's a full pass of the tokenized
  * corpus through the exchange just to fold per-document minima that never
  * needed to leave their row. This node keeps signature computation a
  * narrow map. Null elements are skipped; null array → null.
  */
case class MinHashSignature(child: Expression, nHashes: Int)
  extends UnaryExpression {

  require(nHashes >= 1, s"nHashes must be >= 1, got $nHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      MinHashSignature.signature(v.asInstanceOf[ArrayData], nHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.MinHashSignature.signature($arr, $nHashes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  private val Seed = 42L

  /** Static so generated code can call it. Empty/all-null input → a
    * signature of Long.MaxValue (no token ever hashed below it).
    */
  def signature(arr: ArrayData, nHashes: Int): Array[Long] = {
    val sig = Array.fill(nHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getLong(i)
        // xxhash64(tok, j) == hashInt(j, hashLong(tok, 42)) — Spark's
        // multi-argument fold; the literal j is IntegerType, which XxHash64
        // hashes via hashInt, not hashLong
        val h1 = XXH64.hashLong(tok, Seed)
        var j = 0
        while (j < nHashes) {
          val h = XXH64.hashInt(j, h1)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    sig
  }
}
