package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overflow a single task (README
  * 100 TB posture). AQE's skew-join handles most cases at runtime; explicit
  * salting is the deterministic fallback when a dimension join's key
  * distribution is known-degenerate (one customer = 30% of events, etc.).
  *
  * Shape: the BIG side gets a deterministic per-row salt in [0, factor);
  * the SMALL side is exploded ×factor so every (key, salt) bucket finds its
  * match. The join result is row-identical to the unsalted join (pinned by
  * SkewOpsSpec); the hot key's rows now spread over `factor` tasks.
  */
object SkewOps {

  /** Deterministic per-row salt: hash of the whole row modulo factor — no
    * rand(), so plans stay reproducible and re-computable (retries, AQE).
    *
    * Caveats: EXACT duplicate rows of the hot key share a salt (they hash
    * alike) — if the skewed input is mostly identical rows, pre-aggregate
    * the duplicates or add a distinguishing column before salting. MapType
    * columns are not hashable by xxhash64; project them away first.
    */
  def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(factor.toLong))

  /** `big ⋈ small` on `bigKey === smallKey`, salted ×factor.
    * Supported joinType: "inner", "left_outer", "left_semi".
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val saltedBig = big.withColumn("__salt", rowSalt(big, factor))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    saltedBig
      .join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"),
        joinType)
      .drop("__salt")
  }
}
