package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps.normText

class GraftOptimizationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // non-foldable array inputs (literals would constant-fold to a
  // LocalRelation before any optimizer rule could be observed)
  private def docsPairs = {
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(split(normText(col("text")), " ")).as("t"))
    val a = docs.as("a"); val b = docs.as("b")
    a.join(b, col("a.doc_id") % 29 === col("b.doc_id") % 29 &&
      col("a.doc_id") < col("b.doc_id"))
  }

  test("size(array_intersect) rewrites to array_intersect_size with equal results") {
    GraftOptimizations.install(spark)
    val df = docsPairs
      .select(col("a.doc_id"), col("b.doc_id"),
        size(array_intersect(col("a.t"), col("b.t"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_intersect_size"),
      s"rewrite did not fire:\n$optimized")
    // results identical to the unrewritten computation (computed via the
    // native expression directly, already pinned == built-in in
    // VectorExpressionsSpec; here we check the rewritten plan end-to-end)
    val viaRule = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val direct = docsPairs
      .select(col("a.doc_id"), col("b.doc_id"),
        graft.functions.ArrayFunctions.intersectSize(col("a.t"), col("b.t")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(viaRule.sorted.toSeq == direct.sorted.toSeq)
  }

  test("levenshtein <= k gains a length-difference guard; results identical; idempotent") {
    GraftOptimizations.install(spark)
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"), substring(normText(col("text")), 1, 80).as("p"))
    val a = docs.as("a"); val b = docs.as("b")
    val joined = a.join(b, col("a.doc_id") % 29 === col("b.doc_id") % 29 &&
      col("a.doc_id") < col("b.doc_id"))
    val df = joined
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        levenshtein(col("a.p"), col("b.p")).as("d"))
      .filter(col("d") <= 15)
    val optimized = df.queryExecution.optimizedPlan
    val s = optimized.toString
    assert(s.contains("abs(") && s.contains("length("),
      s"guard did not fire:\n$s")
    // idempotent: re-running the rule adds nothing
    assert(LevenshteinPrefilter(optimized) fastEquals optimized)
    // results identical to an un-guarded recompute via RDD-free collect
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val pairs = joined.select(col("a.doc_id"), col("b.doc_id"),
      col("a.p"), col("b.p")).collect()
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val expected = pairs.map(r => (r.getLong(0), r.getLong(1),
        lev(r.getString(2), r.getString(3))))
      .filter(_._3 <= 15).sorted.toSeq
    assert(got == expected)
  }

  test("prefilter idempotence is positional: a guarded copy in one disjunct " +
      "does not suppress the rewrite of an unguarded copy elsewhere") {
    import org.apache.spark.sql.catalyst.expressions.{Abs, And, AttributeReference,
      Length, LessThanOrEqual, Levenshtein, Literal, Or, Subtract}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    import org.apache.spark.sql.types.StringType
    val a = AttributeReference("a", StringType)()
    val b = AttributeReference("b", StringType)()
    val cmp = LessThanOrEqual(Levenshtein(a, b, None), Literal(5))
    val guard = LessThanOrEqual(
      Abs(Subtract(Length(a), Length(b)), failOnError = false), Literal(5))
    val rel = LocalRelation(a, b)
    // (guard AND cmp) OR cmp — the second, unguarded cmp must still be
    // wrapped (the r4 semantic-equality set skipped it); the first pair
    // must stay a unit (no double guard)
    val out = LevenshteinPrefilter(Filter(Or(And(guard, cmp), cmp), rel))
      .asInstanceOf[Filter].condition
    val expected = Or(And(guard, cmp), And(guard, cmp))
    assert(out.semanticEquals(expected), s"got: $out")
    // and a second application changes nothing
    val again = LevenshteinPrefilter(Filter(out, rel))
      .asInstanceOf[Filter].condition
    assert(again fastEquals out)
  }

  test("legacy sizeOfNull plans are left untouched (rule-level guard)") {
    // this Spark version's analyzer emits Size(_, false) regardless of the
    // legacy conf on the DataFrame path, so pin the guard on the rule itself
    import org.apache.spark.sql.catalyst.expressions.{Alias, ArrayIntersect, AttributeReference, Size}
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val x = AttributeReference("x", ArrayType(StringType))()
    val y = AttributeReference("y", ArrayType(StringType))()
    val rel = LocalRelation(x, y)
    def proj(legacy: Boolean) = Project(
      Seq(Alias(Size(ArrayIntersect(x, y), legacySizeOfNull = legacy), "n")()), rel)
    val legacyPlan = proj(legacy = true)
    assert(IntersectSizeRewrite(legacyPlan) eq legacyPlan) // untouched
    assert(IntersectSizeRewrite(proj(legacy = false)).toString
      .contains("array_intersect_size"))
  }
}
