package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.RefFunctions._

/** Property tests pinning sanitize fidelity (SURVEY.md §7.6.3). */
class SanitizeProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private def sanitizeBatch(xs: List[String]): List[String] =
    xs.toDF("x").select(sanitizeSql(col("x"))).as[String].collect().toList

  private val weird: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString), Gen.oneOf("'", ";", "--", "-", " "),
    Gen.oneOf(SqlSyntaxWords))).map(_.mkString)

  test("KMV buffer equals sorted-distinct-take-k under any reduce/merge split") {
    val agg = new graft.functions.KmvSmallest(5)
    val gen = for {
      xs <- Gen.listOf(Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)),
        Gen.numStr.map(_.take(4))))
      cut <- Gen.choose(0, xs.length)
    } yield (xs, cut)
    holds(Prop.forAll(gen) { case (xs: List[String], cut: Int) =>
      val expected = xs.distinct.sorted.take(5).toVector
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      merged == expected && direct == expected
    })
  }

  test("sanitize output never contains forbidden characters") {
    holds(Prop.forAll(Gen.listOfN(10, weird)) { xs: List[String] =>
      sanitizeBatch(xs).forall(out =>
        !out.contains("'") && !out.contains(";") && !out.contains("--"))
    })
  }

  test("sanitize is identity on clean strings") {
    val clean = Gen.listOf(
      Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const(' ')))
      .map(_.mkString)
      .suchThat(s => SqlSyntaxWords.forall(w => !s.contains(w)))
    holds(Prop.forAll(Gen.listOfN(10, clean)) { xs: List[String] =>
      sanitizeBatch(xs) == xs
    })
  }
}
