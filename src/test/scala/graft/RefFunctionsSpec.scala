package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RefFunctions._

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RefFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def sanitize1(s: String): String =
    Seq(s).toDF("x").select(sanitizeSql(col("x"))).as[String].head()

  test("sanitize removes forbidden chars in reference order") {
    assert(sanitize1("a'b;c--d") == "abcd")
    // ';' removal creates a new "--" that the later pass must then remove
    assert(sanitize1("-;-") == "")
  }

  test("sanitize wraps keywords, substring-based and case-sensitive") {
    assert(sanitize1("DROP the box") == "[[DROP]] the box")
    assert(sanitize1("GRANTED") == "[[GRANT]]ED")        // substring, not word
    assert(sanitize1("Granted") == "Granted")            // mixed case untouched
    assert(sanitize1("select SELECT") == "[[select]] [[SELECT]]")
  }

  test("sanitize keyword shadowing matches reference iteration order") {
    // EXEC fires before EXECUTE ever matches; TABLE before TABLES
    assert(sanitize1("EXECUTE") == "[[EXEC]]UTE")
    assert(sanitize1("TABLES") == "[[TABLE]]S")
    assert(sanitize1("truncate tables") == "[[truncate]] [[table]]s")
  }

  test("sanitize null/empty propagation") {
    val r = Seq[(Integer, String)]((1, null), (2, ""))
      .toDF("id", "x").select(sanitizeSql(col("x"))).as[String].collect()
    assert(r(0) == null && r(1) == "")
  }

  private def excel1(s: String): String =
    Seq(s).toDF("x").select(excelSerialToSql(col("x"))).as[String].head()

  test("excel serial conversion: 1900-01-01 epoch, fractional days") {
    assert(excel1("45123.5") == "2023-07-18 12:00:00")
    assert(excel1("1.25") == "1900-01-02 06:00:00")
    assert(excel1("0.75") == "1900-01-01 18:00:00")
    // reference epoch means no phantom 1900-02-29: serial 60 = Mar 2 here
    assert(excel1("60") == "1900-03-02 00:00:00")
    // sub-second fractions survive the millisecond rounding then truncate
    assert(excel1("45123.0001") == "2023-07-18 00:00:08")
  }

  test("excel serial conversion: unparseable input → null") {
    assert(excel1("not-a-date") == null)
    assert(excel1("") == null)
  }

  test("scrubRef replaces path separators with spaces") {
    val r = Seq("""a\b/c""").toDF("x").select(scrubRef(col("x"))).as[String].head()
    assert(r == "a b c")
  }

  test("bracketQuote wraps only names containing spaces") {
    val r = Seq("Stock Table", "Stock").toDF("x")
      .select(bracketQuote(col("x"))).as[String].collect()
    assert(r.toSeq == Seq("[Stock Table]", "Stock"))
    assert(bracketQuoteName("Stock Table") == "[Stock Table]")
    assert(bracketQuoteName("Stock") == "Stock")
  }

  test("notFound keeps nulls (PowerShell -ne semantics)") {
    val r = Seq[(Integer, String)]((1, "Yes"), (2, "No"), (3, null), (4, ""))
      .toDF("id", "f").filter(notFound(col("f"))).select("id")
      .as[Int].collect().sorted
    assert(r.toSeq == Seq(2, 3, 4))
  }
}
