package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registered SQL functions evaluate via spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT sanitize_sql("Robert'); DROP TABLE Students;--") AS s,
        |       excel_serial_to_sql('45123.5') AS d,
        |       scrub_ref('a\\b/c') AS p,
        |       bracket_quote('Stock Table') AS q,
        |       round(cosine_sim(array(1.0, 0.0), array(1.0, 0.0)), 6) AS cos
        |""".stripMargin).head()
    assert(r.getString(0) == "Robert) [[DROP]] [[TABLE]] Students")
    assert(r.getString(1) == "2023-07-18 12:00:00")
    assert(r.getString(2) == "a b c")
    assert(r.getString(3) == "[Stock Table]")
    assert(r.getDouble(4) == 1.0)
  }

  test("wrong arity raises a helpful error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT sanitize_sql('a', 'b')").head()
    }
    assert(e.getMessage.contains("expects 1 argument"))
  }

  test("withExtensions wiring registers the same functions") {
    // the builder path (new session sharing the context)
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may return the existing session; register covers both
      GraftExtensions.register(s2)
      assert(s2.sql("SELECT sanitize_sql('DROP x') AS s").head().getString(0)
        == "[[DROP]] x")
    } finally ()
  }
}
