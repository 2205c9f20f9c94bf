package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Column combinators reproducing the reference's scalar semantics
  * (SURVEY.md §2.6–2.7). All are built from `org.apache.spark.sql.functions`
  * built-ins only — no Scala UDFs — so every expression stays inside
  * whole-stage codegen and is vectorizable at 100 TB scale.
  */
object RefFunctions {

  /** Forbidden characters removed by sanitize, in reference order
    * (/root/reference/CSVtoSQLimport.ps1:61). Order matters: `';'` removal can
    * create a new `"--"` (e.g. `"-;-"`) which the later pass then removes.
    */
  val ForbiddenChars: Seq[String] = Seq("'", ";", "--")

  /** SQL keyword list in exact reference order
    * (/root/reference/CSVtoSQLimport.ps1:64-65). Sequential substring
    * replacement means earlier entries shadow later ones: `EXECUTE` becomes
    * `[[EXEC]]UTE` (the `EXEC` pass fires first) and `TABLES` becomes
    * `[[TABLE]]S`. Case-sensitive, two variants, NOT word-boundary —
    * `GRANTED` → `[[GRANT]]ED`. Faithful by construction (same fold order).
    */
  val SqlSyntaxWords: Seq[String] = Seq(
    "SELECT", "DROP", "INSERT", "DELETE", "UPDATE", "EXEC", "EXECUTE",
    "ALTER", "CREATE", "GRANT", "REVOKE", "TRUNCATE", "TABLE", "TABLES",
    "select", "drop", "insert", "delete", "update", "exec", "execute",
    "alter", "create", "grant", "revoke", "truncate", "table", "tables")

  /** F-S1 `SanitizeString` (/root/reference/CSVtoSQLimport.ps1:59-78):
    * strip `'`, `;`, `--`, then wrap each SQL keyword occurrence in `[[...]]`,
    * all as sequential substring replaces. Null in → null out.
    */
  def sanitizeSql(c: Column): Column = {
    val stripped = ForbiddenChars.foldLeft(c)((acc, ch) =>
      replace(acc, lit(ch), lit("")))
    SqlSyntaxWords.foldLeft(stripped)((acc, w) =>
      replace(acc, lit(w), lit(s"[[$w]]")))
  }

  /** The same sanitize chain as DuckDB-runnable SQL, for oracle parity.
    * DuckDB `replace` is substring-based and case-sensitive like Spark's.
    */
  def sanitizeSqlOracle(inner: String): String = {
    def esc(s: String) = s.replace("'", "''")
    val stripped = ForbiddenChars.foldLeft(inner)((acc, ch) =>
      s"replace($acc, '${esc(ch)}', '')")
    SqlSyntaxWords.foldLeft(stripped)((acc, w) =>
      s"replace($acc, '$w', '[[$w]]')")
  }

  /** F-D1 `ConvertExcelDateToSQL` (/root/reference/CSVtoSQLimport.ps1:80-92):
    * Excel serial (string or number) → `1900-01-01 + serial days` →
    * `"yyyy-MM-dd HH:mm:ss"`; unparseable input → null (reference logs
    * NotFatal and returns `$null`).
    *
    * Epoch decision (SURVEY.md §7.6.1): the reference hard-codes 1900-01-01,
    * which is 2 days off real Excel's effective 1899-12-30 epoch; we
    * replicate the reference. Fractional days carry time-of-day —
    * .NET `AddDays` rounds to the nearest millisecond, hence
    * `round(days*86400000)` milliseconds; formatting truncates sub-seconds.
    */
  def excelSerialToSql(c: Column): Column = {
    val days = c.try_cast(DoubleType)
    val millis = round(days * lit(86400000.0), 0).cast("long")
    // 1900-01-01T00:00:00Z == epoch millis -2208988800000; session TZ is UTC
    // so epoch arithmetic matches DuckDB's naive-timestamp arithmetic.
    date_format(
      timestamp_millis(lit(-2208988800000L) + millis),
      "yyyy-MM-dd HH:mm:ss")
  }

  /** DuckDB oracle equivalent of [[excelSerialToSql]]. */
  def excelSerialToSqlOracle(inner: String): String =
    s"strftime(TIMESTAMP '1900-01-01' + to_milliseconds(CAST(round(TRY_CAST($inner AS DOUBLE) * 86400000.0, 0) AS BIGINT)), '%Y-%m-%d %H:%M:%S')"

  /** F-S3 CustomerRef scrub (/root/reference/InvoiceFileSearchFromSQL.ps1:88-90):
    * `\` and `/` each replaced by a space (path safety for the copy name).
    */
  def scrubRef(c: Column): Column =
    replace(replace(c, lit("\\"), lit(" ")), lit("/"), lit(" "))

  /** DuckDB oracle equivalent of [[scrubRef]]. */
  def scrubRefOracle(inner: String): String =
    s"replace(replace($inner, '\\', ' '), '/', ' ')"

  /** F-S2 `EncloseWithBrackets` (/root/reference/CSVtoSQLimport.ps1:49-57):
    * names containing a space are wrapped in `[...]`.
    */
  def bracketQuote(c: Column): Column =
    when(c.contains(" "), concat(lit("["), c, lit("]"))).otherwise(c)

  /** DuckDB oracle equivalent of [[bracketQuote]]. */
  def bracketQuoteOracle(inner: String): String =
    s"CASE WHEN contains($inner, ' ') THEN '[' || $inner || ']' ELSE $inner END"

  /** F-S8 universal null test: the reference conflates null and empty string
    * via `[String]::IsNullOrEmpty` (SURVEY.md §1.2).
    */
  def isNullOrEmpty(c: Column): Column = c.isNull || c === ""

  /** F1 not-found filter (/root/reference/InvoiceFileSearchFromSQL.ps1:52):
    * PowerShell `-ne 'Yes'` is true for null, so null rows are KEPT.
    */
  def notFound(c: Column): Column = c.isNull || c =!= "Yes"

  /** Driver-side F-S2 for the JDBC sink dialect. */
  def bracketQuoteName(name: String): String =
    if (name.contains(" ")) s"[$name]" else name
}
