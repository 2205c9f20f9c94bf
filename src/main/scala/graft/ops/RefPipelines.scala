package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.RefFunctions._

/** The reference's dataflow surface (SURVEY.md §2) re-expressed as
  * declarative DataFrame pipelines over the test tables, each paired with a
  * DuckDB oracle in [[oracles]]. Scale notes per query in scaladoc.
  */
object RefPipelines {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** §3.2 core row pipeline (P3 sanitize-all ∘ P4 conditional date-convert ∘
    * F2 null-PK filter ∘ P2 ordered projection), on `orders` standing in for
    * the scanned CSV. Shuffle-free narrow map; filters/projections reach the
    * parquet scan. The final orderBy exists only for oracle determinism.
    */
  def csvImportCore(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    orders
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        sanitizeSql(col("o_orderstatus")).as("status_clean"),
        sanitizeSql(col("o_orderpriority")).as("priority_clean"),
        col("o_totalprice"))
      .filter(col("o_orderkey").isNotNull)
      .orderBy("o_orderkey")
  }

  /** F-S1 sanitize over free text (`documents.text` carries quotes/keywords). */
  def sanitizeText(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), sanitizeSql(col("text")).as("text_clean"))
      .orderBy("doc_id")

  /** F-D1 Excel-serial → SQL datetime over a synthesized serial column;
    * every ~97th key gets an unparseable value to exercise the null path.
    */
  def excelDateConvert(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val serial = (col("l_partkey") % 40000).cast("double") +
      col("l_linenumber").cast("double") * lit(0.25)
    val serialStr = when(col("l_orderkey") % 97 === 0, lit("not-a-date"))
      .otherwise(serial.cast("string"))
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        excelSerialToSql(serialStr).as("sql_datetime"))
      // shuffle boundary before the oracle-determinism sort: the pipeline
      // is otherwise exchange-free, so the range-partitioner's sampling
      // pass would re-run the scan + conversion over all of lineitem just
      // to pick sort bounds (measured 2.5s → 1.5s warm at sf0.1)
      .repartition(col("l_orderkey"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J1-b invoice semi-join: `orders ⋉ keys` with the key side broadcast —
    * the big side never shuffles, which is the 100 TB-safe shape
    * (/root/reference/InvoiceFileSearchFromSQL.ps1:62-63 splices the same
    * keys into SQL Server's WHERE ... IN).
    */
  def invoiceSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val keys = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    t(s, dir, "orders")
      .join(broadcast(keys), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** J2 found-flag write-back (/root/reference/InvoiceFileSearchFromSQL.ps1:117)
    * + F1 re-run filter (:52): only not-yet-found keys are searched; matches
    * get `Found='Yes'`, everything else keeps its prior flag. The matched key
    * set is distinct + broadcast (small by construction).
    */
  def foundFlagUpdate(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .select(
        col("c_custkey"), col("c_name"),
        when(col("c_acctbal") < 0, lit("Yes")).otherwise(lit("")).as("found0"))
    val searchKeys = base.filter(notFound(col("found0"))).select(col("c_custkey"))
    val matched = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .join(broadcast(searchKeys), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_custkey")).distinct()
    base
      .join(broadcast(matched), col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        col("c_custkey"), col("c_name"),
        when(col("o_custkey").isNotNull, lit("Yes"))
          .otherwise(col("found0")).as("found"))
      .orderBy("c_custkey")
  }

  /** A1/A2 reconciliation report
    * (/root/reference/InvoiceFileSearchFromSQL.ps1:136-140): keys searched vs
    * files found vs DISTINCT invoices found (the reference's "multiple PODs
    * per invoice" caveat), plus the missing delta. Single-row result.
    */
  def reconcileCounts(s: SparkSession, dir: String): DataFrame = {
    val keys = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val found = t(s, dir, "orders")
      .join(broadcast(keys), col("o_custkey") === col("c_custkey"), "left_semi")
    val foundAgg = found.agg(
      count(lit(1)).as("n_files_found"),
      countDistinct(col("o_custkey")).as("n_invoices_found"))
    val keysAgg = keys.agg(count(lit(1)).as("n_keys"))
    keysAgg.crossJoin(broadcast(foundAgg))
      .select(
        col("n_keys"), col("n_files_found"), col("n_invoices_found"),
        (col("n_keys") - col("n_invoices_found")).as("n_missing"))
  }

  /** F1 not-found filter with PowerShell null semantics: `-ne 'Yes'` keeps
    * null rows (/root/reference/InvoiceFileSearchFromSQL.ps1:52).
    */
  def notFoundFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", lit("Yes"))
          .when(col("c_mktsegment") === "MACHINERY", lit(null).cast("string"))
          .otherwise(lit("")).as("found"))
      .filter(notFound(col("found")))
      .orderBy("c_custkey")

  /** F-S2 bracket quoting applied in-data over names with spaces. */
  def bracketQuoteNames(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), bracketQuote(col("p_name")).as("quoted_name"))
      .orderBy("p_partkey")

  /** F-S3 CustomerRef scrub over document source strings. */
  def scrubRefs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), scrubRef(col("source")).as("ref_clean"))
      .orderBy("doc_id")

  /** F-S4 quoted-list join, distributed form: per-group ordered string_agg
    * (the reference builds `'a','b'` IN-lists driver-side,
    * /root/reference/InvoiceFileSearchFromSQL.ps1:63).
    */
  def quotedListJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), "','").as("name_list"))
      .orderBy("n_regionkey")

  /** F7/ST5 retention predicate as data: events older than 7 days before
    * the newest event. The max-ts aggregate is a scalar broadcast, the
    * filter itself is a narrow map (scales to any size).
    */
  def retentionFilter(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val mx = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") < col("max_ts") - expr("INTERVAL 7 DAYS"))
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy("event_id")
  }

  /** F7/ST5 retention as an auditable query (VERDICT r9 #7): the
    * [[Housekeeping.auditFrame]] classifier over a synthetic file listing
    * derived from `orders` (path = export CSV name per order, mtime = the
    * order timestamp, `now` = the listing's max mtime as a broadcast
    * scalar, TTL 90 days). Narrow map + 1-row scalar attach — no shuffle
    * beyond the deterministic orderBy. `mtime` rides formatted (the
    * retention_filter timestamp convention).
    */
  def retentionAudit(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val listing = o.select(
      concat(lit("/data/export/"), col("o_orderkey").cast("string"),
        lit(".csv")).as("path"),
      col("o_orderdate").as("mtime"))
    val now = o.agg(max(col("o_orderdate")).as("now"))
    Housekeeping.auditFrame(listing.crossJoin(broadcast(now)), col("now"), 90)
      .select(col("path"),
        date_format(col("mtime"), "yyyy-MM-dd HH:mm:ss").as("mtime_s"),
        col("age_days"), col("would_delete"))
      .orderBy("path")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retention_audit" -> (retentionAudit _),
    "csv_import_core" -> (csvImportCore _),
    "sanitize_text" -> (sanitizeText _),
    "excel_date_convert" -> (excelDateConvert _),
    "invoice_semi_join" -> (invoiceSemiJoin _),
    "found_flag_update" -> (foundFlagUpdate _),
    "reconcile_counts" -> (reconcileCounts _),
    "not_found_filter" -> (notFoundFilter _),
    "bracket_quote_names" -> (bracketQuoteNames _),
    "scrub_refs" -> (scrubRefs _),
    "quoted_list_join" -> (quotedListJoin _),
    "retention_filter" -> (retentionFilter _))

  val oracles: Map[String, String] = Map(
    "retention_audit" ->
      """WITH nw AS (SELECT max(o_orderdate) AS now FROM orders),
        |l AS (SELECT '/data/export/' || CAST(o_orderkey AS VARCHAR)
        |         || '.csv' AS path,
        |       o_orderdate AS mtime FROM orders)
        |SELECT path, strftime(mtime, '%Y-%m-%d %H:%M:%S') AS mtime_s,
        |       CAST(floor((epoch(now) - epoch(mtime)) / 86400) AS BIGINT)
        |         AS age_days,
        |       epoch(mtime) < epoch(now) - 90 * 86400 AS would_delete
        |FROM l, nw ORDER BY path""".stripMargin,
    "csv_import_core" ->
      s"""SELECT o_orderkey, o_custkey,
         |  ${sanitizeSqlOracle("o_orderstatus")} AS status_clean,
         |  ${sanitizeSqlOracle("o_orderpriority")} AS priority_clean,
         |  o_totalprice
         |FROM orders WHERE o_orderkey IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    "sanitize_text" ->
      s"""SELECT doc_id, ${sanitizeSqlOracle("text")} AS text_clean
         |FROM documents ORDER BY doc_id""".stripMargin,
    "excel_date_convert" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${excelSerialToSqlOracle(
              "CASE WHEN l_orderkey % 97 = 0 THEN 'not-a-date' " +
              "ELSE CAST(CAST(l_partkey % 40000 AS DOUBLE) + CAST(l_linenumber AS DOUBLE) * 0.25 AS VARCHAR) END")} AS sql_datetime
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "invoice_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "found_flag_update" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_acctbal < 0 THEN 'Yes' ELSE '' END AS found0
        |  FROM customer),
        |matched AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderstatus = 'F'
        |    AND o_custkey IN (SELECT c_custkey FROM base WHERE found0 IS NULL OR found0 <> 'Yes'))
        |SELECT b.c_custkey, b.c_name,
        |       CASE WHEN m.o_custkey IS NOT NULL THEN 'Yes' ELSE b.found0 END AS found
        |FROM base b LEFT JOIN matched m ON b.c_custkey = m.o_custkey
        |ORDER BY b.c_custkey""".stripMargin,
    "reconcile_counts" ->
      """WITH keys AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |found AS (SELECT o_custkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM keys))
        |SELECT (SELECT count(*) FROM keys) AS n_keys,
        |       (SELECT count(*) FROM found) AS n_files_found,
        |       (SELECT count(DISTINCT o_custkey) FROM found) AS n_invoices_found,
        |       (SELECT count(*) FROM keys) - (SELECT count(DISTINCT o_custkey) FROM found) AS n_missing""".stripMargin,
    "not_found_filter" ->
      """SELECT c_custkey, found FROM (
        |  SELECT c_custkey,
        |         CASE WHEN c_mktsegment = 'BUILDING' THEN 'Yes'
        |              WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |              ELSE '' END AS found
        |  FROM customer)
        |WHERE found IS NULL OR found <> 'Yes' ORDER BY c_custkey""".stripMargin,
    "bracket_quote_names" ->
      s"""SELECT p_partkey, ${bracketQuoteOracle("p_name")} AS quoted_name
         |FROM part ORDER BY p_partkey""".stripMargin,
    "scrub_refs" ->
      s"""SELECT doc_id, ${scrubRefOracle("source")} AS ref_clean
         |FROM documents ORDER BY doc_id""".stripMargin,
    "quoted_list_join" ->
      """SELECT n_regionkey, string_agg(n_name, ''',''' ORDER BY n_name) AS name_list
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "retention_filter" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events
        |WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        |ORDER BY event_id""".stripMargin)
}
