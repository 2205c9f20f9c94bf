package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.SearchConfig
import graft.functions.RefFunctions._
import graft.io.{CsvTable, FileCopySink}

/** §3.3 invoice document search, Spark-native (SURVEY.md;
  * /root/reference/InvoiceFileSearchFromSQL.ps1 — implementing the intended
  * semantics past the stray `exit` at :80, divergence §7.6.2).
  *
  * Dataflow: keys = CSV ⋅ F1(not-found) ⋅ P1(project); docs ⋉ keys (J1-b
  * broadcast left-semi — the big document table never shuffles); K7 copy via
  * distributed mapPartitions; J2 found-flag write-back; A2 reconciliation.
  */
object SearchPipeline {

  final case class SearchReport(
      nKeys: Long, nFilesFound: Long, nInvoicesFound: Long, nMissing: Long)

  /** F1+P1: not-yet-found invoice keys from the tracking CSV. */
  def searchKeys(invoices: DataFrame): DataFrame =
    invoices.filter(notFound(col("Found"))).select(col("InvoiceNumber"))

  /** J1-b: `docs ⋉ keys`, keys broadcast (provably small: an invoice list).
    * Option (a) — splicing keys into the remote query via
    * SearchConfig.queryWithKeys — is the faithful JDBC-deployment variant
    * (/root/reference/InvoiceFileSearchFromSQL.ps1:62-63).
    */
  def foundDocs(docs: DataFrame, keys: DataFrame): DataFrame =
    docs.join(broadcast(keys), docs("invnum") === keys("InvoiceNumber"), "left_semi")

  /** J2: flag matched keys Found='Yes', preserving prior flags. */
  def writeBackFound(invoices: DataFrame, matchedKeys: DataFrame): DataFrame = {
    val matched = matchedKeys.select(col("invnum")).distinct()
    invoices
      .join(broadcast(matched), invoices("InvoiceNumber") === matched("invnum"), "left_outer")
      .withColumn("Found",
        when(col("invnum").isNotNull, lit("Yes")).otherwise(col("Found")))
      .drop("invnum")
  }

  /** Full run against an arbitrary docs DataFrame (JDBC in production,
    * parquet/CSV in tests). Returns the A2 reconciliation report.
    */
  def run(spark: SparkSession, cfg: SearchConfig, docs: DataFrame): SearchReport = {
    val invoices = CsvTable.read(spark, cfg.invoiceCsvPath)
    val keys = searchKeys(invoices).cache()
    val nKeys = keys.count()
    if (nKeys == 0) return SearchReport(0, 0, 0, 0) // A1 short-circuit

    val found = foundDocs(docs, keys)
      .withColumn("customer_ref", scrubRef(col("customer_ref")))
      .cache()
    val copied = FileCopySink.copyDocuments(
      found, cfg.docStoreRoot.toString, cfg.destinationFolder.toString)
    val nFiles = copied.filter(col("copied") || col("detail") === "target exists").count()
    val nInvoices = found.select(countDistinct(col("invnum"))).head().getLong(0)

    val updated = writeBackFound(invoices, found.select(col("invnum")))
    CsvTable.writeWithLockFallback(updated, cfg.invoiceCsvPath)
    keys.unpersist(); found.unpersist()
    SearchReport(nKeys, nFiles, nInvoices, nKeys - nInvoices)
  }
}
