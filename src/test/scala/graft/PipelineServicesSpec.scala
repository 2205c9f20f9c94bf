package graft

import java.nio.file.{Files, Path}
import java.time.Instant
import java.time.temporal.ChronoUnit
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.config._
import graft.io._
import graft.ops._
import graft.state.Watermark

/** Golden-file tests over the full reference-shaped pipelines: sink contents,
  * error-log contents, quarantine moves, watermark advancement (SURVEY.md
  * §5.2.5) — driven through temp-dir fixtures shaped like FIXTURES.md §B.
  */
class PipelineServicesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(): Path = Files.createTempDirectory("graft-e2e")

  test("watermark: default epoch, gate, commit") {
    val dir = tmp()
    val w = new Watermark(dir.resolve("state/x.txt"))
    assert(w.read() == Instant.EPOCH)
    val t = Instant.parse("2024-06-01T00:00:00Z")
    assert(w.isNewerThanWatermark(t))
    w.commit(t)
    assert(w.read() == t)
    assert(!w.isNewerThanWatermark(t)) // strictly-newer gate
    assert(w.isNewerThanWatermark(t.plusSeconds(1)))
  }

  test("error log: per-day file, append, Fatal throws") {
    val dir = tmp()
    val log = new ErrorLog(dir)
    log.write("first", NotFatal)
    log.write("second", NotFatal)
    val files = Files.list(dir).iterator.asScala.toSeq
    assert(files.size == 1)
    val content = Files.readString(files.head)
    assert(content.linesIterator.size == 2)
    assert(content.contains("first") && content.contains("second"))
    intercept[RuntimeException] { log.write("boom", Fatal) }
    assert(Files.readString(files.head).contains("boom")) // logged before throw
  }

  test("archive + quarantine moves with timestamp prefixes") {
    val dir = tmp()
    val f = dir.resolve("stock.csv"); Files.writeString(f, "a,b\n1,2\n")
    val archived = Archive.archiveCompleted(f, dir.resolve("done"))
    assert(!Files.exists(f) && Files.exists(archived))
    assert(archived.getFileName.toString.endsWith(" stock.csv"))

    assert(Archive.quarantineUnprocessed(dir.resolve("nope.csv"),
      dir.resolve("err"), "Nope").isEmpty)
    val g = dir.resolve("orders.csv"); Files.writeString(g, "x\n")
    val q = Archive.quarantineUnprocessed(g, dir.resolve("err"), "Orders")
    assert(q.exists(p => p.getFileName.toString.startsWith("Unprocessed Orders ")))
    assert(!Files.exists(g))
  }

  test("import pipeline end-to-end: sanitize, date-convert, PK filter, project, archive, watermark") {
    val root = tmp()
    val in = root.resolve("csv_in"); Files.createDirectories(in)
    // FIXTURES.md §B5: quotes, keywords incl. substring GRANTED, serial dates
    Files.writeString(in.resolve("stock.csv"),
      """ItemId,ItemName,LastSold,Extra
        |1,Widget; DROP tables,45123.5,x
        |2,O'Brien GRANTED part,45124,y
        |,orphan row,45125,z
        |""".stripMargin)
    Files.writeString(root.resolve("import_settings.txt"),
      s"""lastImpLogFolderPath=$root/lastimp
         |importFilesFolderPath=$in
         |importProcessedFolderPath=$root/completed
         |errorFolderPath=$root/error
         |""".stripMargin)
    Files.writeString(root.resolve("stock_import_settings.txt"),
      """importTable==Stock Table
        |importTablePK==ItemId
        |importFieldNames==ItemId,ItemName,LastSold
        |importServerName==localhost
        |importDatabaseName==StockDB
        |importDatetimeFields==LastSold
        |""".stripMargin)
    val sinkDir = root.resolve("sink"); Files.createDirectories(sinkDir)
    val results = ImportPipeline.runAll(spark, root, _ => new CsvFolderSink(sinkDir))
    assert(results == Seq("stock" -> true))

    val out = CsvTable.read(spark, sinkDir.resolve("Stock Table.csv"))
    val rows = out.collect().map(r => (0 until r.length).map(i =>
      Option(r.getString(i)).getOrElse("")).toList).sortBy(_.head)
    assert(out.columns.toSeq == Seq("ItemId", "ItemName", "LastSold")) // P2 projection
    assert(rows.length == 2) // orphan filtered (F2)
    assert(rows(0) == List("1", "Widget [[DROP]] [[table]]s", "2023-07-18 12:00:00"))
    assert(rows(1) == List("2", "OBrien [[GRANT]]ED part", "2023-07-19 00:00:00"))

    // consumed file archived (K4), watermark advanced (K8)
    assert(!Files.exists(in.resolve("stock.csv")))
    assert(Files.list(root.resolve("completed")).count() == 1)
    assert(new Watermark(root.resolve("lastimp/stock_last_imported.txt"))
      .read() != Instant.EPOCH)
    // rejected row captured with provenance (ErrorSink)
    val rejects = ErrorSink.read(spark, root.resolve("error/rejected_rows").toString)
    assert(rejects.count() == 1)
    assert(rejects.select("reason").head().getString(0).contains("ItemId"))
  }

  test("import pipeline: missing csv is NotFatal and logged") {
    val root = tmp()
    Files.createDirectories(root.resolve("csv_in"))
    Files.writeString(root.resolve("import_settings.txt"),
      s"""lastImpLogFolderPath=$root/lastimp
         |importFilesFolderPath=$root/csv_in
         |importProcessedFolderPath=$root/completed
         |errorFolderPath=$root/error
         |""".stripMargin)
    Files.writeString(root.resolve("ghost_import_settings.txt"),
      """importTable==G
        |importTablePK==Id
        |importFieldNames==All
        |importServerName==s
        |importDatabaseName==d
        |""".stripMargin)
    val results = ImportPipeline.runAll(spark, root, _ => new CsvFolderSink(root))
    assert(results == Seq("ghost" -> false))
    val logs = Files.list(root.resolve("error")).iterator.asScala
      .filter(Files.isRegularFile(_)).toSeq
    assert(logs.exists(p => Files.readString(p).contains("not found")))
  }

  test("export pipeline: watermark gate, sheet match, quarantine, csv out") {
    val root = tmp()
    val excelIn = root.resolve("excel_in"); Files.createDirectories(excelIn)
    val wb = excelIn.resolve("Blackboard.xlsx"); Files.writeString(wb, "fake")
    Files.writeString(root.resolve("export_settings.txt"),
      s"""lastModLogFolderPath=$root/lastmod
         |csvExportFolderPath=$root/csv_out
         |errorFolderPath=$root/error
         |""".stripMargin)
    Files.writeString(root.resolve("Blackboard_export_settings.txt"),
      s"""exportFileExtention=.xlsx
         |exportSourceFolderPath=$excelIn
         |sheetsToExport=Stock, Orders, Missing
         |headerRow=1
         |""".stripMargin)
    // pre-existing unconsumed export → must be quarantined
    Files.createDirectories(root.resolve("csv_out"))
    Files.writeString(root.resolve("csv_out/Stock.csv"), "old\n")

    val fake = new SheetSource {
      override def sheetNames(workbook: Path) = Seq("Stock", "Orders", "Other")
      override def readSheet(s: SparkSession, workbook: Path, sheet: String, headerRow: Int): DataFrame = {
        import s.implicits._
        Seq((s"$sheet-1", "v1"), (s"$sheet-2", "v2")).toDF("Id", "Val")
      }
    }
    val r1 = ExportPipeline.runAll(spark, root, fake)
    assert(r1.map(_.exportedSheets) == Seq(Seq("Stock", "Orders"))) // F3 match
    assert(Files.exists(root.resolve("csv_out/Stock.csv")))
    assert(Files.exists(root.resolve("csv_out/Orders.csv")))
    val quarantined = Files.list(root.resolve("error")).iterator.asScala.toSeq
    assert(quarantined.exists(_.getFileName.toString.startsWith("Unprocessed Stock ")))

    // second run: unchanged workbook → watermark-gated skip (ST1)
    val r2 = ExportPipeline.runAll(spark, root, fake)
    assert(r2.head.skippedByWatermark && r2.head.exportedSheets.isEmpty)

    // touch the workbook → re-export happens
    Files.setLastModifiedTime(wb, java.nio.file.attribute.FileTime.from(
      Files.getLastModifiedTime(wb).toInstant.plusSeconds(5)))
    val r3 = ExportPipeline.runAll(spark, root, fake)
    assert(r3.head.exportedSheets.nonEmpty)
  }

  test("search pipeline: semi-join, copy, write-back, reconciliation") {
    val root = tmp()
    val store = root.resolve("store/sub"); Files.createDirectories(store)
    Files.writeString(store.resolve("doc2.pdf"), "pdf2")
    Files.writeString(store.resolve("doc3.pdf"), "pdf3")
    val csv = root.resolve("invoices.csv")
    Files.writeString(csv,
      """InvoiceNumber,Found
        |INV001,Yes
        |INV002,
        |INV003,
        |INV004,
        |""".stripMargin)
    val cfg = SearchConfig(Map(
      "serverName" -> "s", "databaseName" -> "d",
      "query" -> "SELECT ... IN ('INVOICE_NUMBERS')",
      "invoiceCsvPath" -> csv.toString,
      "docStoreRoot" -> root.resolve("store").toString,
      "destinationFolder" -> root.resolve("dest").toString))
    import spark.implicits._
    // INV001 matches in DB but was already Found=Yes → F1 keeps it out;
    // INV002 has two documents (the reference's multi-POD caveat);
    // INV004 matches nothing.
    val docs = Seq(
      ("INV001", "sub", "doc1.pdf", "refA"),
      ("INV002", "sub", "doc2.pdf", """ref\with/slashes"""),
      ("INV002", "sub", "doc3.pdf", """ref\with/slashes"""),
      ("INV003", "sub", "missing.pdf", "refC"))
      .toDF("invnum", "sub_folder", "file_name", "customer_ref")

    val report = SearchPipeline.run(spark, cfg, docs)
    assert(report.nKeys == 3)          // INV002..4 (INV001 skipped by F1)
    assert(report.nInvoicesFound == 2) // INV002, INV003 matched in docs
    assert(report.nFilesFound == 2)    // doc2+doc3 copied; missing.pdf absent
    assert(report.nMissing == 1)       // INV004

    val copied = Files.list(root.resolve("dest")).iterator.asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(copied == Seq( // F-S3 scrub in the composed name
      "INV002 - ref with slashes - doc2.pdf",
      "INV002 - ref with slashes - doc3.pdf"))

    val after = CsvTable.read(spark, csv).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse(""))).toMap
    assert(after == Map(
      "INV001" -> "Yes", "INV002" -> "Yes", "INV003" -> "Yes", "INV004" -> ""))

    // idempotent re-run: nothing left to find except INV004
    val report2 = SearchPipeline.run(spark, cfg, docs)
    assert(report2.nKeys == 1 && report2.nInvoicesFound == 0)
  }

  test("housekeeping retention: age filter + delete, dry-run") {
    val dir = tmp()
    val oldF = dir.resolve("old.txt"); Files.writeString(oldF, "x")
    val newF = dir.resolve("new.txt"); Files.writeString(newF, "y")
    val now = Instant.now()
    Files.setLastModifiedTime(oldF, java.nio.file.attribute.FileTime.from(
      now.minus(40, ChronoUnit.DAYS)))
    val cfg = HousekeepingConfig(Seq(dir), maxAgeDays = 30)
    val dry = Housekeeping.run(cfg, dryRun = true, now = now)
    assert(dry.map(_.path) == Seq(oldF) && Files.exists(oldF))
    val deleted = Housekeeping.run(cfg, now = now)
    assert(deleted.map(_.path) == Seq(oldF))
    assert(!Files.exists(oldF) && Files.exists(newF))
  }

  test("housekeeping auditFrame == candidates() on real files (would_delete set identity)") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = tmp()
    val now = Instant.now()
    // files straddling the 30-day cutoff, including the exact boundary
    // (candidates() is STRICTLY-before: a file aged exactly maxAgeDays
    // survives — auditFrame must agree)
    val ages = Seq("a.txt" -> 45L, "b.txt" -> 31L, "c.txt" -> 30L,
      "d.txt" -> 29L, "e.txt" -> 0L)
    ages.foreach { case (n, d) =>
      val f = dir.resolve(n); Files.writeString(f, n)
      Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.from(
        now.minus(d, ChronoUnit.DAYS)))
    }
    val cfg = HousekeepingConfig(Seq(dir), maxAgeDays = 30)
    val fromFiles = Housekeeping.candidates(cfg, now)
      .map(_.path.toString).toSet
    import spark.implicits._
    val listing = ages.map { case (n, d) =>
      (dir.resolve(n).toString,
        new java.sql.Timestamp(now.minus(d, ChronoUnit.DAYS).toEpochMilli))
    }.toDF("path", "mtime")
    val audited = Housekeeping.auditFrame(
        listing, lit(new java.sql.Timestamp(now.toEpochMilli)), 30)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    val fromFrame = audited.collect { case (p, _, true) => p }.toSet
    assert(fromFrame == fromFiles,
      s"auditFrame disagrees with candidates(): frame=$fromFrame files=$fromFiles")
    // the boundary file (exactly maxAgeDays old) must NOT be flagged
    assert(!fromFrame.exists(_.endsWith("c.txt")))
    // age_days is the floor of whole days
    val ageByPath = audited.map(a => a._1 -> a._2).toMap
    assert(ageByPath(dir.resolve("a.txt").toString) == 45L)
  }

  test("jdbc sink option mapping (K3 contract, no live SQL Server)") {
    val cfg = ImportConfig(
      Map("importFilesFolderPath" -> "/tmp/i", "importProcessedFolderPath" -> "/tmp/p",
        "errorFolderPath" -> "/tmp/e", "lastImpLogFolderPath" -> "/tmp/l"),
      Map("importTable" -> "Stock Table", "importTablePK" -> "Id",
        "importFieldNames" -> "All", "importServerName" -> "srv",
        "importDatabaseName" -> "db"), "stock")
    val opts = JdbcTableSink.writerOptions(cfg)
    assert(opts("dbtable") == "[Stock Table]") // F-S2 dialect quoting
    assert(opts("truncate") == "true")         // K3 truncate-load, not drop
    assert(opts("batchsize").toInt >= 1000)    // batched vs per-row reference
    assert(opts("url").contains("srv") && opts("url").contains("db"))
  }

  test("K2/F-S6 lock-fallback: blocked target falls back to dated sibling, original untouched") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq(("INV-1", "Y"), ("INV-2", "N")).toDF("InvoiceNumber", "Found")

    // Happy path first: unblocked target is written in place and returned.
    val free = dir.resolve("found.csv")
    val wrote = CsvTable.writeWithLockFallback(df, free)
    assert(wrote == free && Files.exists(free))
    assert(Files.readString(free).startsWith("InvoiceNumber,Found"))

    // Blocked path: the reference's motivating case is the CSV held open in
    // Excel (InvoiceFileSearchFromSQL.ps1:143-151). The portable analog of an
    // un-replaceable target is a non-empty directory at the target path —
    // Files.move onto it throws DirectoryNotEmptyException (an IOException),
    // the same failure class the locked-file move raises.
    val blocked = dir.resolve("results.csv")
    Files.createDirectories(blocked.resolve("held-open"))
    val now = java.time.ZonedDateTime.of(2026, 8, 15, 10, 0, 0, 0, java.time.ZoneOffset.UTC)
    val fb = CsvTable.writeWithLockFallback(df, blocked, now)
    // F-S6: `.csv$` suffix replaced with the dated `_yyyyMMdd.csv` sibling.
    assert(fb == dir.resolve("results_20260815.csv"))
    assert(Files.exists(fb))
    assert(Files.readString(fb).startsWith("InvoiceNumber,Found"))
    assert(Files.readString(fb).contains("INV-2"))
    // Original target untouched: still the directory, contents intact.
    assert(Files.isDirectory(blocked) && Files.exists(blocked.resolve("held-open")))
  }
}
