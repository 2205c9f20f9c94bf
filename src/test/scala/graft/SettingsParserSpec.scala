package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.config._

class SettingsParserSpec extends AnyFunSuite {

  test("'=' delimiter parses key/value pairs") {
    val m = SettingsParser.parseLines(
      Seq("a=1", "b = 2 ", "", "# comment"), "=")
    assert(m == Map("a" -> "1", "b" -> "2"))
  }

  test("'==' delimiter (import/search settings format)") {
    val m = SettingsParser.parseLines(
      Seq("importTable==Stock Table", "importTablePK==ItemId"), "==")
    assert(m("importTable") == "Stock Table")
    assert(m("importTablePK") == "ItemId")
  }

  test("splits on FIRST delimiter only — values keep embedded delimiters") {
    // documented divergence from the reference, SURVEY.md §7.6.2
    val m = SettingsParser.parseLines(Seq("query==SELECT a==b FROM t"), "==")
    assert(m("query") == "SELECT a==b FROM t")
    val m2 = SettingsParser.parseLines(Seq("path=C:=weird"), "=")
    assert(m2("path") == "C:=weird")
  }

  test("discover lists settings files by suffix, sorted") {
    val dir = Files.createTempDirectory("graft-discover")
    Files.writeString(dir.resolve("b_import_settings.txt"), "x==1")
    Files.writeString(dir.resolve("a_import_settings.txt"), "x==1")
    Files.writeString(dir.resolve("other.txt"), "x==1")
    val found = SettingsParser.discover(dir, "_import_settings.txt")
      .map(_.getFileName.toString)
    assert(found == Seq("a_import_settings.txt", "b_import_settings.txt"))
    assert(SettingsParser.baseName(dir.resolve("a_import_settings.txt"),
      "_import_settings.txt") == "a")
  }

  test("ImportConfig: field list, All, datetime fields") {
    val main = Map(
      "importFilesFolderPath" -> "/tmp/in",
      "importProcessedFolderPath" -> "/tmp/done",
      "errorFolderPath" -> "/tmp/err",
      "lastImpLogFolderPath" -> "/tmp/lastimp")
    val per = Map(
      "importTable" -> "Stock Table", "importTablePK" -> "ItemId",
      "importFieldNames" -> "ItemId, ItemName ,LastSold",
      "importServerName" -> "localhost", "importDatabaseName" -> "db",
      "importDatetimeFields" -> "LastSold")
    val c = ImportConfig(main, per, "stock")
    assert(c.fieldNames.contains(Seq("ItemId", "ItemName", "LastSold")))
    assert(c.datetimeFields == Seq("LastSold"))
    assert(c.csvPath.toString == "/tmp/in/stock.csv")
    val all = ImportConfig(main, per.updated("importFieldNames", "All"), "s")
    assert(all.fieldNames.isEmpty)
  }

  test("missing required key raises ConfigError") {
    val e = intercept[ConfigError] {
      ImportConfig(Map.empty, Map.empty, "x")
    }
    assert(e.severity == NotFatal)
  }

  test("SearchConfig splices IN-list keys into the query placeholder") {
    val c = SearchConfig(Map(
      "serverName" -> "s", "databaseName" -> "d",
      "query" -> "SELECT * FROM docs WHERE invnum IN ('INVOICE_NUMBERS')",
      "invoiceCsvPath" -> "/tmp/inv.csv", "docStoreRoot" -> "/tmp/store",
      "destinationFolder" -> "/tmp/dest"))
    assert(c.queryWithKeys(Seq("A", "B")) ==
      "SELECT * FROM docs WHERE invnum IN ('A','B')")
  }
}
