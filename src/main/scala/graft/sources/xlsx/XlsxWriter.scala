package graft.sources.xlsx

import java.nio.charset.StandardCharsets
import java.nio.file.Path
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Builds minimal valid xlsx workbooks with java.util.zip — no POI in the
  * offline image, so both the DSv2 tests (FIXTURES.md §B8) and any fixture
  * generation go through this writer. Write-side scope is deliberately
  * minimal (sharedStrings + inline/boolean/numeric cells + one date style
  * for reader coverage): the reference never writes Excel, only reads it.
  */
object XlsxWriter {

  /** sheets: (name, rows); each row: cell values by 0-based column (None →
    * cell omitted entirely). Strings go through sharedStrings (t="s") except
    * those starting with "inline:" (inlineStr) or parsing as numbers (kept
    * as native numeric cells); "TRUE"/"FALSE" become boolean cells; a
    * "date:SERIAL" prefix writes a numeric cell styled with builtin date
    * format 14 (style id 1 in the emitted styles.xml) — reader coverage for
    * the Import-Excel styled-date materialization.
    * `omitRowNumbers` drops the OPTIONAL r attribute from row elements
    * (some real producers do) — reader regression coverage.
    */
  def write(target: Path, sheets: Seq[(String, Seq[Seq[Option[String]]])],
      omitRowNumbers: Boolean = false): Unit = {
    val sharedIdx = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sharedId(s: String): Int =
      sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    def cellXml(rowNum: Int, c: Int, v: String): String = {
      val ref = s"${colLetters(c)}$rowNum"
      if (v == "TRUE" || v == "FALSE")
        s"""<c r="$ref" t="b"><v>${if (v == "TRUE") 1 else 0}</v></c>"""
      else if (v.startsWith("date:"))
        s"""<c r="$ref" s="1"><v>${v.stripPrefix("date:")}</v></c>"""
      else if (v.startsWith("inline:"))
        s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(v.stripPrefix("inline:"))}</t></is></c>"""
      else if (v.nonEmpty && v.forall(ch => ch.isDigit || ch == '.' || ch == '-'))
        s"""<c r="$ref"><v>$v</v></c>"""
      else
        s"""<c r="$ref" t="s"><v>${sharedId(v)}</v></c>"""
    }

    val sheetXmls = sheets.map { case (_, rows) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, i) =>
        val rn = i + 1
        val cellsXml = cells.zipWithIndex.collect {
          case (Some(v), c) => cellXml(rn, c, v)
        }.mkString
        if (omitRowNumbers) s"""<row>$cellsXml</row>"""
        else s"""<row r="$rn">$cellsXml</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""".stripMargin
    }

    val workbookXml = {
      val entries = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$entries</sheets></workbook>""".stripMargin
    }
    val relsXml = {
      val entries = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$entries</Relationships>""".stripMargin
    }
    val sharedXml = {
      val items = sharedIdx.keys.map { s =>
        if (s.startsWith("rich:")) { // rich-text run test case
          val parts = s.stripPrefix("rich:").split('|')
          "<si>" + parts.map(p => s"<r><t>${xmlEscape(p)}</t></r>").mkString + "</si>"
        } else s"<si><t>${xmlEscape(s)}</t></si>"
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedIdx.size}" uniqueCount="${sharedIdx.size}">$items</sst>""".stripMargin
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""".stripMargin

    val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(target))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(StandardCharsets.UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", relsXml)
      put("xl/sharedStrings.xml", sharedXml)
      // style 0 = general, style 1 = builtin date format 14 (m/d/yyyy)
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>""".stripMargin)
      sheetXmls.zipWithIndex.foreach { case (xml, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", xml)
      }
    } finally zos.close()
  }

  def colLetters(c: Int): String = {
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
