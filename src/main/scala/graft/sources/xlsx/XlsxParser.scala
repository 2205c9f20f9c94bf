package graft.sources.xlsx

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Minimal xlsx (OOXML spreadsheet) reading with JDK-only pieces —
  * `java.util.zip` + StAX — because no POI/spark-excel jar ships in the
  * offline image (SURVEY.md §7.3). Scope mirrors what the reference's
  * `Import-Excel` consumes (/root/reference/ExcelToCSVexport.ps1:171,192):
  * sheet names, shared strings, cached cell values `<v>` (formulas are
  * never evaluated; the reference reads cached values likewise), and —
  * as of r8 — DATE-STYLED numeric cells: `Import-Excel` materializes
  * date-formatted cells as DateTime values, so cells whose style resolves
  * to a date number format render as `yyyy-MM-dd HH:mm:ss` strings using
  * the REAL Excel epoch (1899-12-30, .NET `FromOADate` semantics — what
  * Import-Excel produces), while unstyled serials stay numeric strings
  * feeding the F-D1 conversion exactly as the reference's CSV flow does.
  * (F-D1 itself keeps the reference's hard-coded 1900-01-01 epoch —
  * SURVEY §7.6.1 documents that deliberate 2-day divergence; this path
  * mirrors Import-Excel, not CSVtoSQLimport.)
  */
object XlsxParser {

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // untrusted input: no DTDs / external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** S2 sheet-metadata enumeration: sheet names in workbook order, resolved
    * to their worksheet zip entries via the workbook relationships part.
    */
  def sheets(path: String): Seq[(String, String)] = withZip(path) { zip =>
    val rels = relationships(zip)
    val xml = reader(zip, "xl/workbook.xml")
    try {
      val out = mutable.ArrayBuffer[(String, String)]()
      while (xml.hasNext) {
        if (xml.next() == XMLStreamConstants.START_ELEMENT &&
            xml.getLocalName == "sheet") {
          val name = attr(xml, "name").getOrElse("")
          val rid = attr(xml, "id").getOrElse("") // r:id namespace-local name
          rels.get(rid).foreach { target =>
            val entry =
              if (target.startsWith("/")) target.drop(1)
              else "xl/" + target
            out += name -> entry
          }
        }
      }
      out.toSeq
    } finally xml.close()
  }

  def sheetNames(path: String): Seq[String] = sheets(path).map(_._1)

  private def relationships(zip: ZipFile): Map[String, String] = {
    val entry = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (entry == null) return Map.empty
    val xml = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      val out = mutable.Map[String, String]()
      while (xml.hasNext) {
        if (xml.next() == XMLStreamConstants.START_ELEMENT &&
            xml.getLocalName == "Relationship") {
          for (id <- attr(xml, "Id"); target <- attr(xml, "Target"))
            out += id -> target
        }
      }
      out.toMap
    } finally xml.close()
  }

  /** Shared-string table; `<si>` items may be plain `<t>` or rich-text runs
    * `<r><t>` — runs are concatenated.
    */
  def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val xml = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      val out = mutable.ArrayBuffer[String]()
      var current: StringBuilder = null
      var inT = false
      while (xml.hasNext) {
        xml.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            xml.getLocalName match {
              case "si" => current = new StringBuilder
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT && current != null =>
            current.append(xml.getText)
          case XMLStreamConstants.END_ELEMENT =>
            xml.getLocalName match {
              case "si" => out += current.toString; current = null
              case "t" => inT = false
              case _ =>
            }
          case _ =>
        }
      }
      out.toIndexedSeq
    } finally xml.close()
  }

  /** Style ids (cellXfs positions) whose number format is a DATE format:
    * builtin ids 14–22/45–47 or a custom format code containing a
    * date/time token after literal sections (`[...]`, `"..."`, `\x`) are
    * stripped — the standard spreadsheet-reader heuristic (POI uses the
    * same shape). Missing styles.xml → empty set (no date rendering).
    */
  def dateStyles(zip: ZipFile): Set[Int] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return Set.empty
    val xml = factory.createXMLStreamReader(zip.getInputStream(entry))
    try {
      val customDate = mutable.Set[Int]()
      val xfFmts = mutable.ArrayBuffer[Int]()
      var inCellXfs = false
      while (xml.hasNext) {
        xml.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            xml.getLocalName match {
              case "numFmt" =>
                for (id <- attr(xml, "numFmtId"); code <- attr(xml, "formatCode")) {
                  val stripped = code
                    .replaceAll("\\[[^\\]]*\\]", "")
                    .replaceAll("\"[^\"]*\"", "")
                    .replaceAll("\\\\.", "")
                  if (stripped.exists(ch => "ymdhYMDH".indexOf(ch) >= 0))
                    customDate += id.toInt
                }
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                xfFmts += attr(xml, "numFmtId").map(_.toInt).getOrElse(0)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT if xml.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
      }
      def isDate(fmt: Int): Boolean =
        (fmt >= 14 && fmt <= 22) || (fmt >= 45 && fmt <= 47) ||
          customDate.contains(fmt)
      xfFmts.zipWithIndex.collect { case (fmt, i) if isDate(fmt) => i }.toSet
    } finally xml.close()
  }

  /** Excel serial → `yyyy-MM-dd HH:mm:ss` via the REAL Excel epoch
    * (1899-12-30; .NET `DateTime.FromOADate`, which Import-Excel returns,
    * rounds to the nearest millisecond). Out-of-range/unparseable → None
    * (caller keeps the raw string, like Import-Excel surfacing the error
    * value verbatim).
    */
  private val dtFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")
  def excelSerialToDateTime(raw: String): Option[String] =
    raw.trim.toDoubleOption
      .filter(v => v >= 0 && v < 2958466) // < 10000-01-01
      .map { v =>
        val millis = math.round(v * 86400000.0)
        java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
          .plus(millis, java.time.temporal.ChronoUnit.MILLIS)
          .format(dtFmt)
      }

  /** One parsed sheet row: 1-based row number + cells by 0-based column. */
  final case class SheetRow(rowNum: Long, cells: Map[Int, String])

  /** Streams rows of one worksheet entry. All values are strings (§1.2
    * universal cell type): shared strings resolved, booleans as TRUE/FALSE,
    * numerics as their raw `<v>` text — except numeric cells whose style is
    * in `dateStyleIds`, which render as `yyyy-MM-dd HH:mm:ss` (the
    * Import-Excel DateTime materialization; see the object scaladoc).
    */
  def rows(zip: ZipFile, sheetEntry: String, shared: IndexedSeq[String],
      dateStyleIds: Set[Int] = Set.empty): Iterator[SheetRow] = {
    val entry = zip.getEntry(sheetEntry)
    require(entry != null, s"worksheet entry not found: $sheetEntry")
    val xml = factory.createXMLStreamReader(zip.getInputStream(entry))
    new Iterator[SheetRow] {
      private var nextRow: SheetRow = null
      private var done = false
      // persists across advance() calls: the r attribute is OPTIONAL in
      // OOXML — rows lacking it continue from the previous row's number
      private var lastRowNum = 0L

      private def advance(): Unit = {
        var rowNum = -1L
        var cells: mutable.Map[Int, String] = null
        var cellCol = -1
        var cellType = "n"
        var cellDateStyled = false
        var text: StringBuilder = null
        var capture = false
        var implicitCol = 0
        while (nextRow == null && !done) {
          if (!xml.hasNext) { done = true; xml.close() }
          else xml.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              xml.getLocalName match {
                case "row" =>
                  rowNum = attr(xml, "r").map(_.toLong).getOrElse(lastRowNum + 1)
                  lastRowNum = rowNum
                  cells = mutable.Map[Int, String]()
                  implicitCol = 0
                case "c" if cells != null =>
                  cellCol = attr(xml, "r").map(colIndex).getOrElse(implicitCol)
                  implicitCol = cellCol + 1
                  cellType = attr(xml, "t").getOrElse("n")
                  cellDateStyled = dateStyleIds.nonEmpty &&
                    attr(xml, "s").exists(s2 => dateStyleIds.contains(s2.toInt))
                case "v" | "t" if cells != null =>
                  text = new StringBuilder; capture = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if capture =>
              text.append(xml.getText)
            case XMLStreamConstants.END_ELEMENT =>
              xml.getLocalName match {
                case "v" | "t" if capture =>
                  capture = false
                  if (cellCol >= 0) {
                    val raw = text.toString

                    val value = cellType match {
                      case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                      case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
                      case "n" if cellDateStyled =>
                        excelSerialToDateTime(raw).getOrElse(raw)
                      case _ => raw // n, str, inlineStr's t handled here too
                    }
                    cells(cellCol) = value
                  }
                case "c" => cellCol = -1
                case "row" if cells != null =>
                  nextRow = SheetRow(rowNum, cells.toMap)
                case _ =>
              }
            case XMLStreamConstants.END_DOCUMENT =>
              done = true; xml.close()
            case _ =>
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextRow == null && !done) advance()
        nextRow != null
      }
      override def next(): SheetRow = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** `"BC12"` → 0-based column 54: letters are base-26 digits. */
  def colIndex(cellRef: String): Int = {
    var acc = 0
    var i = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Header names + data-row iterator for a named sheet, header at the
    * 1-based `headerRow` (Import-Excel -StartRow semantics: header AT the
    * start row, data after). Empty header cells get positional `_cN` names.
    * NOTE: materializes nothing — callers stream; `use` owns the zip handle.
    */
  def withSheet[T](path: String, sheetName: String, headerRow: Int)(
      use: (Seq[String], Iterator[SheetRow]) => T): T = withZip(path) { zip =>
    val entry = sheets(path).collectFirst {
      case (n, e) if n == sheetName => e
    }.getOrElse(throw new IllegalArgumentException(
      s"sheet '$sheetName' not found in $path (have: ${sheetNames(path).mkString(", ")})"))
    val shared = sharedStrings(zip)
    val all = rows(zip, entry, shared, dateStyles(zip))
    val headerCells = all.find(_.rowNum == headerRow.toLong)
      .map(_.cells).getOrElse(Map.empty)
    // `all` already consumed up to and including the header row
    use(headerNames(headerCells), all.filter(_.rowNum > headerRow.toLong))
  }

  /** Positional names for a header row: literal cell text where present,
    * `_cN` for blanks. A generated name that collides with a literal header
    * (a column actually NAMED `_c1`) or an earlier generated name gets `_`
    * appended until unique — both the schema-inference side and the
    * per-file reader derive names through here, so they can never disagree.
    */
  def headerNames(headerCells: Map[Int, String]): Seq[String] = {
    val width = if (headerCells.isEmpty) 0 else headerCells.keys.max + 1
    val literals = headerCells.values.filter(_.nonEmpty).toSet
    val used = scala.collection.mutable.Set[String]()
    (0 until width).map { i =>
      val name = headerCells.get(i).filter(_.nonEmpty).getOrElse {
        var c = s"_c$i"
        while (literals.contains(c) || used.contains(c)) c += "_"
        c
      }
      used += name
      name
    }
  }

  private def attr(xml: XMLStreamReader, localName: String): Option[String] = {
    var i = 0
    while (i < xml.getAttributeCount) {
      if (xml.getAttributeLocalName(i) == localName)
        return Some(xml.getAttributeValue(i))
      i += 1
    }
    None
  }

  private def withZip[T](path: String)(f: ZipFile => T): T = {
    val zip = new ZipFile(path)
    try f(zip) finally zip.close()
  }

  private def reader(zip: ZipFile, name: String): XMLStreamReader = {
    val entry = zip.getEntry(name)
    require(entry != null, s"zip entry not found: $name")
    factory.createXMLStreamReader(zip.getInputStream(entry))
  }
}
