package graft.sources.xlsx

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for `.xlsx` worksheets (SURVEY.md §7.3) — the one custom
  * physical component the reference surface needs (S1/S2; no POI offline).
  *
  *   spark.read.format("xlsx")
  *     .option("sheet", "Stock")     // default: first sheet
  *     .option("headerRow", "1")     // 1-based; header AT this row
  *     .load("/path/to/workbook.xlsx")
  *
  * Schema is the header row, all StringType — faithful to the reference's
  * all-string property-bag rows (§1.3). Supports column pruning
  * (SupportsPushDownRequiredColumns): pruned columns are never materialized
  * into Spark rows (the XML must still stream past them — xlsx is not
  * columnar).
  *
  * Parallelism model: one worksheet = one zip entry = one InputPartition
  * (DEFLATE streams aren't splittable). Scale comes from MANY workbooks:
  * `load()` with a glob/directory yields one partition per file. A 100 TB
  * estate of workbooks parallelizes per-file, which matches how such data
  * actually arrives (many small workbooks, not one huge one).
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = XlsxDataSource.resolvePaths(options)
    require(paths.nonEmpty, "xlsx source requires a path")
    val sheet = Option(options.get("sheet"))
    val headerRow = options.getInt("headerRow", 1)
    val first = paths.head
    val sheetName = sheet.getOrElse(XlsxParser.sheetNames(first).headOption
      .getOrElse(throw new IllegalArgumentException(s"no sheets in $first")))
    XlsxParser.withSheet(first, sheetName, headerRow) { (header, _) =>
      StructType(header.map(StructField(_, StringType, nullable = true)))
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new XlsxTable(schema, XlsxDataSource.resolvePaths(options),
      Option(options.get("sheet")), options.getInt("headerRow", 1))
  }
}

object XlsxDataSource {
  /** DataFrameReader passes a single `path` or a JSON `paths` array; a
    * directory path expands to its *.xlsx children (one partition each).
    */
  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw: Seq[String] = Option(options.get("paths")) match {
      case Some(json) =>
        // DataFrameReader serializes multi-path loads with Jackson; parse
        // symmetrically (a naive split(",") would break paths containing
        // commas or escaped quotes). jackson-databind ships with Spark.
        // A hand-set non-JSON value (.option("paths", "/a.xlsx")) would
        // otherwise surface as an opaque JsonParseException.
        try new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(json, classOf[Array[String]]).toSeq.filter(_.nonEmpty)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            throw new IllegalArgumentException(
              s"""xlsx option "paths" must be a JSON string array """ +
                s"""(e.g. ["/a.xlsx","/b.xlsx"]), got: $json — for a single """ +
                """file use .load(path) or .option("path", ...)""", e)
        }
      case None => Option(options.get("path")).toSeq
    }
    raw.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory)
        f.listFiles((_, n) => n.toLowerCase.endsWith(".xlsx"))
          .map(_.getPath).sorted.toSeq
      else Seq(p)
    }
  }
}

class XlsxTable(schema: StructType, paths: Seq[String], sheet: Option[String],
    headerRow: Int) extends Table with SupportsRead {
  override def name(): String =
    s"xlsx:${paths.mkString(",")}${sheet.fold("")("#" + _)}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(schema, paths, sheet, headerRow)
}

class XlsxScanBuilder(fullSchema: StructType, paths: Seq[String],
    sheet: Option[String], headerRow: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new XlsxScan(fullSchema, required, paths, sheet, headerRow)
}

class XlsxScan(fullSchema: StructType, required: StructType,
    paths: Seq[String], sheet: Option[String], headerRow: Int)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"XlsxScan(sheet=${sheet.getOrElse("<first>")}, headerRow=$headerRow, " +
      s"files=${paths.length}, columns=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => XlsxInputPartition(p, sheet, headerRow): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required.fieldNames)
}

case class XlsxInputPartition(path: String, sheet: Option[String],
    headerRow: Int) extends InputPartition

class XlsxReaderFactory(requiredCols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(p, requiredCols)
  }
}

/** Streams one worksheet. Holds the zip handle open across next() calls and
  * releases it in close() — PartitionReader's lifecycle guarantees close.
  */
class XlsxPartitionReader(p: XlsxInputPartition,
    requiredCols: Array[String]) extends PartitionReader[InternalRow] {

  private val zip = new java.util.zip.ZipFile(p.path)
  private val sheetName = p.sheet.getOrElse(
    XlsxParser.sheetNames(p.path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no sheets in ${p.path}")))
  private val entry = XlsxParser.sheets(p.path).collectFirst {
    case (n, e) if n == sheetName => e
  }.getOrElse(throw new IllegalArgumentException(
    s"sheet '$sheetName' not found in ${p.path}"))
  private val shared = XlsxParser.sharedStrings(zip)
  private val allRows =
    XlsxParser.rows(zip, entry, shared, XlsxParser.dateStyles(zip))
  // THIS file's header row maps required column NAMES to its own column
  // positions — files in a directory load may order columns differently,
  // and positional mapping from the schema-inference file would silently
  // misalign them. A column absent from this file's header reads as null.
  // Blank header cells get the same positional `_cN` names as inferSchema —
  // XlsxParser.headerNames is the single naming rule for both sides, so
  // blank-header data is read (not silently nulled) and a literal header
  // named `_cN` can't collide with a generated one.
  private val fileHeader: Map[String, Int] = {
    val headerCells = allRows.find(_.rowNum == p.headerRow.toLong)
      .map(_.cells).getOrElse(Map.empty)
    XlsxParser.headerNames(headerCells).zipWithIndex.toMap
  }
  private val colIdx: Array[Int] =
    requiredCols.map(c => fileHeader.getOrElse(c, -1))
  // `allRows` has been consumed through the header row by the find above
  private val rows = allRows.filter(_.rowNum > p.headerRow.toLong)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val r = rows.next()
      current = InternalRow.fromSeq(colIdx.map { i =>
        if (i < 0) null
        else r.cells.get(i).map(UTF8String.fromString).orNull
      }.toSeq)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = zip.close()
}
