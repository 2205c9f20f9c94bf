package graft.sources.xlsx

import java.nio.file.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.SheetSource

/** Production SheetSource for ExportPipeline backed by the xlsx DSv2
  * (S1/S2, /root/reference/ExcelToCSVexport.ps1:171,192).
  */
class XlsxSheetSource extends SheetSource {
  override def sheetNames(workbook: Path): Seq[String] =
    XlsxParser.sheetNames(workbook.toString)

  override def readSheet(spark: SparkSession, workbook: Path, sheet: String,
      headerRow: Int): DataFrame =
    spark.read.format("xlsx")
      .option("sheet", sheet)
      .option("headerRow", headerRow.toString)
      .load(workbook.toString)
}
