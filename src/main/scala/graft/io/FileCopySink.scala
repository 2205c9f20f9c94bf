package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K7 filesystem copy sink (SURVEY.md §2.2,
  * /root/reference/InvoiceFileSearchFromSQL.ps1:97-114): copy each found
  * document to the destination under `"<invnum> - <customerRef> - <fileName>"`,
  * skipping existing targets (idempotent re-runs).
  *
  * Distributed via `mapPartitions` so a 100 TB-scale document manifest copies
  * from every executor in parallel against a shared filesystem; the result is
  * an auditable DataFrame (one status row per attempted copy) feeding the A2
  * reconciliation report rather than a driver-side counter.
  */
object FileCopySink {

  /** Input columns: invnum, sub_folder, file_name, customer_ref (pre-scrubbed
    * via RefFunctions.scrubRef). Output: invnum, target_name, copied, detail.
    */
  def copyDocuments(docs: DataFrame, storeRoot: String, destDir: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(destDir))
    val cols = Seq("invnum", "sub_folder", "file_name", "customer_ref")
    val projected = docs.select(cols.map(col): _*)
    projected.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val Seq(inv, sub, name, ref) =
          (0 to 3).map(i => Option(r.getString(i)).getOrElse(""))
        val targetName = s"$inv - $ref - $name"
        val source = Paths.get(storeRoot, sub, name)
        val target = Paths.get(destDir, targetName)
        if (!Files.exists(source))
          (inv, targetName, false, "source missing")
        else if (Files.exists(target))
          (inv, targetName, false, "target exists")
        else
          try {
            Files.copy(source, target, StandardCopyOption.COPY_ATTRIBUTES)
            (inv, targetName, true, "copied")
          } catch {
            case e: Exception => (inv, targetName, false, s"error: ${e.getMessage}")
          }
      }
    }.toDF("invnum", "target_name", "copied", "detail")
  }
}
