package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of every SparkEntry query — the
  * .explain("formatted") review loop the 100 TB posture demands: check
  * PushedFilters/ReadSchema on scans, broadcast vs shuffle joins, and
  * WholeStageCodegen coverage.
  *
  *   sbt 'runMain graft.tools.ExplainAudit /root/testdata/sf0.01 [queryName]'
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n===== $name =====")
        try println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Exception => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
