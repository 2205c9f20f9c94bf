package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed row-level reject channel (SURVEY.md §2.2 K6 at scale).
  *
  * The reference skips-and-logs bad rows one at a time
  * (/root/reference/CSVtoSQLimport.ps1:242-251); the Spark-native shape is a
  * validation predicate splitting the frame into (good, bad) and appending
  * bad rows — with provenance — to an append-only parquet sink. Driver-level
  * scalar events go through [[ErrorLog]] instead.
  */
object ErrorSink {

  /** Split `df` by `valid`; append rejects (as JSON payload + reason) to
    * `errorPath` and return only the good rows.
    */
  def routeRejects(df: DataFrame, valid: org.apache.spark.sql.Column,
      reason: String, source: String, errorPath: String): DataFrame = {
    val flagged = df.withColumn("__valid", valid)
    val bad = flagged.filter(!coalesce(col("__valid"), lit(false)))
    bad.select(
        current_timestamp().as("ts"),
        lit(source).as("source"),
        lit("NotFatal").as("level"),
        lit(reason).as("reason"),
        to_json(struct(df.columns.map(col): _*)).as("row_json"))
      .write.mode("append").parquet(errorPath)
    flagged.filter(coalesce(col("__valid"), lit(false))).drop("__valid")
  }

  def read(spark: SparkSession, errorPath: String): DataFrame =
    spark.read.parquet(errorPath)
}
