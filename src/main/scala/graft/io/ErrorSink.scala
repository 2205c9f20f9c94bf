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

  /** Split `df` by `valid` into (good rows, rejects-with-provenance) —
    * pure, NO side effects: the reject write must happen after the main
    * sink commits (see ImportPipeline.runOne), otherwise a failed-then-
    * retried batch appends its rejects twice.
    */
  def split(df: DataFrame, valid: org.apache.spark.sql.Column,
      reason: String, source: String): (DataFrame, DataFrame) = {
    val flagged = df.withColumn("__valid", valid)
    val bad = flagged.filter(!coalesce(col("__valid"), lit(false)))
      .select(
        current_timestamp().as("ts"),
        lit(source).as("source"),
        lit("NotFatal").as("level"),
        lit(reason).as("reason"),
        to_json(struct(df.columns.map(col): _*)).as("row_json"))
    val good = flagged.filter(coalesce(col("__valid"), lit(false))).drop("__valid")
    (good, bad)
  }

  /** Post-commit append of the reject frame. */
  def append(bad: DataFrame, errorPath: String): Unit =
    bad.write.mode("append").parquet(errorPath)

  def read(spark: SparkSession, errorPath: String): DataFrame =
    spark.read.parquet(errorPath)
}
