package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The at-scale output path (README: single-file CSV is reference fidelity,
  * partitioned parquet is the real design): hive-style partition directories
  * so downstream readers prune partitions at the scan.
  */
object PartitionedSink {

  /** Write `df` partitioned by a derived day column from `tsCol`. */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
