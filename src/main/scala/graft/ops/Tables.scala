package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access for queries/oracles (TESTDATA.md). Reads are plain
  * parquet scans so Catalyst pushes filters/projections into the scan.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native type
  * for ([PARQUET_TYPE_ILLEGAL]); we read nanos as long via the legacy conf
  * and truncate to a micros TimestampType column — the same truncation
  * DuckDB-side oracles apply when they format to seconds.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integral `div`, NOT `/`: epoch-nanos exceed 2^53, so double division
      // would round at ~256 ns before truncating — enough to flip a value
      // across a second boundary vs DuckDB's exact arithmetic
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
