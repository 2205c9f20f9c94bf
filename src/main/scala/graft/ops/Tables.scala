package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access for queries/oracles (TESTDATA.md). Reads are plain
  * parquet scans so Catalyst pushes filters/projections into the scan.
  *
  * `events.ts` has shipped in two physical encodings across testdata
  * generations: parquet TIMESTAMP(NANOS) (no native Spark type —
  * [PARQUET_TYPE_ILLEGAL] — read as long via the legacy conf and truncated
  * to micros), and plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both
  * normalize to the same session-TZ TimestampType column, so every query
  * and DuckDB oracle (which `CAST(ts AS TIMESTAMP)`s, ns or µs alike) sees
  * identical values regardless of generation. Verify/Bench pin the session
  * time zone to UTC, making the NTZ→TZ cast value-preserving.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integral `div`, NOT `/`: epoch-nanos exceed 2^53, so double
          // division would round at ~256 ns before truncating — enough to
          // flip a value across a second boundary vs DuckDB's exact math
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
