package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def drop(dir: Path, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)
  }

  test("file drops dedup within stream and across runs via the store") {
    val root = Files.createTempDirectory("graft-sdedup")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store"); val out = root.resolve("out")

    // run 1: an in-batch duplicate (docs 1 and 3 share content)
    drop(in, Seq(1L -> "aaa bbb", 2L -> "ccc ddd", 3L -> "aaa  bbb"))
    StreamingDedup.runAvailableNow(spark, schema, in, store, out,
      root.resolve("ckpt1"))
    val out1 = spark.read.parquet(out.toString).collect()
    assert(out1.length == 2, "in-batch duplicate not collapsed")

    // run 2 with a FRESH checkpoint: every file re-reads, plus one old-content
    // re-ingest (doc 4) and one novel doc (doc 5). Stream state is gone; only
    // the persisted store can suppress the re-reads.
    drop(in, Seq(4L -> "ccc ddd", 5L -> "eee fff"))
    StreamingDedup.runAvailableNow(spark, schema, in, store, out,
      root.resolve("ckpt2"))
    val out2 = spark.read.parquet(out.toString)
      .select("doc_id", "fingerprint").collect()
    assert(out2.length == 3, s"expected exactly one novel row from run 2, got ${out2.length - 2}")
    assert(out2.map(_.getString(1)).distinct.length == 3,
      "duplicate fingerprint emitted across runs")
    assert(out2.map(_.getLong(0)).contains(5L), "novel doc 5 missing")

    // run 3: nothing new → nothing emitted
    StreamingDedup.runAvailableNow(spark, schema, in, store, out,
      root.resolve("ckpt3"))
    assert(spark.read.parquet(out.toString).count() == 3)
  }
}
