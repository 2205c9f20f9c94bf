package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
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
    val store = root.resolve("store").toString
    val out = root.resolve("out").toString

    // run 1: an in-batch duplicate (docs 1 and 3 share content)
    drop(in, Seq(1L -> "aaa bbb", 2L -> "ccc ddd", 3L -> "aaa  bbb"))
    StreamingDedup.runAvailableNow(spark, schema, in.toString, store, out,
      root.resolve("ckpt1").toString)
    val out1 = spark.read.parquet(out).collect()
    assert(out1.length == 2, "in-batch duplicate not collapsed")

    // run 2 with a FRESH checkpoint: every file re-reads, plus one old-content
    // re-ingest (doc 4) and one novel doc (doc 5). Stream state is gone; only
    // the persisted store can suppress the re-reads.
    drop(in, Seq(4L -> "ccc ddd", 5L -> "eee fff"))
    StreamingDedup.runAvailableNow(spark, schema, in.toString, store, out,
      root.resolve("ckpt2").toString)
    val out2 = spark.read.parquet(out)
      .select("doc_id", "fingerprint").collect()
    assert(out2.length == 3, s"expected exactly one novel row from run 2, got ${out2.length - 2}")
    assert(out2.map(_.getString(1)).distinct.length == 3,
      "duplicate fingerprint emitted across runs")
    assert(out2.map(_.getLong(0)).contains(5L), "novel doc 5 missing")

    // run 3: nothing new → nothing emitted
    StreamingDedup.runAvailableNow(spark, schema, in.toString, store, out,
      root.resolve("ckpt3").toString)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("empty first batch writes schema'd output but no store partition") {
    val root = Files.createTempDirectory("graft-sdedup-empty")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    val out = root.resolve("out").toString
    import spark.implicits._
    // pre-seed the store through the batch path (its novel rows land in a
    // scratch outDir — only the store matters here)
    StreamingDedup.backfill(spark,
      Seq(1L -> "aaa bbb").toDF("doc_id", "text"),
      store, root.resolve("seed-out").toString)
    def storeParts() = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).sorted.toSeq
    val before = storeParts()
    assert(before.size == 1 && before.head.startsWith("batch=backfill-"))

    // the run's only batch dedups to nothing against the seeded store
    drop(in, Seq(2L -> "aaa  bbb"))
    StreamingDedup.runAvailableNow(spark, schema, in.toString, store, out,
      root.resolve("ckpt").toString)
    // output contract: outDir exists as a schema'd, empty parquet dataset
    assert(spark.read.parquet(out).count() == 0,
      "empty first batch should still establish the output dataset")
    // store contract (ADVICE r3): no stray empty batch=<tag> partition
    assert(storeParts() == before,
      s"empty batch must not grow the store, got ${storeParts()}")
  }

  private val tsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def dropTs(dir: Path, rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, t, ts) => (id, t, Timestamp.valueOf(ts)) }
      .toDF("doc_id", "text", "ts").coalesce(1)
      .write.mode("append").parquet(dir.toString)
  }

  test("always-on variant: watermark-bounded state dedups across two triggers") {
    val root = Files.createTempDirectory("graft-sdedup-on")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    val out = root.resolve("out").toString

    dropTs(in, Seq(
      (1L, "aaa bbb", "2026-01-01 10:00:00"),
      (2L, "ccc ddd", "2026-01-01 10:00:05"),
      (3L, "aaa  bbb", "2026-01-01 10:00:10"))) // in-stream dup of doc 1
    val q = StreamingDedup.startAlwaysOn(spark, tsSchema, in.toString, store,
      out, root.resolve("ckpt").toString, eventTimeCol = "ts",
      delay = "10 minutes", interval = "1 second")
    try {
      q.processAllAvailable() // trigger 1
      assert(spark.read.parquet(out).count() == 2,
        "in-stream duplicate not collapsed by dropDuplicatesWithinWatermark")

      // trigger 2, while the query stays resident: one within-watermark dup
      // (doc 4, state catches it) and one novel doc
      dropTs(in, Seq(
        (4L, "ccc ddd", "2026-01-01 10:01:00"),
        (5L, "eee fff", "2026-01-01 10:01:05")))
      q.processAllAvailable()
      val rows = spark.read.parquet(out).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(rows == Set(1L, 2L, 5L) || rows == Set(3L, 2L, 5L),
        s"expected novel docs only, got $rows")
      assert(q.isActive, "always-on query should stay resident between triggers")
    } finally q.stop()

    // state loss: a fresh checkpoint re-reads everything; with event times
    // far past the watermark the STATE can't suppress — the store does
    dropTs(in, Seq((6L, "aaa bbb", "2026-01-01 11:00:00")))
    val q2 = StreamingDedup.startAlwaysOn(spark, tsSchema, in.toString, store,
      out, root.resolve("ckpt2").toString, eventTimeCol = "ts",
      delay = "10 minutes", interval = "1 second")
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 3,
        "store failed to suppress re-ingest after state loss")
    } finally q2.stop()

    // housekeeping: fold the per-batch store partitions into one, then
    // prove suppression still works from the compacted store
    StreamingDedup.compactStore(spark, store)
    val parts = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(parts.length == 1 && parts.head.getName.startsWith("batch=compacted-"),
      s"expected a single compacted partition, got ${parts.map(_.getName).toSeq}")
    dropTs(in, Seq((7L, "eee fff", "2026-01-01 12:00:00")))
    val q3 = StreamingDedup.startAlwaysOn(spark, tsSchema, in.toString, store,
      out, root.resolve("ckpt3").toString, eventTimeCol = "ts",
      delay = "10 minutes", interval = "1 second")
    try {
      q3.processAllAvailable()
      assert(spark.read.parquet(out).count() == 3,
        "compacted store failed to suppress a known fingerprint")
    } finally q3.stop()

    // backfill (the documented too-late-for-the-watermark path): one known
    // and one novel doc through the batch path against the SAME store
    import spark.implicits._
    StreamingDedup.backfill(spark,
      Seq(8L -> "aaa bbb", 9L -> "ggg hhh").toDF("doc_id", "text"),
      store, out)
    val afterBackfill = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(afterBackfill.contains(9L) && !afterBackfill.contains(8L),
      s"backfill should add only the novel doc, got $afterBackfill")
    // and the streaming query still reads the store (now with a backfill
    // partition) cleanly, suppressing a re-ingest of the backfilled content
    dropTs(in, Seq((10L, "ggg  hhh", "2026-01-01 13:00:00")))
    val q4 = StreamingDedup.startAlwaysOn(spark, tsSchema, in.toString, store,
      out, root.resolve("ckpt4").toString, eventTimeCol = "ts",
      delay = "10 minutes", interval = "1 second")
    try {
      q4.processAllAvailable()
      assert(spark.read.parquet(out).count() == 4,
        "store with backfill partition failed to suppress re-ingest")
    } finally q4.stop()
  }

  test("embedding dedup: drained stream emits exactly the batch dedup_embedding_lsh pairs, chop-independent; re-drain emits nothing") {
    import graft.streaming.StreamingEmbeddingDedup
    val dir = "/root/testdata/sf0.001"
    val expected = graft.ops.DedupOps.dedupEmbeddingLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "fixture has no embedding near-dups — vacuous")

    val root = Files.createTempDirectory("graft-sembdedup")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    val out = root.resolve("out").toString
    // chop the corpus into three arbitrary arrival files — the pin below
    // holds for ANY chop (a pair is emitted where its later endpoint
    // arrives; exact verify makes the value endpoint-pure)
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    val embSchema = emb.schema
    for (pred <- Seq("vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"))
      emb.filter(pred).coalesce(1).write.mode("append").parquet(in.toString)
    StreamingEmbeddingDedup.runAvailableNow(spark, embSchema, in.toString,
      store, out, root.resolve("ckpt1").toString)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"drained ≠ batch: missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")

    // fresh checkpoint re-drain: every file re-reads, the store's identity
    // novelty must suppress ALL of it — no pair re-emitted
    StreamingEmbeddingDedup.runAvailableNow(spark, embSchema, in.toString,
      store, out, root.resolve("ckpt2").toString)
    val after = spark.read.parquet(out).count()
    assert(after == expected.size.toLong,
      s"re-drain re-emitted pairs: $after rows vs ${expected.size}")
  }
}
