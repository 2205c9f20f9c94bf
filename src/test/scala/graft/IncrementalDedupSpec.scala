package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{IncrementalDedup, Tables}

/** Drives the persisted fingerprint store across two consecutive ingest
  * batches — the cross-run semantics a single-batch dedup can't test.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("two consecutive batches: store absorbs batch 1, re-run emits nothing") {
    val store = Files.createTempDirectory("graft-fpstore-spec")
      .resolve("store").toString
    val fp = IncrementalDedup
      .prefixFingerprints(Tables(spark, dir, "documents"), 50).cache()
    try testBody(store, fp) finally fp.unpersist() // shared session: don't
    // leave cached relations for CacheHygieneSpec's isEmpty assertion
  }

  private def testBody(store: String, fp: org.apache.spark.sql.DataFrame): Unit = {
    val ids = fp.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val batch1 = fp.filter(col("doc_id") < cut)
    val batch2 = fp.filter(col("doc_id") >= cut)

    // run 1 against the absent store: every batch-1 row is novel
    val novel1 = IncrementalDedup.novel(batch1, IncrementalDedup.readStore(spark, store))
    assert(novel1.count() == batch1.count())
    IncrementalDedup.append(novel1, store)

    // run 2: novel = batch-2 rows whose fingerprint was not in batch 1
    val novel2 = IncrementalDedup.novel(batch2, IncrementalDedup.readStore(spark, store))
      .collect().map(r => r.getLong(r.fieldIndex("doc_id"))).toSet
    val fps1 = batch1.select("fingerprint").collect().map(_.getString(0)).toSet
    val expected2 = batch2.collect()
      .filter(r => !fps1.contains(r.getString(r.fieldIndex("fingerprint"))))
      .map(_.getLong(0)).toSet
    assert(novel2 == expected2)
    assert(novel2.size < ids.length - ids.length / 2,
      "corpus has cross-batch duplicates; batch 2 should not be all-novel")

    // append batch 2 and re-run it: nothing is novel anymore
    IncrementalDedup.append(
      IncrementalDedup.novel(batch2, IncrementalDedup.readStore(spark, store)), store)
    assert(IncrementalDedup.novel(batch2,
      IncrementalDedup.readStore(spark, store)).count() == 0)
  }

  test("dedupIncremental construction is pure: build + plan cause no store writes") {
    // a distinct dir string → a distinct per-dir store path no other test
    // has seeded (same underlying data, different hashCode)
    val aliasDir = s"$dir/."
    val storeDir = java.nio.file.Paths.get(IncrementalDedup.queryStorePath(aliasDir))
    val df = IncrementalDedup.dedupIncremental(spark, aliasDir)
    df.queryExecution.executedPlan // force full planning, as .explain() would
    assert(!Files.exists(storeDir),
      "building the dedup_incremental plan must not write the store (VERDICT r2 #5)")
    // unseeded store reads as empty: every odd doc is novel
    val odd = IncrementalDedup.prefixFingerprints(
      Tables(spark, dir, "documents"), 50).filter(col("doc_id") % 2 === 1).count()
    assert(df.count() == odd)
    // seeding is what engages the cross-run semantics
    IncrementalDedup.seedQueryStore(spark, aliasDir)
    assert(IncrementalDedup.dedupIncremental(spark, aliasDir).count() < odd,
      "seeded store should absorb near-dup odd docs")
  }
}
