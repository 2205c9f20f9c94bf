package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The store-rewrite protocol's crash-state matrix, pinned state by state.
  *
  * [[StoreUtil.rewriteInPlace]] swaps a store via write-`.tmp` →
  * rename-live-to-`.retired` → promote-`.tmp` → drop-`.retired`; the r15
  * code reviews found (and fixed) data-loss bugs in exactly this machinery
  * — an unconditional heal that could delete the only complete copy, a
  * read path that served an empty store mid-swap, and a promote TOCTOU.
  * Those fixes were each verified through their callers; this spec pins
  * the protocol DIRECTLY: every reachable crash state (which copies of
  * {live, .tmp-complete, .tmp-incomplete, .retired} exist) is constructed
  * on disk and the heal / read outcome asserted, so a future edit to the
  * state machine fails here, not in a streaming lifecycle suite three
  * layers up. The one unreachable-by-protocol state (live + retired + tmp,
  * only a quiesce violation produces it) must REFUSE, not guess.
  */
class StoreUtilSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private val schema = StructType.fromDDL("k BIGINT")

  private def fs(root: String) =
    new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def newRoot(): String =
    Files.createTempDirectory("graft-storeutil").toString

  /** Write a complete store (parquet committer `_SUCCESS` present). */
  private def writeStore(path: String, ks: Seq[Long]): Unit =
    spark.createDataFrame(
        spark.sparkContext.parallelize(ks.map(org.apache.spark.sql.Row(_)), 1),
        schema)
      .write.mode("overwrite").parquet(path)

  /** Degrade a complete store to a crashed half-write (no `_SUCCESS`). */
  private def dropSuccess(path: String): Unit =
    fs(path).delete(new HPath(path, "_SUCCESS"), false)

  private def readKs(path: String): Set[Long] =
    StoreUtil.readOrEmpty(spark, path, schema)
      .collect().map(_.getLong(0)).toSet

  private def exists(p: String): Boolean = fs(p).exists(new HPath(p))

  test("heal: live store alone is untouched") {
    val root = newRoot()
    writeStore(s"$root/s", Seq(1L, 2L))
    StoreUtil.healRewrite(spark, root, "s")
    assert(readKs(s"$root/s") == Set(1L, 2L))
  }

  test("heal: pre-swap crash (live + tmp) keeps the live store, drops tmp") {
    for (tmpComplete <- Seq(true, false)) {
      val root = newRoot()
      writeStore(s"$root/s", Seq(1L))
      writeStore(s"$root/s.tmp", Seq(9L))
      if (!tmpComplete) dropSuccess(s"$root/s.tmp")
      StoreUtil.healRewrite(spark, root, "s")
      assert(readKs(s"$root/s") == Set(1L))
      assert(!exists(s"$root/s.tmp"))
    }
  }

  test("heal: post-swap crash (live + retired) drops the retired copy") {
    val root = newRoot()
    writeStore(s"$root/s", Seq(9L))
    writeStore(s"$root/s.retired", Seq(1L))
    StoreUtil.healRewrite(spark, root, "s")
    assert(readKs(s"$root/s") == Set(9L))
    assert(!exists(s"$root/s.retired"))
  }

  test("heal: live + retired + tmp (quiesce violation) refuses to guess") {
    val root = newRoot()
    writeStore(s"$root/s", Seq(1L))
    writeStore(s"$root/s.retired", Seq(2L))
    writeStore(s"$root/s.tmp", Seq(3L))
    intercept[IllegalStateException] {
      StoreUtil.healRewrite(spark, root, "s")
    }
    // and nothing was deleted while ambiguous
    assert(exists(s"$root/s") && exists(s"$root/s.retired") &&
      exists(s"$root/s.tmp"))
  }

  test("heal: mid-swap crash (absent + complete tmp) promotes the tmp") {
    val root = newRoot()
    writeStore(s"$root/s.tmp", Seq(9L))
    StoreUtil.healRewrite(spark, root, "s")
    assert(readKs(s"$root/s") == Set(9L))
    assert(!exists(s"$root/s.tmp"))
  }

  test("heal: between the renames (complete tmp + retired) promotes tmp, drops retired") {
    val root = newRoot()
    writeStore(s"$root/s.tmp", Seq(9L))
    writeStore(s"$root/s.retired", Seq(1L))
    StoreUtil.healRewrite(spark, root, "s")
    assert(readKs(s"$root/s") == Set(9L))
    assert(!exists(s"$root/s.retired") && !exists(s"$root/s.tmp"))
  }

  test("heal: incomplete tmp + retired restores the retired original") {
    val root = newRoot()
    writeStore(s"$root/s.tmp", Seq(9L))
    dropSuccess(s"$root/s.tmp")
    writeStore(s"$root/s.retired", Seq(1L))
    StoreUtil.healRewrite(spark, root, "s")
    assert(readKs(s"$root/s") == Set(1L))
    assert(!exists(s"$root/s.tmp"))
  }

  test("heal: incomplete tmp alone is dropped; the store stays absent") {
    val root = newRoot()
    writeStore(s"$root/s.tmp", Seq(9L))
    dropSuccess(s"$root/s.tmp")
    StoreUtil.healRewrite(spark, root, "s")
    assert(!exists(s"$root/s") && !exists(s"$root/s.tmp"))
    assert(readKs(s"$root/s") == Set.empty[Long])
  }

  test("read-path promote: a complete tmp is served without an explicit heal") {
    val root = newRoot()
    writeStore(s"$root/s.tmp", Seq(7L, 8L))
    assert(readKs(s"$root/s") == Set(7L, 8L)) // readOrEmpty promoted it
    assert(exists(s"$root/s") && !exists(s"$root/s.tmp"))
  }

  test("read-path promote never serves or deletes an incomplete tmp") {
    val root = newRoot()
    writeStore(s"$root/s.tmp", Seq(7L))
    dropSuccess(s"$root/s.tmp")
    assert(readKs(s"$root/s") == Set.empty[Long])
    assert(exists(s"$root/s.tmp")) // promote never deletes; heal owns that
  }

  private val taggedSchema = StructType.fromDDL("k BIGINT, batch STRING")

  private def writePart(store: String, tag: String, ks: Seq[Long],
      committed: Boolean): Unit = {
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          ks.map(k => org.apache.spark.sql.Row(k, tag)), 1), taggedSchema)
      .select(col("k"))
      .write.mode("overwrite").parquet(s"$store/batch=$tag")
    if (!committed) dropSuccess(s"$store/batch=$tag")
  }

  private def readTagged(path: String): Set[(Long, String)] =
    StoreUtil.readCommitted(spark, path, taggedSchema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("readCommitted: a crashed half-written tag partition is not served") {
    val root = newRoot()
    writePart(s"$root/s", "a", Seq(1L, 2L), committed = true)
    writePart(s"$root/s", "b", Seq(3L), committed = false)
    assert(readTagged(s"$root/s") == Set((1L, "a"), (2L, "a")))
  }

  test("readCommitted: a promoted rewrite serves ALL its partitions (root marker stamps the children)") {
    val root = newRoot()
    // a rewrite's .tmp: one partitionBy-style job — root _SUCCESS, no
    // per-partition markers yet (the crash-mid-stamp state)
    writePart(s"$root/s.tmp", "a", Seq(1L), committed = false)
    writePart(s"$root/s.tmp", "b", Seq(2L), committed = false)
    fs(root).create(new HPath(s"$root/s.tmp/_SUCCESS"), true).close()
    val got = readTagged(s"$root/s") // read-path promote + stamp
    assert(got == Set((1L, "a"), (2L, "b")))
    assert(exists(s"$root/s") && !exists(s"$root/s.tmp"))
    // and the children are now individually stamped
    assert(exists(s"$root/s/batch=a/_SUCCESS") &&
      exists(s"$root/s/batch=b/_SUCCESS"))
  }

  test("rewriteInPlace (partitioned): result is fully committed-readable and crashed remnants are dropped") {
    val root = newRoot()
    writePart(s"$root/s", "a", Seq(1L, 2L), committed = true)
    writePart(s"$root/s", "b", Seq(3L), committed = false) // dead remnant
    StoreUtil.rewriteInPlace(spark, root, "s",
      StoreUtil.readCommitted(spark, s"$root/s", taggedSchema)
        .filter(col("k") =!= 2L),
      Seq("batch"))
    assert(readTagged(s"$root/s") == Set((1L, "a")))
    assert(!exists(s"$root/s/batch=b"), "remnant partition survived rewrite")
  }

  test("rewriteInPlace: replaces contents atomically and leaves no side copies") {
    val root = newRoot()
    writeStore(s"$root/s", Seq(1L, 2L, 3L))
    StoreUtil.rewriteInPlace(spark, root, "s",
      StoreUtil.readOrEmpty(spark, s"$root/s", schema)
        .filter(col("k") =!= 2L))
    assert(readKs(s"$root/s") == Set(1L, 3L))
    assert(!exists(s"$root/s.tmp") && !exists(s"$root/s.retired"))
  }

  test("compactStore: scrubs exactly the tombstoned keys from store and tombstones") {
    val root = newRoot()
    val storeSchema = StructType.fromDDL("vec_id BIGINT, x DOUBLE, batch STRING")
    // per-tag batch writes, exactly as the maintainers produce the store
    // (each partition dir carries its own committer marker)
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(1L, 1.0),
          org.apache.spark.sql.Row(2L, 2.0)), 1),
        StructType.fromDDL("vec_id BIGINT, x DOUBLE"))
      .write.mode("overwrite").parquet(s"$root/data/batch=t0")
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(3L, 3.0)), 1),
        StructType.fromDDL("vec_id BIGINT, x DOUBLE"))
      .write.mode("overwrite").parquet(s"$root/data/batch=t1")
    spark.sql("SELECT CAST(2 AS BIGINT) AS vec_id")
      .write.mode("overwrite").parquet(s"$root/tombstones")
    StoreUtil.compactStore(spark, root, "data", storeSchema, "vec_id")
    val kept = StoreUtil.readOrEmpty(spark, s"$root/data", storeSchema)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    val tombs = StoreUtil.readOrEmpty(spark, s"$root/tombstones",
      StructType.fromDDL("vec_id BIGINT")).count()
    assert(tombs == 0L)
  }

  test("lineageId: stable across calls, unique per checkpoint") {
    val a = Files.createTempDirectory("graft-lineage-a").toString
    val b = Files.createTempDirectory("graft-lineage-b").toString
    val id1 = StoreUtil.lineageId(spark, a, "marker")
    val id2 = StoreUtil.lineageId(spark, a, "marker")
    val id3 = StoreUtil.lineageId(spark, b, "marker")
    assert(id1 == id2)
    assert(id1 != id3)
  }
}
