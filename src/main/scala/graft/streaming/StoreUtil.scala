package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared store plumbing for the persisted-store streaming maintainers
  * (StreamingDedup, StreamingEmbeddingDedup, StreamingIvf, StreamingHnsw,
  * StreamingSparse) — one implementation of the lineage-marker protocol
  * and the empty-tolerant store read instead of five drifting copies
  * (r14 code-review).
  */
private[streaming] object StoreUtil {

  /** Stable per-checkpoint lineage id: read the marker if present, else
    * create it via write-to-temp + atomic rename (losing the rename race
    * to a concurrent starter re-reads the winner's id).
    */
  def lineageId(spark: SparkSession, checkpointDir: String,
      marker: String): String = {
    val f = new HPath(checkpointDir, marker)
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    val existing =
      if (!fs.exists(f)) ""
      else {
        val in = fs.open(f)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      }
    if (existing.nonEmpty) existing
    else {
      val id = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new HPath(checkpointDir, s"$marker.tmp-$id")
      val out = fs.create(tmp, true)
      try out.write(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, f)) id
      else { fs.delete(tmp, false); lineageId(spark, checkpointDir, marker) }
    }
  }

  /** Read a parquet store that may not exist yet (first batch). A store
    * a crashed rewrite left half-swapped is promoted first — a reader
    * must never mistake a mid-swap store for an empty one.
    */
  def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    promoteHalfSwapped(fs, path)
    if (fs.exists(hPath)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def complete(fs: org.apache.hadoop.fs.FileSystem,
      p: HPath): Boolean =
    fs.exists(p) && fs.exists(new HPath(p, "_SUCCESS"))

  /** Heal a store that a crashed [[rewriteInPlace]] left half-swapped.
    * The protocol writes `.tmp` fully (parquet committer `_SUCCESS`),
    * renames the live store to `.retired`, promotes `.tmp`, then drops
    * `.retired` — so every crash state is distinguishable and exactly
    * one whole copy is promoted; NOTHING is ever deleted while it could
    * be the only complete copy (r15 code-review: the first draft
    * unconditionally dropped `.tmp`/`.retired` and could destroy a
    * crashed rewrite's only data). The one ambiguous state — live store
    * AND `.retired` AND `.tmp` all present, which only a quiesce
    * violation (a writer recreating the store mid-swap) can produce —
    * refuses with an exception instead of guessing which copy to drop.
    * Rename failures throw rather than fall through to deletion.
    */
  def healRewrite(spark: SparkSession, root: String, name: String): Unit = {
    val cur = new HPath(s"$root/$name")
    val tmp = new HPath(s"$root/$name.tmp")
    val old = new HPath(s"$root/$name.retired")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    def mv(src: HPath, dst: HPath): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"heal: rename $src -> $dst failed")
    if (!fs.exists(cur)) {
      if (complete(fs, tmp)) { mv(tmp, cur) // crash between the renames
        adoptRootCommitted(fs, cur) // crash mid-stamp pre-swap
        if (fs.exists(old)) fs.delete(old, true)
      } else if (fs.exists(old)) { mv(old, cur) // tmp never completed
        if (fs.exists(tmp)) fs.delete(tmp, true)
      } else if (fs.exists(tmp)) fs.delete(tmp, true) // no store ever
    } else if (fs.exists(old)) {
      if (fs.exists(tmp))
        throw new IllegalStateException(
          s"$cur, $old and $tmp all exist — the store was recreated " +
            "while a rewrite was mid-swap (quiesce violation); refusing " +
            "to guess which copy to drop, reconcile manually")
      fs.delete(old, true) // swap completed, crash before the cleanup
    } else if (fs.exists(tmp)) {
      fs.delete(tmp, true) // pre-swap attempt; the live store is whole
    }
  }

  /** Promote a half-swapped store on the READ path (r15 code-review:
    * a crash between [[rewriteInPlace]]'s renames left the store path
    * absent, and serving/novelty reads silently saw an empty store until
    * the next maintenance call healed it — an empty `seen` set re-ingests
    * the whole corpus). Never deletes anything, and — the r15 SECOND
    * review — never races a sibling: promotion is serialized through a
    * JVM-wide lock and re-checked inside it, and ONLY a complete `.tmp`
    * is promoted. The `.retired` original is never restored here:
    * [[rewriteInPlace]] retires the live store only after `.tmp` is
    * complete, so "store absent + tmp incomplete + retired present"
    * cannot arise from the protocol — and restoring it on a read could
    * race a sibling's tmp-promotion and rename the STALE copy into the
    * just-promoted live store (Hadoop rename nests src inside an
    * existing dst dir on some filesystems). A lost rename is tolerated
    * iff the store now exists (the sibling won); cross-JVM readers
    * during a crash-recovery window fall under the maintenance quiesce
    * contract like every other store mutation.
    */
  private val promoteLock = new Object

  private def promoteHalfSwapped(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val cur = new HPath(path)
    if (fs.exists(cur)) return // fast path — no lock on the common read
    promoteLock.synchronized {
      if (fs.exists(cur)) return
      val tmp = new HPath(s"$path.tmp")
      if (complete(fs, tmp)) {
        if (!fs.rename(tmp, cur) && !fs.exists(cur))
          throw new java.io.IOException(
            s"promote: rename $tmp -> $cur failed and $cur still absent")
        adoptRootCommitted(fs, cur) // crash mid-stamp pre-swap
      }
    }
  }

  /** Stamp a per-partition `_SUCCESS` into every child directory of a
    * store whose ROOT carries the committer's `_SUCCESS` (r15 s2 — the
    * committed-read bridge): a `partitionBy` job commits ONE root marker,
    * but [[readCommitted]] decides per partition directory, so a
    * rewritten store would otherwise read as empty. The root marker
    * proves every child was written by one committed job, so stamping
    * each child is sound; idempotent, and a no-op on non-partitioned or
    * uncommitted dirs.
    */
  private def stampPartitionMarkers(
      fs: org.apache.hadoop.fs.FileSystem, dir: HPath): Unit =
    if (fs.exists(new HPath(dir, "_SUCCESS")))
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          val m = new HPath(st.getPath, "_SUCCESS")
          if (!fs.exists(m)) fs.create(m, true).close()
        }
      }

  /** Stamp-and-CONSUME a live store's root marker (r15 s2 review #1):
    * a store rewritten by the pre-stamping `rewriteInPlace` carries a
    * root `_SUCCESS` and NO per-partition markers — under committed-only
    * reads it would serve empty, and the next compact would rewrite the
    * store from that empty view, deleting its data. The root marker
    * proves every partition the rewrite job wrote is committed, so they
    * are stamped — and the root marker is then DELETED: left in place it
    * would be stale evidence, wrongly blessing a LATER crashed batch
    * partition on the next adoption pass. Idempotent; a no-op (one
    * exists probe) on stores that never carried a root marker, i.e.
    * every batch-written store and every post-upgrade rewrite output.
    */
  private def adoptRootCommitted(
      fs: org.apache.hadoop.fs.FileSystem, dir: HPath): Unit = {
    val rootMarker = new HPath(dir, "_SUCCESS")
    if (fs.exists(rootMarker)) {
      stampPartitionMarkers(fs, dir)
      fs.delete(rootMarker, false)
    }
  }

  /** Rewrite a store in place: write the new contents to `.tmp`
    * (the old store stays the read source for the whole job), then
    * two-rename swap. A crash at any point is healed by
    * [[healRewrite]] / the read-side promote — either the old or the
    * new store survives whole, never a mix. Run under the owning
    * maintainer's quiesce contract. Partition markers are stamped on
    * `.tmp` BEFORE the swap, so a promoted store always arrives fully
    * stamped; the heal/promote paths re-stamp after promotion to cover
    * a crash mid-stamping.
    */
  def rewriteInPlace(spark: SparkSession, root: String, name: String,
      df: org.apache.spark.sql.DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val cur = new HPath(s"$root/$name")
    val tmp = new HPath(s"$root/$name.tmp")
    val old = new HPath(s"$root/$name.retired")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    def mv(src: HPath, dst: HPath): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rewrite: rename $src -> $dst failed")
    val w = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    if (partitionCols.nonEmpty) stampPartitionMarkers(fs, tmp)
    mv(cur, old)
    mv(tmp, cur)
    // consume the root marker (stale evidence otherwise — see
    // adoptRootCommitted); a crash before this line is healed by the
    // read-path adoption
    adoptRootCommitted(fs, cur)
    fs.delete(old, true)
  }

  /** Shared physical-reclamation kernel for the tombstone-is-exact-
    * maintenance families (StreamingIvf / StreamingSparse — r15
    * code-review: the two compact() bodies were line-for-line copies):
    * heal any half-swapped store, snapshot the tombstoned keys, rewrite
    * the data store without them, then drop EXACTLY the snapshot from
    * the tombstone store — an anti-join rewrite against the LIVE
    * tombstone table, so a delete appended while the scrub job ran is
    * retained, not silently discarded with a blanket directory delete
    * (the tombstone-loss race). Scrub first, drop last: a crash at any
    * point leaves the snapshot ids still tombstoned. Run quiesced —
    * which covers applyDeletes too; the anti-join rewrite merely bounds
    * the damage of a violation.
    *
    * The data store is read COMMITTED-ONLY (r15 s2), so the rewrite also
    * physically drops any crashed half-written tag partition — under the
    * quiesce contract an uncommitted partition is a dead remnant whose
    * retry (if it ever comes) recomputes from its input, never from the
    * store, so dropping it loses nothing.
    */
  def compactStore(spark: SparkSession, storePath: String,
      storeName: String, storeSchema: StructType, keyCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    Seq(storeName, "tombstones").foreach(healRewrite(spark, storePath, _))
    val fs = new HPath(storePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new HPath(s"$storePath/tombstones"))) return
    val tombSchema = StructType.fromDDL(s"$keyCol BIGINT")
    val dead = readOrEmpty(spark, s"$storePath/tombstones", tombSchema)
      .select(col(keyCol).as("dead_id")).distinct()
      .localCheckpoint() // scrub anti-join + tombstone drop + emptiness
    if (dead.isEmpty) return
    if (fs.exists(new HPath(s"$storePath/$storeName")))
      rewriteInPlace(spark, storePath, storeName,
        readCommitted(spark, s"$storePath/$storeName", storeSchema)
          .join(dead, col(keyCol) === col("dead_id"), "left_anti"),
        Seq("batch"))
    rewriteInPlace(spark, storePath, "tombstones",
      readOrEmpty(spark, s"$storePath/tombstones", tombSchema)
        .join(dead, col(keyCol) === col("dead_id"), "left_anti"))
  }

  /** Read a tag-partitioned store keeping ONLY fully-committed partitions
    * (those whose directory carries the parquet committer's `_SUCCESS`
    * marker) — for readers that select by a GLOBAL property of the store
    * (e.g. max(seq)), where a crashed half-written partition must not be
    * eligible. The per-batch retry path doesn't need this (its
    * own-tag-excluding read plus the overwrite make retries safe); a
    * max-seq read between a crash and its retry does (r14 code-review:
    * a partial top-seq artifact version must never be served or
    * compacted on).
    */
  def readCommitted(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    promoteHalfSwapped(fs, path)
    if (!fs.exists(hPath))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    // adopt a pre-stamping-era rewrite output (or a rewrite that crashed
    // before consuming its root marker) so its partitions stay readable
    adoptRootCommitted(fs, hPath)
    val committed = fs.listStatus(hPath).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new HPath(st.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
    if (committed.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema)
        .option("basePath", path)
        .parquet(committed: _*)
  }
}
