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

  /** Read a parquet store that may not exist yet (first batch). */
  def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hPath)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Heal a store that a crashed [[rewriteInPlace]] left half-swapped: a
    * complete rewrite stranded at `.tmp` with the live store retired is
    * promoted; stray `.tmp`/`.retired` leftovers are dropped. Idempotent;
    * call before reading a store that maintenance rewrites.
    */
  def healRewrite(spark: SparkSession, root: String, name: String): Unit = {
    val cur = new HPath(s"$root/$name")
    val tmp = new HPath(s"$root/$name.tmp")
    val old = new HPath(s"$root/$name.retired")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(cur) && fs.exists(tmp)) fs.rename(tmp, cur)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Rewrite a store in place: write the new contents to `.tmp`
    * (the old store stays the read source for the whole job), then
    * two-rename swap. A crash at any point is healed by
    * [[healRewrite]] — either the old or the new store survives whole,
    * never a mix. Run under the owning maintainer's quiesce contract.
    */
  def rewriteInPlace(spark: SparkSession, root: String, name: String,
      df: org.apache.spark.sql.DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val cur = new HPath(s"$root/$name")
    val tmp = new HPath(s"$root/$name.tmp")
    val old = new HPath(s"$root/$name.retired")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    val w = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    fs.rename(cur, old)
    fs.rename(tmp, cur)
    fs.delete(old, true)
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
    if (!fs.exists(hPath))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
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
