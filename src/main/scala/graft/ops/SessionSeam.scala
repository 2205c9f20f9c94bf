package graft.ops

/** Shared temp-dir lifecycle of the session-scoped materialization seams
  * ([[HnswIndex]] / [[SparseIndex]] / [[KnnLists]] — r15 code-review:
  * the seed/clear/delete machinery existed in near-verbatim copies, the
  * same drift the r14 lineageId consolidation fixed in the streaming
  * maintainers): one dir → materialization map, idempotent seed with
  * orphan reclamation on a failed write, clear() + JVM-shutdown-hook
  * teardown. Holders keep their own build definitions and serving
  * methods; the seam owns only the lifecycle.
  */
private[ops] final class SessionSeam(tmpPrefix: String, sub: String) {

  private val seeded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  sys.addShutdownHook(clear())

  /** Materialize `build` for `dir` once (idempotent). A failed write
    * deletes its temp dir before rethrowing (the orphan-reclamation
    * discipline).
    */
  def seed(dir: String)(build: => org.apache.spark.sql.DataFrame): Unit =
    seeded.computeIfAbsent(dir, { _ =>
      val out = java.nio.file.Files.createTempDirectory(tmpPrefix)
      try build.write.mode("overwrite").parquet(s"$out/$sub")
      catch { case e: Throwable =>
        try deleteRecursively(out) catch { case _: Throwable => () }
        throw e
      }
      out.toString
    })

  /** The materialized parquet path for `dir`, if seeded. */
  def lookup(dir: String): Option[String] =
    Option(seeded.get(dir)).map(p => s"$p/$sub")

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val stream = java.nio.file.Files.walk(root)
      try {
        val walk = stream
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator()
        while (walk.hasNext) java.nio.file.Files.deleteIfExists(walk.next())
      } finally stream.close()
    }

  /** Drop all seeded materializations and delete their parquet. */
  def clear(): Unit = {
    val it = seeded.values().iterator()
    while (it.hasNext) {
      try deleteRecursively(java.nio.file.Paths.get(it.next()))
      catch { case _: Throwable => () } // best-effort teardown
    }
    seeded.clear()
  }
}
