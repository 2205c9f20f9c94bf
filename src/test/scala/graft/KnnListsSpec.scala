package graft

import org.scalatest.funsuite.AnyFunSuite

/** The KnnLists materialization seam's contract (the HnswIndexSpec /
  * SparseIndexSpec test applied to the kNN lists artifact): seeded and
  * unseeded paths are row-identical for the lists AND the consumers
  * (knn_join's served output, semdedup_knn, dedup_agreement), seeding is
  * idempotent, and
  * clear() reclaims the temp parquet from disk. The maintenance queries
  * (incremental_knn, knn_delete_repair) never touch the seam — rebuild
  * is their demonstrated claim.
  */
class KnnListsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("seeded and unseeded paths are row-identical; seed idempotent; clear reclaims disk") {
    import graft.ops.{KnnLists, SimilarityOps}
    KnnLists.clear()
    try {
      def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        df.collect().map(_.toSeq.toList: Seq[Any]).toSeq
      val unseeded = rows(KnnLists.lists(spark, dir))
      assert(unseeded.nonEmpty, "empty lists — seam test vacuous")
      val sd0 = rows(SimilarityOps.semdedupKnn(spark, dir))
      val ag0 = rows(graft.ops.DedupOps.dedupAgreement(spark, dir))
      def tmpDirs(): Set[java.nio.file.Path] = {
        val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
        val it = java.nio.file.Files.list(root).iterator()
        var acc = Set.empty[java.nio.file.Path]
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("graft_knn_")) acc += p
        }
        acc
      }
      val preSeed = tmpDirs()
      KnnLists.seed(spark, dir)
      KnnLists.seed(spark, dir) // idempotent — no second materialization
      val seeded = rows(KnnLists.lists(spark, dir))
      assert(seeded == unseeded,
        "materialized lists diverge from inline build")
      val sd1 = rows(SimilarityOps.semdedupKnn(spark, dir))
      assert(sd0 == sd1, "semdedup_knn differs seeded vs unseeded")
      val ag1 = rows(graft.ops.DedupOps.dedupAgreement(spark, dir))
      assert(ag0 == ag1, "dedup_agreement differs seeded vs unseeded")
      val created = tmpDirs() -- preSeed
      assert(created.nonEmpty, "seed created no temp materialization dir")
      KnnLists.clear()
      created.foreach { p =>
        assert(!java.nio.file.Files.exists(p),
          s"clear() left materialization on disk: $p")
      }
    } finally KnnLists.clear()
  }
}
