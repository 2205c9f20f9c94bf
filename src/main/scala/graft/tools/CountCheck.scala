package graft.tools

/** Dev-only: print the query/oracle counts so doc headers (SURVEY.md,
  * COVERAGE.md, README.md) can be synced against reality instead of
  * hand-tallied (VERDICT r4 #7 called out exactly this drift).
  */
object CountCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QCOUNT=${q.size} OCOUNT=${o.size}")
    val orphans = o.diff(q)
    if (orphans.nonEmpty) println(s"ORACLE_WITHOUT_QUERY=${orphans.mkString(",")}")
    println(s"NO_ORACLE=${q.diff(o).toSeq.sorted.mkString(",")}")
  }
}
