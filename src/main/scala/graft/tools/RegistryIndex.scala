package graft.tools

/** Prints the registry as markdown index rows (builder-side docs tooling):
  * query | oracle-backed? — the skeleton of SURVEY §8's index table. */
object RegistryIndex {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    qs.toSeq.sortBy(n => n.drop(1).takeWhile(_.isDigit).toInt).foreach { n =>
      println(s"| $n | ${if (os(n)) "oracle" else "rows-only"} |")
    }
    println(s"total=${qs.size} oracle=${qs.count(os)} rowsOnly=${qs.count(!os(_))}")
    println("rows-only: " + qs.filterNot(os).toSeq.sorted.mkString(", "))
  }
}
