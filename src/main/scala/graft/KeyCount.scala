package graft
object KeyCount {
  def main(a: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"KEYS total=${q.size} oracle=${o.size} rowsOnly=${(q -- o).size}")
    println("ROWSONLY: " + (q -- o).toSeq.sorted.mkString(","))
  }
}
