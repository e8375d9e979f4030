package graft.tools
object ListQ {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(n => println(s"QUERY $n"))
    graft.SparkEntry.oracleSql.keys.toSeq.sorted.foreach(n => println(s"ORACLE $n"))
  }
}
