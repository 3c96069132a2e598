package graft
import graft.engine.GraphSession
object BtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val s = new GraphSession(spark)
    for (q <- Seq("CREATE (a`b:BT {k:\"1\"})", "MATCH (a`b:BT) RETURN id(a`b)", "MATCH (n) RETURN n")) {
      try { val o = s.execute(q)
        println(s"OK [$q] rows=${o.rows.map(r => if (r.kind=="info") "info|"+r.info else r.kind+"|"+r.label).mkString("; ")}")
      } catch { case e: Throwable => println(s"ERR [$q] ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(100)}") }
    }
    spark.stop()
  }
}
