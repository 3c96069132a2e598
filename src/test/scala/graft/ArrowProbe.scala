package graft
import graft.engine.GraphSession
object ArrowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val s = new GraphSession(spark)
    for (q <- Seq(
        "CREATE (x:E1 {k:\"1\"})", "CREATE (y:E2 {k:\"2\"})",
        "MATCH (a {k:\"1\"}), (b {k:\"2\"}) CREATE (a)-[:RE]->(b)",
        "MATCH (a)--(b) RETURN a",
        "MATCH (a)-->(b) RETURN a",
        "MATCH (a)- ->(b) RETURN a",
        "MATCH (a), (a)-[r:RE]- >(b:E2) RETURN DISTINCT b.k",
        "MATCH (a)-[r:RE]- >(b) RETURN a",
        "MATCH (a)-[r:RE]>(b) RETURN a",
        "MATCH (a)<-[r:RE]-(b) RETURN b.k",
        "MATCH (a)< -[r:RE]-(b) RETURN b.k")) {
      try { val o = s.execute(q)
        println(s"OK [$q] rows=${o.rows.map(r => if (r.kind=="info") "info|"+r.info else r.kind+"|"+r.label).mkString("; ")}")
      } catch { case e: Throwable => println(s"ERR [$q] ${Option(e.getMessage).getOrElse("").take(90)}") }
    }
    spark.stop()
  }
}
