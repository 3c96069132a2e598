package graft
import org.apache.spark.sql.SparkSession
import graft.engine.GraphSession
/** Drives the engine end-to-end through the public GraphSession API:
  * the reference README's own showcase flow (README.md:73-76). */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new GraphSession(spark)
    s.execute("CREATE (:Person {name: 'Ada'});")
    s.execute("CREATE (:Company {name: 'Acme'});")
    s.execute("MATCH (p:Person {name:'Ada'}), (c:Company) CREATE (p)-[:WORKS_AT {since: 2021}]->(c);")
    val out = s.execute("MATCH (p:Person {name: \"Ada\"})-[:WORKS_AT]->(c:Company) RETURN p, c")
    out.rows.foreach(r => println(s"${r.kind} ${r.label} ${r.properties}"))
    println(s"nodes=${s.nodeCount} rels=${s.relationshipCount}")
    // probe: unknown statement must error like the reference
    try { s.execute("UPDATE NODE x SET y=1") ; println("ERROR: should have thrown") }
    catch { case e: Exception => println(s"probe ok: ${e.getMessage}") }
    spark.stop()
  }
}
