package graft

import org.apache.spark.sql.SparkSession
import graft.engine.GraphSession

/** Temporary probe: ADVICE r8 Merge/Create endpoint + lazy-param behaviors. */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new GraphSession(spark)
    def p(label: String, q: String, params: Map[String, String] = Map("other" -> "1")): Unit = {
      val r = try {
        val o = if (params.isEmpty) s.execute(q) else s.executeWithParams(q, params)
        s"OK rows=${o.rows.map(_.toString).mkString(" ; ")}"
      } catch { case e: Exception => s"ERR ${e.getClass.getSimpleName}: ${e.getMessage}" }
      println(s"[$label] $r")
    }
    p("setup", "CREATE (a:X {k:\"1\"})", Map.empty)
    p("merge-plain", "OPTIONAL MATCH (a:X) MERGE (a)-[:R]->(a)")
    p("rels-1", "MATCH (n)-[r]->(m) RETURN id(r)", Map.empty)
    p("merge-missing-rows", "OPTIONAL MATCH (a:X) MERGE (a)-[:S {p:$missing}]->(a)")
    p("merge-missing-zero", "OPTIONAL MATCH (z:NOPE) MERGE (z)-[:S {p:$missing}]->(z)")
    p("setup-rel", "MATCH (a:X) CREATE (a)-[r:RR]->(a)", Map.empty)
    p("merge-relvar", "OPTIONAL MATCH (a:X)-[r:RR]->(b) MERGE (r)-[:X2]->(b)")
    p("merge-relvar-missing", "OPTIONAL MATCH (a:X)-[r:RR]->(b) MERGE (r)-[:X3 {p:$missing}]->(b)")
    p("create-relvar", "OPTIONAL MATCH (a:X)-[r:RR]->(b) CREATE (r)-[q:Q]->(b) RETURN b")
    p("create-relvar-noreturn", "OPTIONAL MATCH (a:X)-[r:RR]->(b) CREATE (r)-[q:Q]->(b)")
    p("create-relvar-missing", "OPTIONAL MATCH (a:X)-[r:RR]->(b) CREATE (r)-[q:Q {p:$missing}]->(b)")
    p("rels-2", "MATCH (n)-[r]->(m) RETURN id(r)", Map.empty)
    spark.stop()
  }
}
