package graft

import graft.engine.GraphSession

/** Dev probe: dotted vars across SET/DELETE/MERGE/ORDER/id-compare,
  * mirroring a reference-executor probe script (round 9). */
object DotProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val s = new GraphSession(spark)
    for (q <- Seq(
        "CREATE (.a:W {k:\"1\", u:\"5\"})",
        "CREATE (.b:W {k:\"2\", u:\"3\"})",
        "MATCH (.a:W) SET .a.k = \"9\"",
        "MATCH (n) RETURN n",
        "MATCH (.a:W) WHERE id(.a) < id(.a) RETURN .a",
        "MATCH (.a:W), (.b:W) WHERE id(.a) < id(.b) RETURN id(.b)",
        "MATCH (.a:W) RETURN .a ORDER BY .a.u",
        "MATCH (.a {k:\"1\"}), (.b {k:\"2\"}) MERGE (.a)-[:RR]->(.b)",
        "MATCH (n) RETURN n",
        "MATCH (.a:W) DETACH DELETE .a",
        "MATCH (n) RETURN n")) {
      try {
        val o = s.execute(q)
        val rows = o.rows.map(r =>
          if (r.kind == "info") s"info|${r.info}"
          else s"${r.kind}|${r.label}|${Option(r.properties).getOrElse(Map.empty).toSeq.sorted.map{case(k,v)=>s"$k=$v"}.mkString(",")}")
        println(s"OK [$q] meta=${o.affectedNodes},${o.affectedRels},${o.mutated} rows=${rows.mkString("; ")}")
      } catch {
        case e: Throwable =>
          println(s"ERR [$q] ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    spark.stop()
  }
}
