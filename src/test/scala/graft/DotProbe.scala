package graft

import graft.engine.GraphSession

/** Dev probe: dotted / degenerate pattern-variable names, engine vs the
  * reference executor's probed behavior (see FuzzProbe hole, round 9). */
object DotProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val s = new GraphSession(spark)
    for (q <- Seq(
        "CREATE (.a:P {k:\"1\"})",
        "MATCH (.a) RETURN .a",
        "MATCH (.a:P) WHERE .a.k = \"1\" RETURN .a.k",
        "MATCH (x.y:P) RETURN x.y",
        "CREATE (a:P {k:\"2\"})-[:R]->(.b:Q {k:\"3\"})",
        "MATCH (n) RETURN n")) {
      try {
        val o = s.execute(q)
        val rows = o.rows.map(r =>
          if (r.kind == "info") s"info|${r.info}"
          else s"${r.kind}|${r.label}|${Option(r.properties).getOrElse(Map.empty).toSeq.sorted.map{case(k,v)=>s"$k=$v"}.mkString(",")}")
        println(s"OK [$q] meta=${o.affectedNodes},${o.affectedRels},${o.mutated} rows=${rows.mkString("; ")}")
      } catch {
        case e: Throwable =>
          println(s"FAIL [$q] ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
  }
}
