package graft

import org.apache.spark.sql.SparkSession
import graft.engine.GraphSession

/** Temporary probe: ORDER BY with missing props / non-unique keys. */
object OrderProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new GraphSession(spark)
    def p(label: String, q: String): Unit = {
      val r = try {
        val o = s.execute(q)
        s"OK rows=${o.rows.map(_.toString).mkString(" ; ")}"
      } catch { case e: Exception => s"ERR ${e.getClass.getSimpleName}: ${e.getMessage}" }
      println(s"[$label] $r")
    }
    p("s1", "CREATE (a:La {k:\"a\", u:\"10\"})")
    p("s2", "CREATE (b:La {k:\"b\", u:\"9\"})")
    p("s3", "CREATE (c:La {k:\"c\"})")
    p("s4", "CREATE (d:La {k:\"d\"})")
    p("q-double", "MATCH (n) WITH n  ORDER BY n.u LIMIT 2")
    p("q-single", "MATCH (n) WITH n ORDER BY n.u LIMIT 2")
    p("q-ret", "MATCH (n) RETURN n.k ORDER BY n.u")
    spark.stop()
  }
}
