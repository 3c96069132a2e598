package graft

import org.apache.spark.sql.SparkSession
import scala.io.StdIn

import graft.engine.GraphSession

/** Interactive console REPL — capability parity with the reference's
  * `glsh` client (src/bin/glsh.rs: banner, line-per-query, `:quit`),
  * speaking directly to the engine instead of a WebSocket. Supports
  * `-e "<query>"` one-shot evaluation like `glsh -e`. */
object Shell {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = new GraphSession(spark)

    def run(q: String): Unit =
      try {
        val out = session.execute(q)
        out.rows.foreach {
          case r if r.kind == "node" =>
            println(s"(${r.id}) :${r.label} ${r.properties.map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")}")
          case r if r.kind == "relationship" =>
            println(s"[${r.id}] (${r.src})-[:${r.label}]->(${r.dst}) ${r.properties.map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")}")
          case r => println(r.info)
        }
        println(s"-- rows=${out.rows.size} nodes=${out.affectedNodes} rels=${out.affectedRels} mutated=${out.mutated}")
      } catch { case e: Exception => println(s"error: ${e.getMessage}") }

    args.toList match {
      case "-e" :: query :: _ => run(query)
      case _ =>
        println("graft shell — line per query, ':quit' to exit")
        var line = StdIn.readLine("graft> ")
        while (line != null && line.trim != ":quit") {
          if (line.trim.nonEmpty) run(line)
          line = StdIn.readLine("graft> ")
        }
    }
    spark.stop()
  }
}
