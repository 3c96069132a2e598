package graft

import org.apache.spark.sql.SparkSession
import scala.io.StdIn

import graft.engine.GraphSession

/** Interactive console REPL — capability parity with the reference's
  * `glsh` client (src/bin/glsh.rs): banner, line-per-query, `:quit`,
  * `-e "<query>"` one-shot evaluation.
  *
  * Two transports, like glsh vs the GUI console:
  *  - default: speaks directly to an in-process engine;
  *  - `--ws <host> <port> [--api-key K] [-e QUERY]`: connects to a
  *    running `graft.Serve` daemon's WebSocket REPL (`/api/repl`),
  *    exactly as glsh connects to the reference server
  *    (glsh.rs:57-230 — banner consumed, text frame per query,
  *    pretty-JSON responses printed). */
object Shell {

  private def wsMain(rest: List[String]): Unit = {
    var host = "127.0.0.1"; var port = 8787
    var apiKey: Option[String] = None; var eval: Option[String] = None
    var argv = rest
    if (argv.nonEmpty && !argv.head.startsWith("-")) { host = argv.head; argv = argv.tail }
    if (argv.nonEmpty && argv.head.forall(_.isDigit)) { port = argv.head.toInt; argv = argv.tail }
    while (argv.nonEmpty) argv = argv match {
      case "--api-key" :: k :: t => apiKey = Some(k); t
      case "-e" :: q :: t => eval = Some(q); t
      case _ :: t => t
      case Nil => Nil
    }
    val client = new graft.api.WsClient(host, port, apiKey = apiKey)
    client.recvText(5000).foreach(println) // banner
    def roundTrip(q: String): Unit = {
      client.sendText(q)
      println(client.recvText().getOrElse("(connection closed)"))
    }
    eval match {
      case Some(q) => roundTrip(q)
      case None =>
        var line = StdIn.readLine("graft> ")
        while (line != null && line.trim != ":quit") {
          if (line.trim.nonEmpty) roundTrip(line)
          line = StdIn.readLine("graft> ")
        }
    }
    client.close()
  }

  def main(args: Array[String]): Unit = {
    args.toList match {
      case "--ws" :: rest => wsMain(rest); return
      case _ =>
    }
    // see Serve: the ContextCleaner must reap durable-checkpoint files
    val spark = graft.core.Materialize.longLivedSessionConf
      .foldLeft(SparkSession.builder().withExtensions(new GraftExtensions)
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
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
