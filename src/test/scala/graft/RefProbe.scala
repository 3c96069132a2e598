package graft

import graft.engine.GraphSession

/** Adjudication probe driver (test scope) — replaces the per-quirk
  * probe mains that accumulated through round 9 (ArrowProbe, BtProbe,
  * DotProbe, DotProbe2, MergeProbe, OrderProbe; VERDICT r9 #3). Reads
  * the SAME line protocol the refharness REPL speaks and prints the
  * SAME response format, so one statement script drives both sides of
  * an adjudication and the outputs diff directly (modulo side-local ids
  * and HashMap row order on the reference side):
  *
  *   tools/run.sh graft.RefProbe tools/refharness/probes/dotted.ql
  *   tools/refharness/target/release/refharness \
  *       < tools/refharness/probes/dotted.ql
  *
  * Protocol (tools/refharness/README.md): one request per line —
  * `Q <query>` (no-params router), `P <query>\x1f<k>=<v>\x1f...`
  * (with-params Cypher path), `RESET` (fresh database); `\x1d` in a
  * query encodes an embedded newline. Responses: `meta|n|r|m` then
  * `node|id|label|k\x1fv\x1ek\x1fv...` /
  * `rel|id|from|to|label|k\x1fv\x1e...` / `info|s` rows, terminated by
  * `OK` — or `ERR <msg>`. Prop key and value join on `\x1f`, not '=':
  * fuzz-minted keys can contain '=' (`{k=:"v"}` → key "k=") and a
  * `k=v` pair is then ambiguous at a first-'=' split (r11 seed 177).
  * No argument (or `-`) reads the script from stdin.
  */
object RefProbe {

  def main(args: Array[String]): Unit = {
    // explicit UTF-8 stdout: with a POSIX-C locale the JVM's stdout
    // encoder mangles multi-byte payloads to '?', which diffs
    // spuriously against the reference's raw-UTF-8 output (found r12
    // probing probes/nan.ql's U+0661 statement)
    val out = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    def println(s: String): Unit = out.println(s)
    val spark = SparkTestSession.spark
    var session = new GraphSession(spark)
    // explicit UTF-8 stdin too: Source.stdin decodes with the JVM
    // default charset, which under a POSIX-C locale would mangle
    // multi-byte probe input piped via '-' on the way IN — the mirror
    // image of the stdout fix above (ADVICE r12)
    val lines: Iterator[String] =
      if (args.isEmpty || args(0) == "-")
        scala.io.Source.fromInputStream(System.in)(scala.io.Codec.UTF8).getLines()
      else scala.io.Source.fromFile(args(0), "UTF-8").getLines()

    for (line <- lines) {
      if (line == "RESET") { session = new GraphSession(spark); println("OK") }
      else {
        val (query0, params) =
          if (line.startsWith("P ")) {
            val parts = line.drop(2).split('\u001f')
            (parts.head, parts.tail.flatMap { p =>
              val eq = p.indexOf('=')
              if (eq < 0) None else Some(p.take(eq) -> p.drop(eq + 1))
            }.toMap)
          } else if (line.startsWith("Q ")) (line.drop(2), Map.empty[String, String])
          else { println("ERR bad request"); ("", null) }
        if (params != null) {
          val query = query0.replace('\u001d', '\n')
          try {
            val o = if (params.isEmpty) session.execute(query)
                    else session.executeWithParams(query, params)
            println(s"meta|${o.affectedNodes}|${o.affectedRels}|${o.mutated}")
            o.rows.foreach { r =>
              val props = Option(r.properties).getOrElse(Map.empty)
                .toSeq.sorted.map { case (k, v) => s"$k\u001f$v" }.mkString("\u001e")
              r.kind match {
                case "node" => println(s"node|${r.id}|${r.label}|$props")
                case "relationship" =>
                  println(s"rel|${r.id}|${r.src}|${r.dst}|${r.label}|$props")
                case _ => println(s"info|${r.info}")
              }
            }
            println("OK")
          } catch {
            case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              println(s"ERR ${msg.replace('\n', ' ')}")
          }
        }
      }
      out.flush()
    }
    spark.stop()
  }
}
