package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.util.control.NonFatal

import graft.engine.{GraphSession, QueryOutcome, ResultRow}
import graft.io.QueryLog

/** HTTP query API — the reference's `POST /api/query` contract
  * (api/server.rs:60-177): JSON `{query, params?, log?}` in, DTO rows +
  * counters out (`kind/id/label/from/to/metadata/info` row shape,
  * api/server.rs:70-127); optional `X-API-Key`; 400 with the raw error
  * string on failure; 504 on timeout (30 s); per-request RID + latency
  * log lines.
  *
  * Mirrors the reference's broker architecture (SURVEY §3/API4): HTTP
  * worker threads enqueue requests onto a single-consumer queue; ONE
  * engine thread executes against the GraphSession — mutations are
  * serialized exactly like the reference's engine thread, while Spark
  * parallelizes each query internally.
  */
class HttpApi(session: GraphSession, port: Int = 0,
    apiKey: Option[String] = None, logDir: Option[String] = None) {

  private case class Req(rid: String, query: String, params: Map[String, String],
      respond: Either[String, QueryOutcome] => Unit)

  private val queue = new LinkedBlockingQueue[Req]()
  private val ridCounter = new AtomicLong(0)
  private val apiLog = logDir.map(d => new QueryLog(d, "api"))
  private val queryLog = logDir.map(d => new QueryLog(d, "queries"))

  private val engineThread = new Thread(() => {
    while (!Thread.currentThread().isInterrupted) {
      try {
        val req = queue.take()
        val result =
          try {
            val out = session.executeWithParams(req.query, req.params)
            queryLog.foreach(_.logQuery(req.query, ok = true,
              out.affectedNodes, out.affectedRels, out.mutated))
            Right(out)
          } catch {
            case NonFatal(e) =>
              queryLog.foreach(_.logQuery(req.query, ok = false, 0, 0,
                mutated = false, error = Some(e.getMessage)))
              Left(Option(e.getMessage).getOrElse(e.toString))
          }
        req.respond(result)
      } catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    }
  }, "graft-engine")
  engineThread.setDaemon(true)

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(Executors.newFixedThreadPool(4))

  server.createContext("/api/query", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try {
        if (ex.getRequestMethod != "POST") { respond(ex, 405, "method not allowed"); return }
        if (apiKey.exists(k => ex.getRequestHeaders.getFirst("X-API-Key") != k)) {
          respond(ex, 401, "unauthorized"); return
        }
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val (query, params) = parseBody(body) match {
          case Some(qp) => qp
          case None => respond(ex, 400, "malformed request body"); return
        }
        val rid = s"${System.nanoTime()}-${ridCounter.getAndIncrement()}"
        val t0 = System.nanoTime()
        val resultQ = new LinkedBlockingQueue[Either[String, QueryOutcome]](1)
        queue.put(Req(rid, query, params, r => resultQ.put(r)))
        Option(resultQ.poll(30, TimeUnit.SECONDS)) match {
          case Some(Right(out)) =>
            apiLog.foreach(_.logApi(rid, (System.nanoTime() - t0) / 1000000, 200))
            respondJson(ex, 200, outcomeJson(out))
          case Some(Left(err)) =>
            apiLog.foreach(_.logApi(rid, (System.nanoTime() - t0) / 1000000, 400))
            respond(ex, 400, err)
          case None =>
            apiLog.foreach(_.logApi(rid, (System.nanoTime() - t0) / 1000000, 504))
            respond(ex, 504, "query timeout")
        }
      } catch {
        case NonFatal(e) => respond(ex, 500, Option(e.getMessage).getOrElse("error"))
      }
    }
  })

  def start(): Int = {
    engineThread.start()
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    server.stop(0)
    engineThread.interrupt()
  }

  // ------------------------------ JSON ----------------------------------
  // Minimal hand-rolled JSON (no extra deps allowed): enough for the
  // flat request/response shapes of this contract.

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def q(s: String): String = "\"" + jsonEscape(s) + "\""

  private def rowJson(r: ResultRow): String = r.kind match {
    case "node" =>
      s"""{"kind":"node","id":${q(r.id)},"label":${q(r.label)},"metadata":${mapJson(r.properties)}}"""
    case "relationship" =>
      s"""{"kind":"relationship","id":${q(r.id)},"label":${q(r.label)},"from":${q(r.src)},"to":${q(r.dst)},"metadata":${mapJson(r.properties)}}"""
    case _ =>
      s"""{"kind":"info","id":"","info":${q(r.info)}}"""
  }

  private def mapJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")

  private def outcomeJson(o: QueryOutcome): String =
    s"""{"rows":[${o.rows.map(rowJson).mkString(",")}],""" +
      s""""affected_nodes":${o.affectedNodes},""" +
      s""""affected_relationships":${o.affectedRels},"mutated":${o.mutated}}"""

  /** Parse `{"query": "...", "params": {...}, "log": bool}`. */
  private def parseBody(body: String): Option[(String, Map[String, String])] = {
    def findString(json: String, key: String): Option[String] = {
      val keyPat = ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\"").r
      keyPat.findFirstMatchIn(json).map { m =>
        val sb = new StringBuilder
        var i = m.end
        while (i < json.length && json(i) != '"') {
          if (json(i) == '\\' && i + 1 < json.length) {
            json(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r')
              case 'u' =>
                sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
                i += 4
              case c => sb.append(c)
            }
            i += 2
          } else { sb.append(json(i)); i += 1 }
        }
        sb.toString
      }
    }
    findString(body, "query").map { query =>
      // params: flat string map
      val params = "\"params\"\\s*:\\s*\\{".r.findFirstMatchIn(body).map { m =>
        var depth = 1
        var i = m.end
        val start = i
        while (i < body.length && depth > 0) {
          body(i) match {
            case '{' => depth += 1
            case '}' => depth -= 1
            case '"' => i += 1; while (i < body.length && body(i) != '"') {
              if (body(i) == '\\') i += 1; i += 1
            }
            case _ =>
          }
          i += 1
        }
        val inner = body.substring(start - 1, i)
        "\"([^\"\\\\]*)\"\\s*:\\s*\"([^\"\\\\]*)\"".r.findAllMatchIn(inner)
          .map(mm => mm.group(1) -> mm.group(2)).toMap
      }.getOrElse(Map.empty[String, String])
      (query, params)
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def respondJson(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
