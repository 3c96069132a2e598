package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import scala.util.control.NonFatal

import graft.engine.GraphSession

/** HTTP query API — the reference's `POST /api/query` contract
  * (api/server.rs:60-177): JSON `{query, params?, log?}` in, DTO rows +
  * counters out (`kind/id/label/from/to/metadata/info` row shape,
  * api/server.rs:70-127); optional `X-API-Key`; 400 with the raw error
  * string on failure; 504 on timeout (30 s); per-request RID + latency
  * log lines.
  *
  * Transport only: execution goes through the shared [[EngineBroker]]
  * (the reference's single-engine-thread architecture, SURVEY §3/API4),
  * so HTTP requests serialize with the WebSocket REPL and the headless
  * daemon against one engine thread.
  */
class HttpApi(session: GraphSession, port: Int = 0,
    apiKey: Option[String] = None, logDir: Option[String] = None,
    broker0: Option[EngineBroker] = None, bindAddr: String = "127.0.0.1") {

  val broker: EngineBroker = broker0.getOrElse(new EngineBroker(session, logDir))

  // bind the configured address only (settings.rs api_bind_addr
  // default loopback; server.rs:233-259) — not the wildcard
  private val server = HttpServer.create(new InetSocketAddress(bindAddr, port), 0)
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
        val rid = broker.nextRid()
        val t0 = System.nanoTime()
        broker.execute(query, params, timeoutSec = 30) match {
          case Some(Right(out)) =>
            broker.apiLog.foreach(_.logApi(rid, (System.nanoTime() - t0) / 1000000, 200))
            respondJson(ex, 200, Dto.outcomeJson(out))
          case Some(Left(err)) =>
            broker.apiLog.foreach(_.logApi(rid, (System.nanoTime() - t0) / 1000000, 400))
            respond(ex, 400, err)
          case None =>
            broker.apiLog.foreach(_.logApi(rid, (System.nanoTime() - t0) / 1000000, 504))
            respond(ex, 504, "query timeout")
        }
      } catch {
        case NonFatal(e) => respond(ex, 500, Option(e.getMessage).getOrElse("error"))
      }
    }
  })

  def start(): Int = {
    broker.start()
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    server.stop(0)
    if (broker0.isEmpty) broker.stop()
  }

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
