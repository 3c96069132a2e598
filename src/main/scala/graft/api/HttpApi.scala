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
  private val pool = Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  /** Reject request bodies past this size instead of buffering them:
    * readAllBytes with no cap lets one oversized POST OOM the driver
    * JVM that also hosts the graph (the WS path caps frames at 64 MB;
    * this is the HTTP equivalent). */
  private val maxBodyBytes = 8 * 1024 * 1024

  server.createContext("/api/query", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try {
        if (ex.getRequestMethod != "POST") { respond(ex, 405, "method not allowed"); return }
        if (apiKey.exists(k => ex.getRequestHeaders.getFirst("X-API-Key") != k)) {
          respond(ex, 401, "unauthorized"); return
        }
        val body = readBounded(ex) match {
          case Some(b) => b
          case None => respond(ex, 413, "request body too large"); return
        }
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
    pool.shutdown() // non-daemon workers would otherwise pin the JVM open
    if (broker0.isEmpty) broker.stop()
  }

  /** Read the request body up to [[maxBodyBytes]]; None once over. */
  private def readBounded(ex: HttpExchange): Option[String] = {
    val in = ex.getRequestBody
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    var read = in.read(chunk)
    while (read >= 0) {
      if (buf.size() + read > maxBodyBytes) return None
      buf.write(chunk, 0, read)
      read = in.read(chunk)
    }
    Some(buf.toString(StandardCharsets.UTF_8.name()))
  }

  /** Parse `{"query": "...", "params": {...}, "log": bool}` with a
    * single depth-aware scan of the TOP-LEVEL object members. Two bugs
    * the previous regex probes had, both closed by construction here:
    * a `"query"` key nested inside params could shadow the real
    * statement (JSON key order is client-controlled), and any param
    * key/value containing a backslash escape was silently dropped from
    * the map. */
  private def parseBody(body: String): Option[(String, Option[Map[String, String]])] = {
    val n = body.length
    var i = body.indexOf('{')
    if (i < 0) return None
    i += 1
    var query: Option[String] = None
    // None = no params key in the request — the reference keeps the
    // Option through to the router split (server.rs:64,149)
    var params: Option[Map[String, String]] = None

    def ws(): Unit = while (i < n && body(i).isWhitespace) i += 1
    // reads a JSON string at body(i) == '"'; returns None if not one
    def str(): Option[String] = {
      if (i >= n || body(i) != '"') return None
      val sb = new StringBuilder
      i += 1
      while (i < n && body(i) != '"') {
        if (body(i) == '\\' && i + 1 < n) {
          body(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' if i + 5 < n &&
                body.substring(i + 2, i + 6).forall(h =>
                  Character.digit(h, 16) >= 0) =>
              sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
              i += 4
            // malformed \\u (short/non-hex) degrades like any unknown
            // escape instead of a NumberFormatException -> 500
            case c => sb.append(c)
          }
          i += 2
        } else { sb.append(body(i)); i += 1 }
      }
      if (i >= n) return None // unterminated
      i += 1
      Some(sb.toString)
    }
    // skips any JSON value (string / object / array / scalar)
    def skipValue(): Unit = {
      ws()
      if (i >= n) return
      body(i) match {
        case '"' => str(): Unit
        case '{' | '[' =>
          var depth = 0
          while (i < n && { body(i) match {
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' => depth -= 1; i += 1
            case '"' => str(): Unit
            case _ => i += 1
          }; depth > 0 }) ()
        case _ =>
          while (i < n && !",}]".contains(body(i))) i += 1
      }
    }
    // flat string map at body(i) == '{'; non-string values are skipped
    def stringMap(): Map[String, String] = {
      val out = Map.newBuilder[String, String]
      i += 1 // '{'
      ws()
      var ok = true
      while (ok && i < n && body(i) != '}') {
        str() match {
          case Some(k) =>
            ws()
            if (i < n && body(i) == ':') { i += 1; ws() } else ok = false
            if (ok) {
              val vStart = i
              str() match {
                case Some(v) => out += k -> v
                case None => i = vStart; skipValue()
              }
            }
            ws()
            if (i < n && body(i) == ',') { i += 1; ws() }
          case None => ok = false
        }
      }
      if (i < n && body(i) == '}') i += 1
      out.result()
    }

    ws()
    var ok = true
    while (ok && i < n && body(i) != '}') {
      str() match {
        case Some(k) =>
          ws()
          if (i < n && body(i) == ':') { i += 1; ws() } else ok = false
          if (ok) k match {
            case "query" =>
              val vStart = i
              str() match {
                case Some(q) => query = Some(q)
                case None => i = vStart; skipValue()
              }
            case "params" =>
              if (i < n && body(i) == '{') params = Some(stringMap()) else skipValue()
            case _ => skipValue()
          }
          ws()
          if (i < n && body(i) == ',') { i += 1; ws() }
        case None => ok = false
      }
    }
    query.map((_, params))
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
