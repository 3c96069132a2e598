package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{EngineBroker, WsClient, WsRepl}
import graft.engine.GraphSession
import graft.io.GraphStore

/** WebSocket REPL (API2, server.rs:179-230) + headless daemon with
  * dirty-flag autosave (API5/API6, main.rs:214-289). */
class WsReplSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("ws_repl_banner_roundtrip_and_error") {
    val broker = new EngineBroker(new GraphSession(spark))
    val ws = new WsRepl(broker)
    val port = ws.start()
    try {
      val c = new WsClient("127.0.0.1", port)
      assert(c.recvText(5000).exists(_.contains("REPL ready")), "banner expected")
      c.sendText("CREATE (:Person {name: 'Ada'})")
      val created = c.recvText().get
      assert(created.contains("\"mutated\": true"))
      c.sendText("MATCH (p:Person) RETURN p")
      val matched = c.recvText().get
      assert(matched.contains("\"kind\": \"node\"") && matched.contains("Ada"))
      c.sendText("COMPLETELY INVALID SYNTAX ???")
      val err = c.recvText().get
      assert(err.startsWith("error: "), s"expected error reply, got: $err")
      c.close()
    } finally { ws.stop(); broker.stop() }
  }

  test("ws_repl_api_key_checked_at_upgrade") {
    val broker = new EngineBroker(new GraphSession(spark))
    val ws = new WsRepl(broker, apiKey = Some("sekrit"))
    val port = ws.start()
    try {
      intercept[java.io.IOException] { new WsClient("127.0.0.1", port) }
      val ok = new WsClient("127.0.0.1", port, apiKey = Some("sekrit"))
      assert(ok.recvText(5000).exists(_.contains("REPL ready")))
      ok.close()
    } finally { ws.stop(); broker.stop() }
  }

  test("ws_server_survives_abusive_clients") {
    // the accept loop and per-connection threads must shrug off every
    // abuse shape a public socket sees — garbage instead of HTTP, a
    // handshake cut mid-header, an upgraded client sending raw noise,
    // an over-cap declared frame length — and still serve the next
    // healthy client
    val broker = new EngineBroker(new GraphSession(spark))
    val ws = new WsRepl(broker)
    val port = ws.start()
    def raw(bytes: Array[Byte]): Unit = {
      val s = new java.net.Socket("127.0.0.1", port)
      try {
        s.getOutputStream.write(bytes); s.getOutputStream.flush()
        s.setSoTimeout(2000)
        try { while (s.getInputStream.read() >= 0) () } // drain until close
        catch { case _: java.io.IOException => () }
      } finally s.close()
    }
    try {
      raw(Array[Byte](0, 1, 2, 3, -1, -2))                  // not HTTP at all
      raw("POST /api/repl HTTP/1.1\r\n\r\n".getBytes)       // wrong method
      raw("GET /api/repl HTTP/1.1\r\nHost: x".getBytes)     // cut mid-header
      raw(("GET /api/repl HTTP/1.1\r\nx: " + "a" * 20000).getBytes) // over 16k cap
      raw("GET /nope HTTP/1.1\r\nSec-WebSocket-Key: aaaa\r\n\r\n".getBytes)
      // upgrade properly, then abuse the frame layer
      val handshake = ("GET /api/repl HTTP/1.1\r\n" +
        "Sec-WebSocket-Key: ZHVtbXlrZXlkdW1teWtleQ==\r\n\r\n").getBytes
      raw(handshake ++ Array[Byte](-1, -1, -1, -1))         // junk frame header
      raw(handshake ++ Array[Byte](0x81.toByte, 0xff.toByte,
        0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f))    // 64-bit len >> cap
      raw(handshake ++ Array[Byte](0x81.toByte, 0x7e.toByte, 0x7f)) // truncated len16
      // the server is still healthy for a real client
      val c = new WsClient("127.0.0.1", port)
      assert(c.recvText(5000).exists(_.contains("REPL ready")))
      c.sendText("CREATE (n:Ping {k:'alive'}) RETURN n")
      assert(c.recvText(5000).exists(_.contains("alive")))
      c.close()
    } finally { ws.stop(); broker.stop() }
  }

  test("daemon_autosave_within_window_and_reload") {
    val dir = Files.createTempDirectory("graft_daemon").toString
    val session = new GraphSession(spark)
    val daemon = new Serve.Daemon(session, dir, autosaveSecs = 1, pollMs = 50)
    val (_, wsPort, _) = daemon.start()
    try {
      val c = new WsClient("127.0.0.1", wsPort)
      c.recvText(5000) // banner
      c.sendText("CREATE (:Person {name: 'Ada'})")
      assert(c.recvText().exists(_.contains("\"mutated\": true")))
      // the dirty flag must trigger a snapshot within the autosave window
      assert(awaitTrue(15000)(GraphStore.listVersions(dir).nonEmpty),
        "autosave did not produce a snapshot")
      c.close()
    } finally daemon.stop()
    // a fresh daemon on the same data dir reloads the active snapshot —
    // the durable-commit path a cluster deployment relies on after
    // losing localCheckpoint storage
    val s2 = new GraphSession(spark)
    new Serve.Daemon(s2, dir)
    assert(s2.nodeCount == 1)
    assert(s2.execute("MATCH (p:Person) RETURN p").rows
      .exists(_.properties.get("name").contains("Ada")))
  }
}
