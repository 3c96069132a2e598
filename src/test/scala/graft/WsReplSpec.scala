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
