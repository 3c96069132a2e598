package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.EngineBroker
import graft.engine.{GraphSession, QueryOutcome}

/** The broker's single engine thread is the daemon's heart — if one
  * request kills it, every later API call times out while the queue
  * grows without bound: a silently bricked server. `NonFatal` does NOT
  * match StackOverflowError / OutOfMemoryError, and a pathological
  * query (deep lineage, a huge literal list, an executor-side error
  * rethrown as an Error) can raise exactly those on the engine thread.
  * This spec pins the survivability contract: a fatal per-query error
  * is answered as Left and the SAME thread keeps draining; a
  * deliberate stop() still stops. */
class BrokerResilienceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Stub session: magic query strings raise synthetic fatal errors
    * (nothing is actually exhausted); anything else answers canned. */
  private def stubSession() = new GraphSession(spark) {
    override def execute(query: String): QueryOutcome =
      executeWithParams(query, Map.empty)
    override def executeWithParams(query: String,
        params: Map[String, String]): QueryOutcome = query match {
      case "boom_soe" => throw new StackOverflowError("synthetic overflow")
      case "boom_oom" => throw new OutOfMemoryError("synthetic oom")
      case "boom_npe" => throw new NullPointerException("plain nonfatal")
      case _          => QueryOutcome(Nil, 0L, 0L, mutated = false)
    }
  }

  test("engine thread survives fatal per-query errors and keeps serving") {
    val broker = new EngineBroker(stubSession())
    broker.start()
    try {
      assert(broker.execute("ok", None, 10).contains(Right(
        QueryOutcome(Nil, 0L, 0L, mutated = false))))
      // each fatal flavor answers the CLIENT (no timeout) with Left...
      assert(broker.execute("boom_soe", None, 10)
        .exists(_.swap.exists(_.contains("synthetic overflow"))))
      assert(broker.execute("boom_oom", None, 10)
        .exists(_.swap.exists(_.contains("synthetic oom"))))
      assert(broker.execute("boom_npe", None, 10)
        .exists(_.swap.exists(_.contains("plain nonfatal"))))
      // ...and the SAME drainer still answers healthy traffic after
      assert(broker.execute("ok", None, 10).exists(_.isRight))
    } finally broker.stop()
  }

  test("unwritable query log never flips a query's answer") {
    // log dir "under" a regular file = every mkdir and append fails;
    // reference parity (`let _ = write_all`, query_interface.rs:50):
    // logging is observability, so the query must still answer Right
    val f = java.nio.file.Files.createTempFile("graft-notadir", ".tmp")
    val badDir = f.resolve("logs").toString
    new graft.io.QueryLog(badDir, "queries").append("must not throw")
    val broker = new EngineBroker(stubSession(), logDir = Some(badDir))
    broker.start()
    try assert(broker.execute("ok", None, 10).exists(_.isRight))
    finally broker.stop()
  }

  test("concurrent clients all get answers and mutations linearize") {
    // 8 client threads x 25 requests against the ONE engine thread:
    // every request must get SOME answer (no lost respond callbacks,
    // no cross-talk), and the serialized CREATEs must all land —
    // the linearization contract the single-engine-thread design
    // exists to provide (every API transport funnels through here)
    val session = new GraphSession(spark)
    val broker = new EngineBroker(session)
    broker.start()
    try {
      val nThreads = 8; val perThread = 25
      val missed = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          for (i <- 0 until perThread) {
            val q =
              if (i % 5 == 4) s"MATCH (n:Stress) RETURN n LIMIT 1"
              else s"CREATE (:Stress {tag: 't${t}_$i'})"
            broker.execute(q, None, 120) match {
              case None          => missed.incrementAndGet()
              case Some(Left(_)) => errs.incrementAndGet()
              case Some(Right(_)) => ()
            }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(300000))
      assert(missed.get() == 0, s"${missed.get()} requests timed out")
      assert(errs.get() == 0, s"${errs.get()} requests errored")
      val nCreated = nThreads * perThread - nThreads * (perThread / 5)
      assert(session.graph.nodeCount == nCreated,
        s"expected $nCreated Stress nodes, got ${session.graph.nodeCount}")
    } finally broker.stop()
  }

  test("deliberate stop() is final — no self-heal past it") {
    val broker = new EngineBroker(stubSession())
    broker.start()
    assert(broker.execute("ok", None, 10).exists(_.isRight))
    broker.stop()
    // post-stop the request must time out (thread gone, not restarted)
    assert(broker.execute("ok", None, 1).isEmpty)
  }
}
