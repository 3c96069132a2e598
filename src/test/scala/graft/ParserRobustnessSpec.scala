package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Parser
import graft.cypher.Parser.ParseException
import graft.engine.GraphSession

/** Zero-hole contract for the statement surface: ANY input string
  * either executes or fails with the typed ParseException — never an
  * internal-looking leak (IndexOutOfBounds from indexing past EOF,
  * NumberFormatException from a multi-dot numeric token, a saturated
  * overflow value tripping Spark's LIMIT+OFFSET check downstream).
  * The corpus is [[FuzzProbe]]'s deterministic generator (30 crafted
  * boundary shapes + 400 seeded mutations of valid queries), so a
  * failure here reproduces exactly under
  * `tools/run.sh graft.FuzzProbe`. Wider sweeps (8k+ mutations across
  * seeds) ran clean when this contract was introduced. */
class ParserRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("no input raises anything but ParseException") {
    val found = FuzzProbe.holes(new GraphSession(spark))
    assert(found.isEmpty, found.take(5).map { case (q, t) =>
      s"[${q.take(80)}] -> ${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(100)}"
    }.mkString("\n"))
  }

  test("eof mid-clause is a typed parse error") {
    for (q <- Seq("RETURN n LIMIT", "MATCH (a) RETURN a.",
        "MATCH (a) WHERE a.x CONTAINS", "MATCH (a) RETURN a SKIP"))
      assertThrows[ParseException](Parser.parse(q))
  }

  test("malformed and out-of-range numbers are typed parse errors") {
    for (q <- Seq("MATCH (a) RETURN a LIMIT 1.2.3",
        "MATCH (a) RETURN a SKIP 99999999999999999999",
        "MATCH (a)-[*1.>.3]->(b) RETURN b",
        // negative counts: the reference's usize parse rejects a sign,
        // and letting one through leaks Spark's internal
        // negative-limit/offset AnalysisException at execution
        "MATCH (a) RETURN a LIMIT -5",
        "MATCH (a) RETURN a SKIP -3",
        "MATCH (a)-[*-2..3]->(b) RETURN b"))
      assertThrows[ParseException](Parser.parse(q))
    // the long-standing truncation tolerance must survive the guard
    assert(Parser.parse("MATCH (a) RETURN a LIMIT 1.5") != null)
  }
}
