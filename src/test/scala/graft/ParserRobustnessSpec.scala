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

  // Statements cut mid-clause inside a RETURN/WHERE body are NOT
  // errors in the reference — the string slicer folds the stub into a
  // never-resolving item ("a." reads property "" → zero rows) or a
  // fail-open unknown condition (dangling CONTAINS passes every row).
  // Only a statement-LEADING stub still errors (no RETURN-first branch).
  test("eof mid-clause folds into junk items or fail-open conds") {
    assertThrows[ParseException](Parser.parse("RETURN n LIMIT"))
    val s = new GraphSession(spark)
    s.execute("CREATE (:Eof {k:'v'})")
    assert(s.execute("MATCH (a:Eof) RETURN a.").rows.isEmpty)
    assert(s.execute("MATCH (a:Eof) WHERE a.x CONTAINS").rows.length == 1)
  }

  // SKIP/LIMIT counts are peeled from the END of the statement text in
  // the reference (cypher_spec.rs:490-506): a count that fails the
  // usize parse is NOT an error — the unpeeled text folds into the
  // RETURN/WITH items as a property name that never resolves, so the
  // statement silently yields ZERO rows (adjudicated against the
  // reference executor). Var-length hop bounds are different: those
  // usize parses ERROR ("invalid min/max", parse_rel_pattern).
  test("malformed skip_limit counts garble to zero rows, hop bounds error") {
    val s = new graft.engine.GraphSession(spark)
    s.execute("CREATE (:Gb {k:'x'})")
    for (q <- Seq(
        "MATCH (a:Gb) RETURN a LIMIT 1.2.3",
        "MATCH (a:Gb) RETURN a SKIP 99999999999999999999",
        "MATCH (a:Gb) RETURN a LIMIT -5",
        "MATCH (a:Gb) RETURN a SKIP -3",
        "MATCH (a:Gb) RETURN a LIMIT 1.5", // decimals garble too
        "MATCH (a:Gb) RETURN a SKIP"))     // dangling count: no peel
      assert(s.execute(q).rows.isEmpty, q)
    // sanity: the same query with a clean count returns the node
    assert(s.execute("MATCH (a:Gb) RETURN a LIMIT 1").rows.length == 1)
    // values past Int.MaxValue saturate (usize accepts them; the cap
    // makes them effectively unbounded on both sides)
    assert(s.execute("MATCH (a:Gb) RETURN a LIMIT 5000000000").rows.length == 1)
    // hop-range bounds: malformed or negative values are parse errors
    for (q <- Seq("MATCH (a)-[*1.>.3]->(b) RETURN b",
        "MATCH (a)-[*-2..3]->(b) RETURN b",
        "MATCH (a)-[*1.5..2]->(b) RETURN b"))
      assertThrows[ParseException](Parser.parse(q))
  }

  // a statement cannot LEAD with RETURN — the reference's parse falls
  // through to "Unsupported or unrecognized Cypher statement"
  test("return_first_statement_is_unsupported") {
    val e = intercept[ParseException](Parser.parse("RETURN 'hello'"))
    assert(e.getMessage.contains("Unsupported or unrecognized"))
  }
}
