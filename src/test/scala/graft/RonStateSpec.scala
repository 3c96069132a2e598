package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.PropertyGraph
import graft.io.{GraphStore, RonState}

/** `state.ron` migration path (persistence/persist.rs:100-147):
  * parse the reference's pretty RON output shape, render a
  * reference-loadable document, and round-trip a graph through
  * export→import with full fidelity. */
class RonStateSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  /** A fixture in the shape `ron::ser::to_string_pretty` emits with
    * `separate_tuple_members(true).enumerate_arrays(true)` — including
    * the `/*[i]*/` index comments, trailing commas, string escapes, an
    * empty metadata map, and (for tolerance) a struct-name prefix plus
    * a line comment. */
  val fixture: String =
    """// saved by graph-loom
      |AppStateFile(
      |    db: (
      |        nodes: {
      |            "0192aa-01": (
      |                id: "0192aa-01",
      |                label: "Person",
      |                metadata: {
      |                    "name": "Ada @Q@the first@Q@",
      |                    "bio": "line1@NL@line2@TAB@tabbed @U@",
      |                },
      |            ),
      |            "0192aa-02": (
      |                id: "0192aa-02",
      |                label: "",
      |                metadata: {},
      |            ),
      |        },
      |        relationships: {
      |            "0192bb-01": (
      |                id: "0192bb-01",
      |                from_node: "0192aa-01",
      |                to_node: "0192aa-02",
      |                label: "KNOWS",
      |                metadata: {
      |                    "since": "1843",
      |                },
      |            ),
      |        },
      |    ),
      |    node_positions: [
      |        /*[0]*/ (
      |            "0192aa-01",
      |            12.5,
      |            -3.0,
      |        ),
      |        /*[1]*/ (
      |            "0192aa-02",
      |            0.0,
      |            100.25,
      |        ),
      |    ],
      |    pan: (
      |        -7.5,
      |        2.0,
      |    ),
      |    zoom: 1.75,
      |)
      |""".stripMargin
      // splice the RON escape sequences in at runtime — Scala's lexer
      // would otherwise mangle \u inside the literal
      .replace("@Q@", "\\\"").replace("@NL@", "\\n")
      .replace("@TAB@", "\\t").replace("@U@", "\\" + "u{e9}")

  test("parse_reference_pretty_output_shape") {
    val st = RonState.parseState(fixture)
    assert(st.nodes.map(_.id).sorted == Vector("0192aa-01", "0192aa-02"))
    val ada = st.nodes.find(_.id == "0192aa-01").get
    assert(ada.label == "Person")
    assert(ada.metadata("name") == "Ada \"the first\"")
    assert(ada.metadata("bio") == "line1\nline2\ttabbed é")
    assert(st.nodes.find(_.id == "0192aa-02").get.metadata.isEmpty)
    val rel = st.rels.head
    assert(rel.from == "0192aa-01" && rel.to == "0192aa-02" && rel.label == "KNOWS")
    assert(st.nodePositions == Vector(
      ("0192aa-01", 12.5f, -3.0f), ("0192aa-02", 0.0f, 100.25f)))
    assert(st.pan == ((-7.5f, 2.0f)) && st.zoom == 1.75f)
  }

  test("render_parse_roundtrip_is_identity") {
    val st = RonState.parseState(fixture)
    val rendered = RonState.renderState(st)
    val back = RonState.parseState(rendered)
    assert(back.nodes.sortBy(_.id) == st.nodes.sortBy(_.id))
    assert(back.rels.sortBy(_.id) == st.rels.sortBy(_.id))
    // layout fields survive the round trip exactly
    assert(back.nodePositions == st.nodePositions)
    assert(back.pan == st.pan && back.zoom == st.zoom)
    // a second render is byte-stable
    assert(RonState.renderState(back) ==
      RonState.renderState(RonState.parseState(RonState.renderState(back))))
  }

  test("graph_export_import_full_fidelity") {
    val g = PropertyGraph(
      PropertyGraph.nodesDf(spark, Seq(
        ("n1", "Person", Map("name" -> "Ada", "quote" -> "a\"b\\c")),
        ("n2", "City", Map.empty[String, String]))),
      PropertyGraph.edgesDf(spark, Seq(
        ("e1", "n1", "n2", "LIVES_IN", Map("since" -> "1840"))))
    )
    val path = java.nio.file.Files.createTempDirectory("ron_mig")
      .resolve("state.ron").toString
    GraphStore.exportRon(g, path)
    val loaded = GraphStore.importRon(spark, path)
    val nodes = loaded.nodes.collect().map(r =>
      (r.getString(0), r.getString(1), r.getMap[String, String](2).toMap)).toSet
    val edges = loaded.edges.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getMap[String, String](4).toMap)).toSet
    assert(nodes == Set(
      ("n1", "Person", Map("name" -> "Ada", "quote" -> "a\"b\\c")),
      ("n2", "City", Map.empty[String, String])))
    assert(edges == Set(("e1", "n1", "n2", "LIVES_IN", Map("since" -> "1840"))))
    // imported graph passes referential integrity
    assert(loaded.danglingEdges.count() == 0)
  }

  test("render_parse_roundtrip_property_adversarial_strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic sampling (same pattern as EnginePropertySpec)
    def samples[A](gen: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))
    val nasty = Gen.listOfN(6, Gen.frequency(
      5 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('"', '\\', '\n', '\t', '\r', 'é', '→', ' ', ':', ',', '(', ')', '{', '}')))
      .map(_.mkString)
    val meta = Gen.mapOf(Gen.zip(nasty, nasty)).map(_.take(3))
    val nodeGen = Gen.zip(Gen.uuid.map(_.toString), nasty, meta)
      .map { case (id, l, m) => RonState.RonNode(id, l, m) }
    val stateGen = for {
      nodes <- Gen.listOfN(4, nodeGen)
      dedup = nodes.groupBy(_.id).map(_._2.head).toVector
      relLabel <- nasty
      relMeta <- meta
    } yield RonState.RonGraphState(
      dedup,
      if (dedup.size < 2) Vector.empty
      else Vector(RonState.RonRel("r-1", dedup(0).id, dedup(1).id, relLabel, relMeta)),
      dedup.map(n => (n.id, -1.5f, 2.25f)),
      (0.5f, -0.25f), 3.5f)
    samples(stateGen, 60).foreach { st =>
      val back = RonState.parseState(RonState.renderState(st))
      assert(back.nodes.sortBy(_.id) == st.nodes.sortBy(_.id))
      assert(back.rels == st.rels)
      assert(back.nodePositions.sortBy(_._1) == st.nodePositions.sortBy(_._1))
      assert(back.pan == st.pan && back.zoom == st.zoom)
    }
  }

  test("parser_rejects_malformed_documents") {
    intercept[Exception](RonState.parseState("(db: oops)"))
    intercept[Exception](RonState.parseState("(,)"))
    intercept[Exception](RonState.parse("""(a: "unterminated)"""))
    // key/id mismatch is a loud error, not silent repair
    intercept[Exception](RonState.parseState(
      """(db: (nodes: {"k": (id: "other", label: "", metadata: {})},
        |relationships: {}), node_positions: [], pan: (0.0, 0.0), zoom: 1.0)""".stripMargin))
  }
}
