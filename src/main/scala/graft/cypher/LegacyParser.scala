package graft.cypher

import Ast._
import Ast.LegacyCmd._
import Ast.LegacyCond._

/** Parser for the legacy command dialect
  * (query_interface.rs:256-352, 530-660) and the legacy pairwise
  * MATCH..MERGE statement (query_interface.rs:368-528). String-level
  * parsing mirrors the reference's tolerance (UUID literals, bare
  * labels, quoted prop values).
  */
object LegacyParser {
  import Parser.ParseException

  /** parse_keyvals (query_interface.rs:305-318): comma-split
    * QUOTE-BLIND (a comma inside a quoted value splits — probed:
    * `k:"a,b"` yields k=a plus a stray `b"`-keyed part), each part
    * splitn(2, ':'); keys are only whitespace-trimmed (quotes and
    * emptiness survive — `:"v"` inserts key ""), values strip runs of
    * `"` then `'` per end (trim_matches, so the unpaired `k:Cv"` →
    * Cv); a part with no ':' is the one error; empty parts skip;
    * duplicate keys overwrite. */
  def parseKeyvals(s: String): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    s.split(",", -1).foreach { part =>
      val p = Parser.rustTrim(part)
      if (p.nonEmpty) {
        val i = p.indexOf(':')
        if (i < 0) throw ParseException(s"missing value for $p")
        val k = Parser.rustTrim(p.substring(0, i))
        val v = unquote(Parser.rustTrim(p.substring(i + 1)))
        m(k) = v
      }
    }
    m.toMap
  }

  /** parse_label_and_props (query_interface.rs:191-205): label is the
    * rust-trimmed text before the FIRST '{' (or the whole rest when
    * there is none — so a CREATE NODE label can swallow a whole WHERE
    * clause, probed), props sit between that '{' and the LAST '}'.
    * A missing '}' silently yields EMPTY props (no error, probed on
    * `{k:"v` → zero props), and text after the '}' is ignored. */
  def labelProps(rest: String): (String, Map[String, String]) = {
    var label = Parser.rustTrim(rest)
    var props = Map.empty[String, String]
    val idx = rest.indexOf('{')
    if (idx >= 0) {
      label = Parser.rustTrim(rest.substring(0, idx))
      val after = rest.substring(idx)
      val end = after.lastIndexOf('}')
      if (end >= 0) props = parseKeyvals(after.substring(1, end))
    }
    if (label.isEmpty) throw ParseException("missing label")
    (label, props)
  }

  // \A/\z anchors, NOT ^/$: findFirstIn's $ matches before a trailing
  // newline (the r10 rustNumRe bug class), and with requireUuid no
  // longer trimming (r11) a "<32hex>\n" input must reject like the
  // crate's exact-length dispatch does
  private val uuidRe = "\\A[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\z".r
  private val simpleUuidRe = "\\A[0-9a-fA-F]{32}\\z".r
  /** The reference parses ids with `Uuid::parse_str` (the uuid 1.x
    * crate's try_parse), which dispatches on exact length: simple
    * 32-hex, hyphenated 8-4-4-4-12, braced `{hyphenated}` (38 — the
    * inner form must be HYPHENATED, `{32hex}` is rejected), and
    * `urn:uuid:hyphenated` (45 — the crate's parser.rs matches the
    * prefix as LITERAL LOWERCASE bytes, so `URN:UUID:` is rejected;
    * r11 fix, the prefix is NOT case-insensitive). Hex digits are
    * case-insensitive via the crate's HEX_TABLE. try_parse does NOT
    * trim — whitespace handling belongs to each call site (only
    * parse_uuid_from, query_interface.rs:662, trims), so quoted padded
    * ids like `id = " <uuid> "` error in the reference. All four forms
    * normalize to one value — mirror by normalizing to hyphenated
    * lowercase so id equality behaves like parsed-Uuid equality. */
  def requireUuid(t: String): String = {
    def hyphen32(h: String): String =
      (h.substring(0, 8) + "-" + h.substring(8, 12) + "-" + h.substring(12, 16) +
        "-" + h.substring(16, 20) + "-" + h.substring(20)).toLowerCase
    if (uuidRe.findFirstIn(t).isDefined) t.toLowerCase
    else if (simpleUuidRe.findFirstIn(t).isDefined) hyphen32(t)
    else if (t.length == 38 && t.charAt(0) == '{' && t.charAt(37) == '}' &&
        uuidRe.findFirstIn(t.substring(1, 37)).isDefined)
      t.substring(1, 37).toLowerCase
    else if (t.length == 45 && t.startsWith("urn:uuid:") &&
        uuidRe.findFirstIn(t.substring(9)).isDefined)
      t.substring(9).toLowerCase
    else throw ParseException(s"invalid uuid: $t")
  }

  /** The AND scan of parse_where_conds (query_interface.rs:269-296):
    * byte-wise and quote-BLIND, boundaries are whitespace-or-')' before
    * and whitespace-or-'(' after (so `,AND,` does NOT split — probed:
    * `name="x,AND,y"` stays one condition). Like the Cypher
    * split_where_and, the reference slices `&s[i..i+3]` at every
    * position, so any multi-byte UTF-8 char panics it (probed:
    * `name="café"` dies even though quoted — there is no quote
    * exemption here); our contract maps that panic to the typed error.
    * The prev/next chars are provably ASCII whenever AND matches (a
    * multi-byte neighbor always hits an earlier panic window first), so
    * byte checks suffice. */
  private def splitAndConds(s: String): Seq[String] = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    def boundary(idx: Int): Boolean = idx >= n || (bytes(idx) & 0xC0) != 0x80
    // char::is_whitespace on an ASCII char: 0x09-0x0D (incl. 0x0B) + space
    def ws(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0D)
    def sub(a: Int, b: Int): String =
      new String(bytes, a, b - a, java.nio.charset.StandardCharsets.UTF_8)
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < n) {
      var split = false
      if (i + 3 <= n) {
        // the reference slices s[i..i+3] here, before any comparison
        if (!boundary(i) || !boundary(i + 3))
          throw ParseException(s"invalid WHERE conditions: $s")
        val isAnd = (bytes(i) | 0x20) == 'a'.toByte &&
          (bytes(i + 1) | 0x20) == 'n'.toByte &&
          (bytes(i + 2) | 0x20) == 'd'.toByte
        if (isAnd &&
            (i == 0 || ws(bytes(i - 1)) || bytes(i - 1) == ')'.toByte) &&
            (i + 3 >= n || ws(bytes(i + 3)) || bytes(i + 3) == '('.toByte)) {
          out += Parser.rustTrim(sub(start, i))
          i += 3
          start = i
          split = true
        }
      }
      if (!split) i += 1
    }
    out += Parser.rustTrim(sub(start, n))
    out.result()
  }

  /** Rust's str::trim_matches(c): strip ALL leading and ALL trailing
    * occurrences of c, each end independently — `""v""` → v and the
    * asymmetric `"v` → v both strip (probed: `WHERE name="Ada` matches
    * the Ada node in the reference). */
  private def trimMatches(s: String, c: Char): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == c) a += 1
    while (b > a && s.charAt(b - 1) == c) b -= 1
    s.substring(a, b)
  }

  private def unquote(s: String): String = trimMatches(trimMatches(s, '"'), '\'')

  /** Legacy WHERE: AND-separated conditions (query_interface.rs:298-352).
    * The reference dispatches on the TRIMMED key after splitting at the
    * comparator, so spaced forms (`id = x`, `label = L`) still hit the
    * id/label/from/to branches; HAS/label/meta values strip runs of `"`
    * then `'` (trim_matches), uuid values strip only `"`; `!=` on
    * id/label/from/to is an explicit error. */
  def parseWhere(s: String): Seq[LegacyCond] =
    splitAndConds(s).filter(_.nonEmpty).map { c =>
      val u = Parser.upperAscii(c)
      if (u.startsWith("HAS(") && c.endsWith(")")) {
        val key = unquote(Parser.rustTrim(c.substring(4, c.length - 1)))
        if (key.isEmpty) throw ParseException("WHERE has() requires a key")
        HasKey(key)
      } else if (c.contains("!=")) {
        val i = c.indexOf("!=")
        val key = Parser.rustTrim(c.substring(0, i))
        if (Seq("id", "label", "from", "to").exists(key.equalsIgnoreCase))
          throw ParseException("'!=' supported only for metadata keys")
        if (key.isEmpty) throw ParseException("missing key before !=")
        KeyNe(key, unquote(Parser.rustTrim(c.substring(i + 2))))
      } else if (c.contains("=")) {
        val i = c.indexOf("=")
        val key = Parser.rustTrim(c.substring(0, i))
        val raw = Parser.rustTrim(c.substring(i + 1))
        if (key.equalsIgnoreCase("id")) IdEq(requireUuid(trimMatches(raw, '"')))
        else if (key.equalsIgnoreCase("from")) FromEq(requireUuid(trimMatches(raw, '"')))
        else if (key.equalsIgnoreCase("to")) ToEq(requireUuid(trimMatches(raw, '"')))
        else if (key.equalsIgnoreCase("label")) LabelEq(unquote(raw))
        else if (key.isEmpty) throw ParseException("missing key before =")
        else KeyEq(key, unquote(raw))
      } else throw ParseException(s"unrecognized WHERE condition: $c")
    }

  /** split_where (query_interface.rs:223-238): ` WHERE ` first, then
    * the unspaced ` WHERE` fallback — so `Person WHEREid=x` parses and
    * a trailing ` WHERE` yields no conditions. Quote-blind, like the
    * reference; offsets computed on a length-preserving uppercase. */
  private def splitWhere(s: String): (String, Option[String]) = {
    val up = Parser.upperAscii(s)
    val i7 = up.indexOf(" WHERE ")
    val (i, kwLen) =
      if (i7 >= 0) (i7, 7)
      else {
        val i6 = up.indexOf(" WHERE")
        if (i6 >= 0) (i6, 6) else (-1, 0)
      }
    if (i < 0) (Parser.rustTrim(s), None)
    else {
      val tail = Parser.rustTrim(s.substring(i + kwLen))
      (Parser.rustTrim(s.substring(0, i)), if (tail.isEmpty) None else Some(tail))
    }
  }

  /** MATCH NODE / MATCH REL body: split_where FIRST (quote-blind),
    * label+props from the head, conds from the tail — in that error
    * order (exec_match_node, query_interface.rs:523-536). */
  private def labelAndProps(rest: String): (String, Map[String, String], Seq[LegacyCond]) = {
    val (head, whereOpt) = splitWhere(rest)
    val (label, props) = labelProps(head)
    (label, props, whereOpt.map(parseWhere).getOrElse(Seq.empty))
  }

  /** Rust's str::split_whitespace — Unicode-whitespace separated,
    * empties skipped (Java's \\s regex is ASCII-only and would keep a
    * U+00A0-joined token whole where the reference splits it). */
  private def splitWhitespace(s: String): Seq[String] = {
    def ws(c: Char): Boolean =
      Character.isSpaceChar(c) || (c >= 0x09 && c <= 0x0D) || c == 0x85
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && ws(s.charAt(i))) i += 1
      val st = i
      while (i < s.length && !ws(s.charAt(i))) i += 1
      if (i > st) out += s.substring(st, i)
    }
    out.result()
  }

  def parse(stmt: String): LegacyCmd = {
    val s = Parser.rustTrim(stmt)
    val u = s.toUpperCase
    if (u.startsWith("CREATE NODE ")) {
      // exec_create_node (query_interface.rs:481-490): NO WHERE split —
      // a trailing WHERE clause becomes part of the label (probed)
      val (label, props) = labelProps(s.substring(12))
      CreateNode(label, props)
    } else if (u.startsWith("CREATE REL ")) {
      // exec_create_rel (query_interface.rs:492-521): props need BOTH
      // braces (else the brace text joins the token scan); text after
      // the last '}' is dropped entirely; a '}' BEFORE the '{' panics
      // the reference's slice (typed error here); an empty `label=`
      // value is accepted; each missing part has its own error, checked
      // from → to → label after uuid parse errors fire in token order.
      var cursor = Parser.rustTrim(s.substring(11))
      var props = Map.empty[String, String]
      val bi = cursor.indexOf('{')
      if (bi >= 0) {
        val end = cursor.lastIndexOf('}')
        if (end >= 0) {
          if (end < bi + 1) throw ParseException(s"invalid properties block: $cursor")
          props = parseKeyvals(cursor.substring(bi + 1, end))
          cursor = cursor.substring(0, bi)
        }
      }
      var from: Option[String] = None
      var to: Option[String] = None
      var label: Option[String] = None
      splitWhitespace(cursor).foreach { tok =>
        val tu = tok.toUpperCase
        if (tu.startsWith("FROM=")) from = Some(requireUuid(tok.substring(5)))
        else if (tu.startsWith("TO=")) to = Some(requireUuid(tok.substring(3)))
        else if (tu.startsWith("LABEL=")) label = Some(tok.substring(6))
      }
      val f = from.getOrElse(throw ParseException("missing from uuid"))
      val t = to.getOrElse(throw ParseException("missing to uuid"))
      val l = label.getOrElse(throw ParseException("missing label"))
      CreateRel(f, t, l, props)
    } else if (u.startsWith("MATCH NODE ")) {
      val (label, props, where) = labelAndProps(s.substring(11))
      MatchNode(Some(label), props, where)
    } else if (u.startsWith("MATCH REL ")) {
      val (label, props, where) = labelAndProps(s.substring(10))
      MatchRel(Some(label), props, where)
    } else if (u.startsWith("DELETE NODE ")) {
      // parse_uuid_from (query_interface.rs:662) is the ONE uuid call
      // site that trims before Uuid::parse_str
      DeleteNode(requireUuid(Parser.rustTrim(s.substring(12))))
    } else if (u.startsWith("DELETE REL ")) {
      DeleteRel(requireUuid(Parser.rustTrim(s.substring(11))))
    } else throw ParseException(s"unrecognized statement: $stmt")
  }

  /** Legacy pairwise `MATCH (a:L),(b:L) [WHERE id(a) op id(b)] MERGE
    * (a)-[:T]->(b)` — faithful to query_interface.rs:372-528 including
    * its restrictions (two labeled patterns, id() comparators only). */
  def parsePairwiseMerge(stmt: String): PairwiseMerge = {
    val up = stmt.toUpperCase
    val matchPos = up.indexOf("MATCH ")
    if (matchPos < 0) throw ParseException("invalid MATCH/MERGE statement")
    val mergePos = up.lastIndexOf(" MERGE ")
    if (mergePos < 0 || mergePos <= matchPos) throw ParseException("MATCH ... MERGE ... required")
    val matchPart = Parser.rustTrim(stmt.substring(matchPos + 6, mergePos))
    val mergePart = Parser.rustTrim(stmt.substring(mergePos + 7))

    val (patternsPart, whereOpt) = splitWhere(matchPart)
    // query_interface.rs:384-388: the reference walks the ','-split as an
    // iterator (empty segments KEPT — Rust split never drops them, so the
    // -1 limit here), failing "missing second pattern" on one segment and
    // "only two node patterns are supported" on three or more, BEFORE any
    // per-pattern validation runs
    val pats = patternsPart.split(",", -1).map(Parser.rustTrim(_))
    if (pats.length < 2) throw ParseException("missing second pattern")
    if (pats.length > 2) throw ParseException("only two node patterns are supported")
    def parseVarLabel(p: String): (String, String) = {
      if (!p.startsWith("(") || !p.endsWith(")")) throw ParseException(s"invalid node pattern: $p")
      val inside = p.substring(1, p.length - 1)
      val col = inside.indexOf(':')
      val (v, l) = if (col >= 0) (Parser.rustTrim(inside.substring(0, col)), Parser.rustTrim(inside.substring(col + 1)))
        else (Parser.rustTrim(inside), "")
      if (v.isEmpty) throw ParseException("variable name required in node pattern")
      (v, l)
    }
    val (va, la) = parseVarLabel(pats(0))
    val (vb, lb) = parseVarLabel(pats(1))
    if (la.isEmpty || lb.isEmpty) throw ParseException("labels required in MATCH node patterns")

    val idCmp = whereOpt.map { w =>
      val wu = w.replace(" ", "")
      val sym =
        if (wu.contains("<=")) "<=" else if (wu.contains(">=")) ">="
        else if (wu.contains("<>")) "<>" else if (wu.contains("<")) "<"
        else if (wu.contains(">")) ">" else if (wu.contains("=")) "="
        else throw ParseException("unsupported WHERE comparator; use <,>,<=,>=,=,<>")
      val parts = wu.split(java.util.regex.Pattern.quote(sym))
      if (parts.length != 2) throw ParseException("malformed WHERE clause")
      def idVar(x: String): String = {
        if (!x.toUpperCase.startsWith("ID(") || !x.endsWith(")"))
          throw ParseException("WHERE must use id(var)")
        val v = x.substring(3, x.length - 1)
        if (v.isEmpty) throw ParseException("empty variable in id()")
        v
      }
      (idVar(parts(0)), sym, idVar(parts(1)))
    }

    // MERGE pattern: (x)-[:TYPE]->(y)
    val mp = mergePart
    if (!mp.startsWith("(") || !mp.toUpperCase.contains(")-[:") ||
        !mp.toUpperCase.contains("]->(") || !mp.endsWith(")"))
      throw ParseException("unsupported MERGE pattern; expected (a)-[:TYPE]->(b)")
    val leftEnd = mp.indexOf(')')
    val leftVar = Parser.rustTrim(mp.substring(1, leftEnd))
    val typeStart = mp.indexOf("[:", leftEnd) + 2
    val typeEnd = mp.indexOf(']', typeStart)
    val relType = Parser.rustTrim(mp.substring(typeStart, typeEnd))
    val arrow = mp.indexOf("->(", typeEnd)
    val rightVar = Parser.rustTrim(mp.substring(arrow + 3, mp.length - 1))
    def known(v: String): Unit =
      if (v != va && v != vb) throw ParseException(s"MERGE references unknown variable: $v")
    known(leftVar); known(rightVar)
    // validate direction mapping like the reference
    if (!((leftVar == va && rightVar == vb) || (leftVar == vb && rightVar == va)))
      throw ParseException("MERGE variable order does not match MATCH variables")

    PairwiseMerge(va, la, vb, lb, idCmp, relType, leftVar, rightVar)
  }
}
