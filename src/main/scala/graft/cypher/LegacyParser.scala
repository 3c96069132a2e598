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

  /** `{k:"v", k2:'w'}` → map; returns (map, restAfter). */
  def parseProps(s: String): (Map[String, String], String) = {
    val t = s.trim
    if (!t.startsWith("{")) return (Map.empty, t)
    var i = 1
    val m = Map.newBuilder[String, String]
    while (i < t.length && t(i) != '}') {
      while (i < t.length && (t(i).isWhitespace || t(i) == ',')) i += 1
      if (i < t.length && t(i) == '}') ()
      else {
        val keyStart = i
        while (i < t.length && t(i) != ':') i += 1
        if (i >= t.length) throw ParseException(s"bad props map: $s")
        val key = t.substring(keyStart, i).trim
        i += 1
        while (i < t.length && t(i).isWhitespace) i += 1
        val value =
          if (i < t.length && (t(i) == '"' || t(i) == '\'')) {
            val q = t(i); i += 1
            val st = i
            while (i < t.length && t(i) != q) i += 1
            if (i >= t.length) throw ParseException(s"unterminated string in props: $s")
            val v = t.substring(st, i); i += 1
            v
          } else {
            val st = i
            while (i < t.length && t(i) != ',' && t(i) != '}') i += 1
            t.substring(st, i).trim
          }
        if (key.nonEmpty) m += key -> value
      }
    }
    if (i >= t.length) throw ParseException(s"unterminated props map: $s")
    (m.result(), t.substring(i + 1).trim)
  }

  private val uuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r
  private val simpleUuidRe = "^[0-9a-fA-F]{32}$".r
  /** The reference parses ids with `Uuid::parse_str`, which accepts
    * BOTH the hyphenated and the simple 32-hex form and normalizes
    * them to one value — mirror by normalizing the simple form to
    * hyphenated lowercase so id equality behaves like parsed-Uuid
    * equality. */
  def requireUuid(s: String): String = {
    val t = s.trim
    if (uuidRe.findFirstIn(t).isDefined) t.toLowerCase
    else if (simpleUuidRe.findFirstIn(t).isDefined)
      (t.substring(0, 8) + "-" + t.substring(8, 12) + "-" + t.substring(12, 16) +
        "-" + t.substring(16, 20) + "-" + t.substring(20)).toLowerCase
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

  /** `Label {props}` (CREATE NODE / MATCH NODE bodies). */
  private def labelAndProps(rest: String): (String, Map[String, String], Seq[LegacyCond]) = {
    val (head, whereOpt) = splitWhere(rest)
    val t = head.trim
    val brace = t.indexOf('{')
    val (label, propsStr) =
      if (brace >= 0) (t.substring(0, brace).trim, t.substring(brace))
      else (t, "")
    val props = if (propsStr.nonEmpty) parseProps(propsStr)._1 else Map.empty[String, String]
    (label, props, whereOpt.map(parseWhere).getOrElse(Seq.empty))
  }

  def parse(stmt: String): LegacyCmd = {
    val s = stmt.trim
    val u = s.toUpperCase
    if (u.startsWith("CREATE NODE ")) {
      val (label, props, _) = labelAndProps(s.substring(12))
      if (label.isEmpty) throw ParseException("CREATE NODE requires a label")
      CreateNode(label, props)
    } else if (u.startsWith("CREATE REL ")) {
      // from=<uuid> to=<uuid> label=L {props}
      val rest = s.substring(11).trim
      val brace = rest.indexOf('{')
      val head = if (brace >= 0) rest.substring(0, brace) else rest
      val props = if (brace >= 0) parseProps(rest.substring(brace))._1 else Map.empty[String, String]
      var from = ""; var to = ""; var label = ""
      head.split("\\s+").foreach { tok =>
        val tu = tok.toUpperCase
        if (tu.startsWith("FROM=")) from = requireUuid(tok.substring(5))
        else if (tu.startsWith("TO=")) to = requireUuid(tok.substring(3))
        else if (tu.startsWith("LABEL=")) label = tok.substring(6)
      }
      if (from.isEmpty || to.isEmpty || label.isEmpty)
        throw ParseException("CREATE REL requires from=, to=, label=")
      CreateRel(from, to, label, props)
    } else if (u.startsWith("MATCH NODE")) {
      val (label, props, where) = labelAndProps(s.substring(10))
      // parse_label_and_props errors on an empty label — there is no
      // label-less legacy match (query_interface.rs:250-257)
      if (label.isEmpty) throw ParseException("missing label")
      MatchNode(Some(label), props, where)
    } else if (u.startsWith("MATCH REL")) {
      val (label, props, where) = labelAndProps(s.substring(9))
      if (label.isEmpty) throw ParseException("missing label")
      MatchRel(Some(label), props, where)
    } else if (u.startsWith("DELETE NODE ")) {
      DeleteNode(requireUuid(s.substring(12)))
    } else if (u.startsWith("DELETE REL ")) {
      DeleteRel(requireUuid(s.substring(11)))
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
    val matchPart = stmt.substring(matchPos + 6, mergePos).trim
    val mergePart = stmt.substring(mergePos + 7).trim

    val (patternsPart, whereOpt) = splitWhere(matchPart)
    val pats = patternsPart.split(",").map(_.trim).filter(_.nonEmpty)
    if (pats.length != 2) throw ParseException("exactly two node patterns are supported")
    def parseVarLabel(p: String): (String, String) = {
      if (!p.startsWith("(") || !p.endsWith(")")) throw ParseException(s"invalid node pattern: $p")
      val inside = p.substring(1, p.length - 1)
      val col = inside.indexOf(':')
      val (v, l) = if (col >= 0) (inside.substring(0, col).trim, inside.substring(col + 1).trim)
        else (inside.trim, "")
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
    val leftVar = mp.substring(1, leftEnd).trim
    val typeStart = mp.indexOf("[:", leftEnd) + 2
    val typeEnd = mp.indexOf(']', typeStart)
    val relType = mp.substring(typeStart, typeEnd).trim
    val arrow = mp.indexOf("->(", typeEnd)
    val rightVar = mp.substring(arrow + 3, mp.length - 1).trim
    def known(v: String): Unit =
      if (v != va && v != vb) throw ParseException(s"MERGE references unknown variable: $v")
    known(leftVar); known(rightVar)
    // validate direction mapping like the reference
    if (!((leftVar == va && rightVar == vb) || (leftVar == vb && rightVar == va)))
      throw ParseException("MERGE variable order does not match MATCH variables")

    PairwiseMerge(va, la, vb, lb, idCmp, relType, leftVar, rightVar)
  }
}
