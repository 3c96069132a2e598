package graft.cypher

import Ast._

/** Recursive-descent parser for the reference's pragmatic OpenCypher
  * subset (grammar behaviors from cypher_spec.rs:333-736 — reproduced
  * as a real tokenizer + grammar instead of keyword-boundary string
  * slicing).
  *
  * Accepted surface (superset only in case-insensitive keywords):
  * MATCH / OPTIONAL MATCH multi-path patterns, WHERE AND-conjunctions
  * (id/prop comparators, CONTAINS, STARTS WITH, ENDS WITH), WITH,
  * CREATE, MERGE, SET (prop and label forms, comma list), REMOVE,
  * DELETE / DETACH DELETE, RETURN [DISTINCT] items ORDER BY/SKIP/LIMIT,
  * `$param` values, `(n.Label)` shorthand, `[:T*min..max]` var-length.
  */
object Parser {

  case class ParseException(msg: String) extends Exception(msg)

  // ------------------------------ lexer ---------------------------------
  sealed trait Tok
  object Tok {
    case class Ident(s: String) extends Tok
    case class Str(s: String) extends Tok
    case class Num(s: String) extends Tok
    case class Param(name: String) extends Tok
    case class Sym(s: String) extends Tok // ( ) [ ] { } : , . - > < = <> <= >= * !=
  }

  def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        // openCypher escape semantics for the standard set; anything
        // else keeps BOTH characters (the reference never unescapes —
        // trim_quotes in cypher_spec.rs:85 strips outer quotes only —
        // so raw preservation is the compatible fallback; the old
        // behavior of dropping the backslash corrupted '\n' to 'n')
        while (i < n && q(i) != quote) {
          if (q(i) == '\\' && i + 1 < n) {
            q(i + 1) match {
              case 'n'  => sb.append('\n')
              case 't'  => sb.append('\t')
              case 'r'  => sb.append('\r')
              case '\\' => sb.append('\\')
              case '\'' => sb.append('\'')
              case '"'  => sb.append('"')
              case 'u' if i + 5 < n &&
                  q.substring(i + 2, i + 6).forall(h =>
                    Character.digit(h, 16) >= 0) =>
                sb.append(Integer.parseInt(q.substring(i + 2, i + 6), 16).toChar)
                i += 4
              // includes malformed \\u (short or non-hex): keep raw,
              // don't throw a bare NumberFormatException at the user
              case other => sb.append('\\').append(other)
            }
            i += 2
          } else { sb.append(q(i)); i += 1 }
        }
        if (i >= n) throw ParseException(s"unterminated string literal")
        i += 1
        out += Tok.Str(sb.toString)
      } else if (c == '$') {
        val start = i + 1
        var j = start
        while (j < n && (q(j).isLetterOrDigit || q(j) == '_')) j += 1
        if (j == start) throw ParseException("empty parameter name after $")
        out += Tok.Param(q.substring(start, j)); i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (q(j).isLetterOrDigit || q(j) == '_')) j += 1
        out += Tok.Ident(q.substring(i, j)); i = j
      } else if (c.isDigit ||
          (c == '-' && i + 1 < n && q(i + 1).isDigit)) {
        // '-' directly followed by a digit is a negative literal, never
        // a relationship dash (patterns follow '-' with '[', '(' or
        // '>'); the reference accepts '-1' as a bareword value, so
        // rejecting it here broke {score: -1} and `> -5` compares
        var j = if (c == '-') i + 1 else i
        while (j < n && (q(j).isDigit || q(j) == '.')) j += 1
        // "1..3" inside var-length: don't swallow '..' into the number
        var s = q.substring(i, j)
        if (s.contains("..")) { val k = s.indexOf(".."); s = s.substring(0, k); j = i + k }
        out += Tok.Num(s); i = j
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (two == "<=" || two == ">=" || two == "<>" || two == "!=" || two == "..") {
          out += Tok.Sym(two); i += 2
        } else if ("()[]{}:,.->< =*".indexOf(c) >= 0) {
          out += Tok.Sym(c.toString); i += 1
        } else throw ParseException(s"unexpected character '$c'")
      }
    }
    out.result()
  }

  // ------------------------------ parser --------------------------------
  private class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    // EOF here is a USER error (a statement cut mid-clause: `LIMIT`,
    // `CONTAINS`, a dangling `a.`), so it must surface as the typed
    // ParseException every API transport maps cleanly — not the
    // IndexOutOfBoundsException raw indexing would leak
    def next(): Tok =
      if (pos < toks.length) { val t = toks(pos); pos += 1; t }
      else throw ParseException("unexpected end of query")
    def eof: Boolean = pos >= toks.length

    def isKw(t: Tok, kw: String): Boolean = t match {
      case Tok.Ident(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def peekKw(kw: String): Boolean = peek.exists(isKw(_, kw))
    def peekKw2(kw1: String, kw2: String): Boolean =
      peekKw(kw1) && pos + 1 < toks.length && isKw(toks(pos + 1), kw2)
    def expectKw(kw: String): Unit =
      if (!peekKw(kw)) throw ParseException(s"expected $kw at $describe") else pos += 1
    def expectSym(s: String): Unit = peek match {
      case Some(Tok.Sym(x)) if x == s => pos += 1
      case _ => throw ParseException(s"expected '$s' at $describe")
    }
    def peekSym(s: String): Boolean = peek.exists { case Tok.Sym(x) => x == s; case _ => false }
    def tryTakeSym(s: String): Boolean = if (peekSym(s)) { pos += 1; true } else false
    def describe: String = peek.map(_.toString).getOrElse("<eof>")

    def ident(): String = next() match {
      case Tok.Ident(s) => s
      case t => throw ParseException(s"expected identifier, got $t")
    }

    val clauseKws = Set("MATCH", "OPTIONAL", "WHERE", "WITH", "CREATE", "MERGE",
      "SET", "REMOVE", "DELETE", "DETACH", "RETURN", "ORDER", "SKIP", "LIMIT")
    def atClauseBoundary: Boolean = peek.exists {
      case Tok.Ident(s) => clauseKws.contains(s.toUpperCase)
      case _ => false
    }

    def propValue(): PropValue = next() match {
      case Tok.Str(s) => PropValue.Lit(s)
      case Tok.Num(s) => PropValue.Lit(s)
      case Tok.Param(p) => PropValue.Param(p)
      case Tok.Ident(s) => PropValue.Lit(s) // bareword value
      case t => throw ParseException(s"expected value, got $t")
    }

    def propMap(): Map[String, PropValue] = {
      expectSym("{")
      val m = Map.newBuilder[String, PropValue]
      var first = true
      while (!peekSym("}")) {
        if (!first) expectSym(",")
        first = false
        if (peekSym("}")) () // trailing comma tolerance
        else {
          val k = ident(); expectSym(":")
          m += k -> propValue()
        }
      }
      expectSym("}")
      m.result()
    }

    /** `(var[:Label[:More]] [{props}])` or `(var.Label)` or `(:Label)`. */
    def nodePattern(): NodePattern = {
      expectSym("(")
      var variable: Option[String] = None
      var label: Option[String] = None
      peek match {
        case Some(Tok.Ident(_)) => variable = Some(ident())
        case _ =>
      }
      if (tryTakeSym(":")) {
        // label may itself contain ':' — the reference splits on the
        // FIRST ':' only, so (:A:B) stores literal label "A:B"
        val sb = new StringBuilder(ident())
        while (tryTakeSym(":")) { sb.append(':'); sb.append(ident()) }
        label = Some(sb.toString)
      } else if (tryTakeSym(".")) {
        // shorthand (n.Label) — cypher_spec.rs:127-132
        label = Some(ident())
      }
      val props = if (peekSym("{")) propMap() else Map.empty[String, PropValue]
      expectSym(")")
      NodePattern(variable.filter(_.nonEmpty), label, props)
    }

    /** Relationship: `-[...]->` `<-[...]-` `-[...]-`; body
      * `var[:TYPE][*min..max][{props}]`. */
    def relPattern(): RelPattern = {
      val incoming = tryTakeSym("<")
      expectSym("-")
      var variable: Option[String] = None
      var typ: Option[String] = None
      var props = Map.empty[String, PropValue]
      var varLen: Option[(Int, Int)] = None
      if (tryTakeSym("[")) {
        peek match {
          case Some(Tok.Ident(_)) => variable = Some(ident())
          case _ =>
        }
        if (tryTakeSym(":")) typ = Some(ident())
        if (tryTakeSym("*")) {
          // *n | *min..max | *..max | *min.. | *; bounds are usize
          // parses in the reference — malformed values ERROR ("invalid
          // min/max", parse_rel_pattern), huge values saturate (the
          // BFS cap clamps to 8 anyway)
          var mn = 1
          var mx = 8
          peek match {
            case Some(Tok.Num(s)) =>
              pos += 1
              mn = usizeVal(s).getOrElse(
                throw ParseException(s"invalid min in hop range: $s"))
              mx = mn
            case _ =>
          }
          if (tryTakeSym("..")) {
            mx = 8
            peek match {
              case Some(Tok.Num(s)) =>
                pos += 1
                mx = usizeVal(s).getOrElse(
                  throw ParseException(s"invalid max in hop range: $s"))
              case _ =>
            }
          }
          varLen = Some((mn, mx))
        }
        if (peekSym("{")) props = propMap()
        expectSym("]")
      }
      expectSym("-")
      val outgoing = tryTakeSym(">")
      // the reference's parse_pattern drops a leading '<' silently and
      // derives direction ONLY from a trailing "]->"
      // (cypher_spec.rs:253-256): `<-[...]-` is UNDIRECTED and even
      // `<-[...]->` is directed out — adjudicated against the reference
      // executor. The consumed `incoming` token is syntax-only.
      locally { val _ = incoming }
      val dir = if (outgoing) Direction.Out else Direction.Both
      RelPattern(variable, typ, props, dir, varLen)
    }

    def pathPattern(): PathPattern = {
      val nodes = Seq.newBuilder[NodePattern]
      val rels = Seq.newBuilder[RelPattern]
      nodes += nodePattern()
      while (peekSym("-") || peekSym("<")) {
        rels += relPattern()
        nodes += nodePattern()
      }
      PathPattern(nodes.result(), rels.result())
    }

    def pathList(): Seq[PathPattern] = {
      val out = Seq.newBuilder[PathPattern]
      out += pathPattern()
      while (tryTakeSym(",")) {
        if (peekSym("(")) out += pathPattern()
        // trailing comma tolerance (unittests.rs:606-633)
      }
      out.result()
    }

    // ----- WHERE ---------------------------------------------------------
    def whereConds(): Seq[Cond] = {
      val out = Seq.newBuilder[Cond]
      out += cond()
      while (peekKw("AND")) { pos += 1; out += cond() }
      out.result()
    }

    def cmpOp(): String = next() match {
      case Tok.Sym(s) if Set("<", "<=", ">", ">=", "=", "<>", "!=").contains(s) =>
        if (s == "!=") "<>" else s
      case t => throw ParseException(s"expected comparison operator, got $t")
    }

    def cond(): Cond = {
      // id(a) op id(b)
      if (peekKw("id") && pos + 1 < toks.length && toks(pos + 1) == Tok.Sym("(")) {
        pos += 2
        val l = ident(); expectSym(")")
        val op = cmpOp()
        expectKw("id"); expectSym("(")
        val r = ident(); expectSym(")")
        return Cond.IdCmp(l, op, r)
      }
      peek match {
        case Some(Tok.Ident(_)) =>
          val v = ident()
          if (tryTakeSym(".")) {
            val key = ident()
            if (peekKw("CONTAINS")) { pos += 1; return Cond.Contains(v, key, propValue()) }
            if (peekKw2("STARTS", "WITH")) { pos += 2; return Cond.StartsWith(v, key, propValue()) }
            if (peekKw2("ENDS", "WITH")) { pos += 2; return Cond.EndsWith(v, key, propValue()) }
            val op = cmpOp()
            return Cond.PropCmp(v, key, op, propValue())
          }
          // unknown condition — consume until AND / clause boundary
          // (fail-open semantics, cypher_spec.rs:1140)
          skipUnknown(s"$v")
        case _ =>
          skipUnknown("")
      }
    }

    private def skipUnknown(prefix: String): Cond = {
      val sb = new StringBuilder(prefix)
      while (!eof && !peekKw("AND") && !atClauseBoundary) sb.append(" " + next().toString)
      Cond.Unknown(sb.toString)
    }

    // ----- RETURN / WITH items ------------------------------------------
    def returnItem(): Expr = peek match {
      case Some(Tok.Str(s)) => pos += 1; Expr.StrLit(s)
      case Some(Tok.Ident(idn)) if idn.equalsIgnoreCase("id") &&
          pos + 1 < toks.length && toks(pos + 1) == Tok.Sym("(") =>
        pos += 2
        val v = ident(); expectSym(")")
        Expr.Id(v)
      case Some(Tok.Ident(_)) =>
        val v = ident()
        if (tryTakeSym(".")) Expr.Prop(v, ident()) else Expr.Var(v)
      case t => throw ParseException(s"expected return item, got $t")
    }

    /** Strict usize-style count: digits only, saturating to
      * Int.MaxValue for values past it (the reference parses usize, so
      * a 5e9 LIMIT is effectively unbounded there too). None for
      * anything the reference's `parse::<usize>()` rejects — negative,
      * decimal, malformed. */
    def usizeVal(s: String): Option[Int] =
      if (s.nonEmpty && s.forall(_.isDigit) &&
          BigInt(s) <= BigInt("18446744073709551615")) // fits u64
        Some(BigInt(s).min(BigInt(Int.MaxValue)).toInt)
      else None

    /** ORDER BY / SKIP / LIMIT tail. `poisoned` mirrors the reference's
      * peel-from-the-end parse (cypher_spec.rs:490-506): a SKIP/LIMIT
      * count that fails the usize parse is NOT an error — the unpeeled
      * text stays inside the RETURN/WITH items, turning them into
      * property names that never resolve, so the statement silently
      * yields ZERO rows. Callers swap the item list for an unbindable
      * variable to reproduce that. */
    def orderSkipLimit(): (Seq[OrderKey], Option[Int], Option[Int], Boolean) = {
      var order = Seq.empty[OrderKey]
      var skip: Option[Int] = None
      var limit: Option[Int] = None
      var poisoned = false
      var go = true
      while (go && !eof) {
        if (peekKw2("ORDER", "BY")) {
          pos += 2
          val keys = Seq.newBuilder[OrderKey]
          var first = true
          var more = true
          while (more) {
            if (!first) expectSym(",")
            first = false
            val e = returnItem()
            var asc = true
            if (peekKw("ASC")) { pos += 1 } else if (peekKw("DESC")) { pos += 1; asc = false }
            keys += OrderKey(e, asc)
            more = peekSym(",")
          }
          order = keys.result()
        } else if (peekKw("SKIP")) {
          pos += 1
          peek match {
            case Some(Tok.Num(n)) if usizeVal(n).isDefined => pos += 1; skip = usizeVal(n)
            case _ => poisoned = true; go = false
          }
        } else if (peekKw("LIMIT")) {
          pos += 1
          peek match {
            case Some(Tok.Num(n)) if usizeVal(n).isDefined => pos += 1; limit = usizeVal(n)
            case _ => poisoned = true; go = false
          }
        } else go = false
      }
      if (poisoned) while (!eof) pos += 1 // the garble swallows the tail
      (order, skip, limit, poisoned)
    }

    /** Items that can never resolve — the observable effect of the
      * reference's count garble (a variable name with a space cannot be
      * produced by the lexer, so it is never bound). */
    val garbledItems: Seq[Expr] = Seq(Expr.Var("__garbled count__"))

    // ----- clause loop ---------------------------------------------------
    def statement(): Statement = {
      val clauses = Seq.newBuilder[Clause]
      var clauseCount = 0
      def add(c: Clause): Unit = { clauses += c; clauseCount += 1 }
      while (!eof) {
        if (peekKw2("OPTIONAL", "MATCH")) { pos += 2; add(Clause.Match(pathList(), optional = true)) }
        else if (peekKw("MATCH")) { pos += 1; add(Clause.Match(pathList(), optional = false)) }
        else if (peekKw("WHERE")) { pos += 1; add(Clause.Where(whereConds())) }
        else if (peekKw("WITH")) {
          pos += 1
          val distinct = if (peekKw("DISTINCT")) { pos += 1; true } else false
          val items = Seq.newBuilder[Expr]
          items += returnItem()
          while (tryTakeSym(",")) items += returnItem()
          val (o, s, l, poisoned) = orderSkipLimit()
          add(Clause.With(
            if (poisoned) garbledItems else items.result(), distinct, o, s, l))
        }
        else if (peekKw("CREATE")) { pos += 1; add(Clause.Create(pathList())) }
        else if (peekKw("MERGE")) { pos += 1; add(Clause.Merge(pathPattern())) }
        else if (peekKw("SET")) {
          pos += 1
          var more = true
          while (more) {
            val v = ident()
            if (tryTakeSym(":")) add(Clause.SetLabel(v, ident()))
            else {
              expectSym(".")
              val key = ident()
              expectSym("=")
              add(Clause.SetProp(v, key, propValue()))
            }
            more = tryTakeSym(",")
          }
        }
        else if (peekKw("REMOVE")) {
          pos += 1
          var more = true
          while (more) {
            val v = ident(); expectSym(".")
            add(Clause.RemoveProp(v, ident()))
            more = tryTakeSym(",")
          }
        }
        else if (peekKw2("DETACH", "DELETE")) { pos += 2; add(delete(detach = true)) }
        else if (peekKw("DELETE")) { pos += 1; add(delete(detach = false)) }
        else if (peekKw("RETURN")) {
          // a statement cannot LEAD with RETURN: the reference's parse
          // has no RETURN-first branch and falls through to its generic
          // error (cypher_spec.rs:736)
          if (clauseCount == 0)
            throw ParseException("Unsupported or unrecognized Cypher statement")
          pos += 1
          val distinct = if (peekKw("DISTINCT")) { pos += 1; true } else false
          val items = Seq.newBuilder[Expr]
          items += returnItem()
          while (tryTakeSym(",")) items += returnItem()
          val (o, s, l, poisoned) = orderSkipLimit()
          add(Clause.Return(
            if (poisoned) garbledItems else items.result(), distinct, o, s, l))
        }
        else throw ParseException(s"unexpected token $describe")
      }
      Statement(clauses.result())
    }

    def delete(detach: Boolean): Clause = {
      val vars = Seq.newBuilder[String]
      vars += ident()
      while (tryTakeSym(",")) vars += ident()
      Clause.Delete(vars.result(), detach)
    }
  }

  def parse(statementText: String): Statement =
    new P(tokenize(statementText)).statement()
}
