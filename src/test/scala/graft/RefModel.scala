package graft

import scala.collection.mutable

import graft.cypher.Parser
import graft.cypher.Parser.ParseException
import graft.cypher.Ast._
import graft.engine.ResultRow

/** Clean-room, in-memory interpreter of the REFERENCE engine's Cypher
  * execution semantics (cypher_spec.rs:748-1533), used as the oracle
  * side of differential fuzzing (see [[DifferentialFuzzSpec]]). This is
  * a SECOND implementation of the semantics, written from the reference
  * source — NOT from the Spark executor — so a disagreement between the
  * two flags a bug in one of them.
  *
  * Faithfulness notes (each adjudicated against the reference executor
  * itself during round 8):
  *  - ids are zero-padded counters, so string order == creation order,
  *    the property UUIDv7 gives the reference (and IdGen gives the
  *    engine);
  *  - pattern/CREATE/MERGE prop values go through resolve_param
  *    semantics ($-leading ⇒ param, else whitespace-trim + quote-trim,
  *    cypher_spec.rs:738-746); rel-step and var-length ENDPOINT props
  *    compare raw (cypher_spec.rs:806-810, 903-905);
  *  - var-length right endpoints overwrite prior bindings
  *    (cypher_spec.rs:846-848); single-hop steps consistency-check all
  *    three vars (cypher_spec.rs:913-936);
  *  - WHERE id() comparisons need two bound NODE vars, else the row is
  *    silently dropped (cypher_spec.rs:1075-1081); prop predicates read
  *    missing props as "" and drop rows for rel/unknown vars; unknown
  *    conditions are fail-open;
  *  - RETURN modifiers (DISTINCT/ORDER BY/SKIP/LIMIT) act only in
  *    single-item mode (cypher_spec.rs:1426-1512); ordering compares
  *    numeric when both keys parse as f64, else string, per pair.
  *
  * The model consumes graft's parsed AST. Since the round-8 parser
  * rewrite, [[graft.cypher.Parser]] mirrors the reference's
  * string-slicing clause splitter (priority chain, junk folding, peel
  * artifacts), so the PARSER is shared and under test three-way: a
  * slicing-mirror bug shows up as model+engine agreeing against the
  * reference side. The remaining deliberate extensions (chained-hop
  * patterns, processed escapes) stay outside the generator.
  */
class RefModel {

  /** id → (label, props). Insertion-ordered for debuggability; the
    * reference iterates HashMaps, so row ORDER from scans is arbitrary
    * and comparisons must be multiset-based. */
  val nodes = mutable.LinkedHashMap.empty[String, (String, Map[String, String])]
  val edges = mutable.LinkedHashMap.empty[String, (String, String, String, Map[String, String])]

  private var counter = 0L
  /** Hyphenated-hex, zero-padded: string order == creation order AND
    * the id is a parseable uuid, so the legacy id-addressed commands
    * (which normalize through requireUuid) round-trip the model's own
    * ids like the reference round-trips its parsed Uuids. */
  private def nextId(): String = {
    counter += 1; f"00000000-0000-0000-0000-$counter%012x"
  }

  sealed trait V
  case class N(id: String) extends V
  case class R(id: String) extends V

  type Row = Map[String, V]

  def execute(query: String): Seq[ResultRow] = executeWithParams(query, Map.empty)

  def executeWithParams(query: String, params: Map[String, String]): Seq[ResultRow] = {
    val stmt = Parser.parse(query)
    run(stmt, params)
  }

  /** Session-level entry mirroring the reference ROUTER
    * (query_interface.rs:77-210): ';' split, dialect dispatch (legacy
    * commands, pairwise merge, Cypher), counters and the mutated
    * heuristic — the no-params variant when `hasParams` is false, the
    * with-params variant otherwise. The parser is shared with the
    * engine (like the Cypher path); EXECUTION semantics are this
    * model's own, from the reference source. */
  def executeSession(query: String, params: Map[String, String],
      hasParams: Boolean): (Seq[ResultRow], Long, Long, Boolean) = {
    // RUST whitespace classes, like the reference's trim/trim_start
    // (U+00A0/U+202F strip, 0x1C-0x1F keep — found by MutFuzz r9,
    // golden-pinned r10)
    val trimmed = Parser.rustTrim(query)
    if (trimmed.isEmpty) throw ParseException("empty query")
    var rows = Seq.empty[ResultRow]
    var nCnt = 0L; var rCnt = 0L; var anyMut = false
    trimmed.split(";").map(Parser.rustTrim).filter(_.nonEmpty).foreach { stmt =>
      val upper = stmt.toUpperCase
      def restParen(p: Int): Boolean =
        stmt.length > p && stmt.substring(p).dropWhile(Parser.rustWs).startsWith("(")
      val (r, n, rc, m) =
        if (upper.startsWith("MATCH (") && upper.contains(" MERGE "))
          legacyPairwiseMerge(stmt)
        else if ((upper.startsWith("MATCH ") && restParen(6)) ||
            (upper.startsWith("OPTIONAL MATCH ") && restParen(15)) ||
            upper.startsWith("MERGE ") || upper.startsWith("RETURN ") ||
            (!hasParams && (upper.startsWith("SET ") || upper.startsWith("REMOVE "))) ||
            (upper.startsWith("DELETE ") && !upper.startsWith("DELETE NODE ") &&
              !upper.startsWith("DELETE REL ")) ||
            upper.startsWith("DETACH DELETE ") ||
            (if (hasParams) upper.startsWith("CREATE ") && restParen(7)
             else upper.startsWith("CREATE") && restParen(6))) {
          val out = run(Parser.parse(stmt), params)
          val mutated =
            if (hasParams)
              upper.startsWith("CREATE ") || upper.startsWith("MERGE ") ||
                (upper.startsWith("DELETE ") && !upper.startsWith("DELETE NODE ") &&
                  !upper.startsWith("DELETE REL ")) ||
                upper.startsWith("DETACH DELETE ")
            else
              upper.startsWith("CREATE") || upper.startsWith("MERGE ") ||
                upper.startsWith("SET ") || upper.startsWith("REMOVE ") ||
                (upper.startsWith("DELETE ") && !upper.startsWith("DELETE NODE ") &&
                  !upper.startsWith("DELETE REL ")) ||
                upper.startsWith("DETACH DELETE ")
          (out, 0L, 0L, mutated)
        } else if (upper.startsWith("CREATE NODE ") || upper.startsWith("MATCH NODE ") ||
            upper.startsWith("MATCH REL ") || upper.startsWith("CREATE REL ") ||
            upper.startsWith("DELETE NODE ") || upper.startsWith("DELETE REL "))
          legacyCommand(stmt)
        else throw ParseException(s"unrecognized statement: $stmt")
      rows ++= r; nCnt += n; rCnt += rc; anyMut ||= m
    }
    (rows, nCnt, rCnt, anyMut)
  }

  // ------------------------------------------------------ legacy dialect

  private def legacyCommand(stmt: String): (Seq[ResultRow], Long, Long, Boolean) =
    graft.cypher.LegacyParser.parse(stmt) match {
      case LegacyCmd.CreateNode(label, props) =>
        val id = nextId()
        nodes(id) = (label, props)
        (Seq(ResultRow.node(id, label, props)), 1L, 0L, true)
      case LegacyCmd.MatchNode(label, props, where) =>
        val out = nodes.toSeq.filter { case (id, (lb, p)) =>
          label.forall(_ == lb) &&
            props.forall { case (k, v) => p.get(k).contains(v) } &&
            where.forall(legacyNodeCond(id, lb, p, _))
        }.map { case (id, (lb, p)) => ResultRow.node(id, lb, p) }
        (out, 0L, 0L, false)
      case LegacyCmd.MatchRel(label, props, where) =>
        val out = edges.toSeq.filter { case (id, (f, t, lb, p)) =>
          label.forall(_ == lb) &&
            props.forall { case (k, v) => p.get(k).contains(v) } &&
            where.forall(legacyRelCond(id, f, t, lb, p, _))
        }.map { case (id, (f, t, lb, p)) => ResultRow.rel(id, f, t, lb, p) }
        (out, 0L, 0L, false)
      case LegacyCmd.CreateRel(from, to, label, props) =>
        // FK constraint then insert (query_interface.rs exec_create_rel)
        if (!nodes.contains(from) || !nodes.contains(to))
          throw ParseException("invalid endpoint(s) for relationship")
        val id = nextId()
        edges(id) = (from, to, label, props)
        (Seq(ResultRow.rel(id, from, to, label, props)), 0L, 1L, true)
      case LegacyCmd.DeleteNode(id) =>
        val existed = nodes.contains(id)
        if (existed) {
          nodes.remove(id)
          val incident = edges.collect { case (eid, e) if e._1 == id || e._2 == id => eid }
          incident.foreach(edges.remove)
        }
        (Seq.empty, if (existed) 1L else 0L, 0L, true)
      case LegacyCmd.DeleteRel(id) =>
        val existed = edges.remove(id).isDefined
        (Seq.empty, 0L, if (existed) 1L else 0L, true)
      case other =>
        throw ParseException(s"model does not interpret: $other")
    }

  /** Relationship-only conds on a node DROP the row (query_interface.rs
    * exec_match_node returns false per node); `!=` passes when the key
    * is missing (unwrap_or(false)). */
  private def legacyNodeCond(id: String, lb: String,
      p: Map[String, String], c: LegacyCond): Boolean = c match {
    case LegacyCond.IdEq(x) => id == x
    case LegacyCond.LabelEq(l) => lb == l
    case LegacyCond.HasKey(k) => p.contains(k)
    case LegacyCond.KeyEq(k, v) => p.get(k).contains(v)
    case LegacyCond.KeyNe(k, v) => !p.get(k).contains(v)
    case LegacyCond.FromEq(_) | LegacyCond.ToEq(_) => false
  }

  private def legacyRelCond(id: String, f: String, t: String, lb: String,
      p: Map[String, String], c: LegacyCond): Boolean = c match {
    case LegacyCond.IdEq(x) => id == x
    case LegacyCond.LabelEq(l) => lb == l
    case LegacyCond.HasKey(k) => p.contains(k)
    case LegacyCond.KeyEq(k, v) => p.get(k).contains(v)
    case LegacyCond.KeyNe(k, v) => !p.get(k).contains(v)
    case LegacyCond.FromEq(x) => f == x
    case LegacyCond.ToEq(x) => t == x
  }

  /** exec_cypher_match_merge (query_interface.rs:372-528): label scans,
    * same-var self-pair skip, id comparator (error raised INSIDE the
    * pair loop), idempotent insert against a (src,dst,label) set. */
  private def legacyPairwiseMerge(stmt: String): (Seq[ResultRow], Long, Long, Boolean) = {
    val c = graft.cypher.LegacyParser.parsePairwiseMerge(stmt)
    val idsA = nodes.toSeq.collect { case (id, (lb, _)) if lb == c.aLabel => id }
    val idsB = nodes.toSeq.collect { case (id, (lb, _)) if lb == c.bLabel => id }
    val exists = mutable.Set.empty[(String, String, String)] ++
      edges.values.map(e => (e._1, e._2, e._3))
    val outRows = mutable.Buffer.empty[ResultRow]
    var relCount = 0L
    var created = false
    for (aId <- idsA; bId <- idsB) {
      val selfSkip = c.aVar == c.bVar && aId == bId
      if (!selfSkip) {
        val pass = c.idCmp match {
          case None => true
          case Some((l, op, r)) =>
            val (lv, rv) =
              if (l == c.aVar && r == c.bVar) (aId, bId)
              else if (l == c.bVar && r == c.aVar) (bId, aId)
              else throw ParseException("WHERE references unknown variables")
            op match {
              case "<" => lv < rv; case "<=" => lv <= rv; case ">" => lv > rv
              case ">=" => lv >= rv; case "=" => lv == rv; case "<>" => lv != rv
            }
        }
        if (pass) {
          val (from, to) =
            if (c.leftVar == c.aVar) (aId, bId) else (bId, aId)
          val key = (from, to, c.relType)
          if (!exists.contains(key)) {
            val rid = nextId()
            edges(rid) = (from, to, c.relType, Map.empty)
            exists += key
            relCount += 1
            created = true
            outRows += ResultRow.rel(rid, from, to, c.relType, Map.empty)
          }
        }
      }
    }
    (outRows.toSeq, 0L, relCount, created)
  }

  /** resolve_param (cypher_spec.rs:738-746) over parse_props output:
    * $-leading ⇒ parameter (missing ⇒ error); else whitespace-trim and
    * one more quote-trim. RUST trim (str::trim = Unicode White_Space),
    * not Java's — a dequoted value's trailing U+2029 strips there while
    * 0x1C-0x1F survive (r11, MutFuzz seed 38). */
  private def resolvePropValue(v: PropValue, params: Map[String, String]): String = {
    val t = Parser.rustTrim(v match {
      case PropValue.Lit(s) => s
      case PropValue.Param(n) => "$" + n
    })
    if (t.startsWith("$")) {
      val key = t.substring(1)
      params.getOrElse(key, throw ParseException(s"Missing parameter: $$$key"))
    } else if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Raw text of a prop value — endpoint matching never resolves. */
  private def rawValue(v: PropValue): String = v match {
    case PropValue.Lit(s) => s
    case PropValue.Param(n) => "$" + n
  }

  private def nodeMatches(id: String, np: NodePattern,
      params: Map[String, String], resolveParams: Boolean): Boolean = {
    val (label, props) = nodes(id)
    np.label.forall(_ == label) && np.props.forall { case (k, v) =>
      val want = if (resolveParams) resolvePropValue(v, params) else rawValue(v)
      props.get(k).contains(want)
    }
  }

  def run(stmt: Statement, params: Map[String, String]): Seq[ResultRow] = {
    var rows: Seq[Row] = Seq(Map.empty)

    for (clause <- stmt.clauses) clause match {
      case Clause.Match(paths, _optional) =>
        rows = rows.flatMap { row =>
          var partials = Seq(row)
          paths.foreach { p => partials = partials.flatMap(expandPattern(_, p, params)) }
          partials
        }

      case Clause.Where(conds) =>
        rows = rows.filter(r => conds.forall(condPasses(r, _, params)))

      case Clause.With(items, _distinct, orderBy, skip, limit) =>
        // keys evaluated per original row, then project to listed VARS
        // only, sort, paginate (cypher_spec.rs:1148-1221)
        val keyed = rows.map { r =>
          (orderBy.map(ok => orderKey(r, ok.expr)), projectVars(r, items))
        }
        val sorted =
          if (orderBy.isEmpty) keyed
          else keyed.sortWith((a, b) => refLess(a._1, b._1, orderBy))
        rows = page(sorted.map(_._2), skip, limit)

      case Clause.Create(paths) =>
        paths.foreach { p =>
          if (p.rels.isEmpty) {
            val np = p.nodes.head
            val id = nextId()
            nodes(id) = (np.label.getOrElse("_"),
              np.props.map { case (k, v) => k -> resolvePropValue(v, params) })
            np.variable.foreach { v => rows = rows.map(_ + (v -> N(id))) }
          } else {
            // single-hop path: both endpoint vars must be bound node
            // vars per row; rows without them are dropped UNLESS no row
            // qualifies, in which case rows stay (cypher_spec.rs:1331-1348)
            p.rels.indices.foreach { i =>
              val (l, rel, r) = (p.nodes(i), p.rels(i), p.nodes(i + 1))
              val newRows = rows.flatMap { row =>
                (l.variable.flatMap(row.get), r.variable.flatMap(row.get)) match {
                  case (Some(N(from)), Some(N(to))) =>
                    val id = nextId()
                    edges(id) = (from, to, rel.relType.getOrElse("_"),
                      rel.props.map { case (k, v) => k -> resolvePropValue(v, params) })
                    Some(rel.variable.fold(row)(rv => row + (rv -> R(id))))
                  case _ => None
                }
              }
              if (newRows.nonEmpty) rows = newRows
            }
          }
        }

      case Clause.Merge(path) =>
        if (path.rels.size != 1)
          throw ParseException("MERGE currently supports only single relationship patterns")
        val (l, rel, r) = (path.nodes.head, path.rels.head, path.nodes(1))
        rows = rows.flatMap { row =>
          (l.variable.flatMap(row.get), r.variable.flatMap(row.get)) match {
            case (Some(N(from)), Some(N(to))) =>
              val typ = rel.relType.getOrElse("_")
              val props = rel.props.map { case (k, v) => k -> resolvePropValue(v, params) }
              val existing = edges.collectFirst {
                case (eid, (f, t, lb, meta))
                  if f == from && t == to && lb == typ &&
                    props.forall { case (k, v) => meta.get(k).contains(v) } => eid
              }
              val rid = existing.getOrElse {
                val id = nextId(); edges(id) = (from, to, typ, props); id
              }
              Some(rel.variable.fold(row)(rv => row + (rv -> R(rid))))
            case _ => None
          }
        }

      case Clause.SetProp(v, key, value) =>
        // SET stores the raw text — no param resolution
        // (cypher_spec.rs:1283-1292)
        val raw = rawValue(value)
        rows.foreach { row =>
          row.get(v).foreach {
            case N(id) if nodes.contains(id) =>
              val (lb, p) = nodes(id); nodes(id) = (lb, p + (key -> raw))
            case R(id) if edges.contains(id) =>
              val (f, t, lb, p) = edges(id); edges(id) = (f, t, lb, p + (key -> raw))
            case _ =>
          }
        }

      case Clause.SetLabel(v, label) =>
        rows.foreach { row =>
          row.get(v).foreach {
            case N(id) if nodes.contains(id) =>
              val (_, p) = nodes(id); nodes(id) = (label, p)
            case R(id) if edges.contains(id) =>
              val (f, t, _, p) = edges(id); edges(id) = (f, t, label, p)
            case _ =>
          }
        }

      case Clause.RemoveProp(v, key) =>
        rows.foreach { row =>
          row.get(v).foreach {
            case N(id) if nodes.contains(id) =>
              val (lb, p) = nodes(id); nodes(id) = (lb, p - key)
            case R(id) if edges.contains(id) =>
              val (f, t, lb, p) = edges(id); edges(id) = (f, t, lb, p - key)
            case _ =>
          }
        }

      case Clause.Delete(vars, detach) =>
        val relDel = mutable.Set.empty[String]
        val nodeDel = mutable.Set.empty[String]
        rows.foreach { row =>
          vars.foreach { v =>
            row.get(v).foreach {
              case R(id) => relDel += id
              case N(id) =>
                if (!detach) {
                  val incident = edges.values.exists(e => e._1 == id || e._2 == id)
                  if (incident)
                    throw ParseException(
                      s"Cannot DELETE node $id with existing relationships; use DETACH DELETE")
                }
                nodeDel += id
            }
          }
        }
        relDel.foreach(edges.remove)
        nodeDel.foreach { nid =>
          nodes.remove(nid)
          // remove_node cascades to incident edges (graph.rs remove_node)
          val incident = edges.collect { case (eid, e) if e._1 == nid || e._2 == nid => eid }
          incident.foreach(edges.remove)
        }

      case Clause.Return(items, distinct, orderBy, skip, limit) =>
        return execReturn(rows, items, distinct, orderBy, skip, limit)
    }

    // implicit return: every bound value of every row, against the
    // CURRENT graph (cypher_spec.rs:1515-1531)
    rows.flatMap { r =>
      r.toSeq.sortBy(_._1).flatMap {
        case (_, N(id)) => nodes.get(id).map { case (lb, p) => ResultRow.node(id, lb, p) }
        case (_, R(id)) => edges.get(id).map { case (f, t, lb, p) => ResultRow.rel(id, f, t, lb, p) }
      }
    }
  }

  // ---------------------------------------------------------------- MATCH

  private def expandPattern(row: Row, p: PathPattern,
      params: Map[String, String]): Seq[Row] = {
    if (p.rels.isEmpty) {
      val np = p.nodes.head
      nodes.keys.toSeq
        .filter(nodeMatches(_, np, params, resolveParams = true))
        .flatMap { nid =>
          np.variable match {
            case Some(v) => row.get(v) match {
              case Some(N(prev)) if prev == nid => Some(row)
              case Some(_) => None
              case None => Some(row + (v -> N(nid)))
            }
            case None => Some(row)
          }
        }
    } else {
      // generator emits single-hop or var-length paths only (the
      // reference parser cannot express chained hops)
      require(p.rels.size == 1, "model supports single-hop paths only")
      val (left, rel, right) = (p.nodes.head, p.rels.head, p.nodes(1))
      rel.varLength match {
        case Some((mn0, mx0)) => expandVarLength(row, left, rel, right, mn0, mx0)
        case None => expandSingleHop(row, left, rel, right, params)
      }
    }
  }

  /** Triple enumeration (cypher_spec.rs:885-941): endpoint props RAW,
    * rel props resolved; all three vars consistency-checked. */
  private def expandSingleHop(row: Row, left: NodePattern, rel: RelPattern,
      right: NodePattern, params: Map[String, String]): Seq[Row] = {
    val out = mutable.Buffer.empty[Row]
    edges.foreach { case (rid, (from, to, lbl, meta)) =>
      if (rel.relType.forall(_ == lbl) &&
          rel.props.forall { case (k, v) =>
            meta.get(k).contains(resolvePropValue(v, params)) }) {
        def tryMatch(lNp: NodePattern, rNp: NodePattern, a: String, b: String): Unit = {
          if (nodeMatches(a, lNp, params, resolveParams = false) &&
              nodeMatches(b, rNp, params, resolveParams = false)) {
            var m = row
            var ok = true
            left.variable.foreach { v =>
              row.get(v) match {
                case Some(N(p)) if p == a => m += (v -> N(a))
                case Some(_) => ok = false
                case None => m += (v -> N(a))
              }
            }
            if (ok) rel.variable.foreach { rv =>
              m.get(rv) match {
                case Some(R(p)) if p == rid => m += (rv -> R(rid))
                case Some(_) => ok = false
                case None => m += (rv -> R(rid))
              }
            }
            if (ok) right.variable.foreach { v =>
              m.get(v) match {
                case Some(N(p)) if p == b => m += (v -> N(b))
                case Some(_) => ok = false
                case None => m += (v -> N(b))
              }
            }
            if (ok) out += m
          }
        }
        rel.direction match {
          case Direction.Out => tryMatch(left, right, from, to)
          case Direction.Both =>
            tryMatch(left, right, from, to)
            tryMatch(left, right, to, from)
        }
      }
    }
    out.toSeq
  }

  /** Var-length BFS (cypher_spec.rs:790-883): min-depth only (visited
    * set), hop cap 8, endpoint props raw, rel var never bound, LEFT var
    * consistency-checked pre-BFS, RIGHT var overwritten per target. */
  private def expandVarLength(row: Row, left: NodePattern, rel: RelPattern,
      right: NodePattern, mn0: Int, mx0: Int): Seq[Row] = {
    if (rel.props.nonEmpty)
      throw ParseException("variable-length relationships with properties not supported yet")
    val cap = 8
    val mn = math.max(mn0, 0)
    val mx = math.min(mx0, cap)
    val leftIds = nodes.keys.toSeq.filter(nodeMatches(_, left, Map.empty, resolveParams = false))
    val rightIds = nodes.keys.toSet.filter(nodeMatches(_, right, Map.empty, resolveParams = false))
    val fwd = mutable.Map.empty[String, mutable.Buffer[String]]
    val back = mutable.Map.empty[String, mutable.Buffer[String]]
    edges.values.foreach { case (f, t, lbl, _) =>
      if (rel.relType.forall(_ == lbl)) {
        fwd.getOrElseUpdate(f, mutable.Buffer.empty) += t
        back.getOrElseUpdate(t, mutable.Buffer.empty) += f
      }
    }
    def nexts(cur: String): Seq[String] = rel.direction match {
      case Direction.Out => fwd.getOrElse(cur, Nil).toSeq
      case Direction.Both =>
        fwd.getOrElse(cur, Nil).toSeq ++ back.getOrElse(cur, Nil).toSeq
    }
    val out = mutable.Buffer.empty[Row]
    leftIds.foreach { lid =>
      val consistent = left.variable.forall { v =>
        row.get(v) match {
          case Some(N(p)) => p == lid
          case Some(_) => false
          case None => true
        }
      }
      if (consistent) {
        val seen = mutable.Set(lid)
        val queue = mutable.Queue((lid, 0))
        while (queue.nonEmpty) {
          val (cur, d) = queue.dequeue()
          if (d >= mn && d <= mx && rightIds.contains(cur)) {
            var m = row
            left.variable.foreach(v => m += (v -> N(lid)))
            right.variable.foreach(v => m += (v -> N(cur))) // OVERWRITE
            out += m
          }
          if (d != mx) {
            nexts(cur).foreach { nx =>
              if (!seen.contains(nx)) { seen += nx; queue.enqueue((nx, d + 1)) }
            }
          }
        }
      }
    }
    out.toSeq
  }

  // ---------------------------------------------------------------- WHERE

  private def condPasses(row: Row, cond: Cond, params: Map[String, String]): Boolean = cond match {
    case Cond.IdCmp(l, op, r) =>
      (row.get(l), row.get(r)) match {
        case (Some(N(a)), Some(N(b))) => cmpStr(a, b, op)
        case _ => false
      }
    case Cond.PropCmp(v, key, op, value) =>
      nodeProp(row, v, key) match {
        case None => false
        case Some(sv) =>
          val lit = whereRhs(value, params)
          (parseNum(sv), parseNum(lit)) match {
            case (Some(a), Some(b)) => cmpNum(a, b, op)
            case _ => cmpStr(sv, lit, op)
          }
      }
    case Cond.Contains(v, key, value) =>
      nodeProp(row, v, key).exists(_.contains(whereRhs(value, params)))
    case Cond.StartsWith(v, key, value) =>
      nodeProp(row, v, key).exists(_.startsWith(whereRhs(value, params)))
    case Cond.EndsWith(v, key, value) =>
      nodeProp(row, v, key).exists(_.endsWith(whereRhs(value, params)))
    case Cond.Unknown(_) => true
  }

  /** WHERE RHS: quoted stays literal; $param resolves (error if missing). */
  private def whereRhs(v: PropValue, params: Map[String, String]): String = v match {
    case PropValue.Lit(s) => s
    case PropValue.Param(n) =>
      params.getOrElse(n, throw ParseException(s"Missing parameter: $$$n"))
  }

  /** Node-var property or None ⇒ row dropped; missing prop reads "". */
  private def nodeProp(row: Row, v: String, key: String): Option[String] =
    row.get(v) match {
      case Some(N(id)) if nodes.contains(id) => Some(nodes(id)._2.getOrElse(key, ""))
      case _ => None
    }

  /** Rust `f64::from_str` mirror (cypher_spec.rs:1129,1198,1487 all use
    * `parse::<f64>`): NO trimming — str::parse never trims, so a " 5"
    * prop value string-compares there — sign + (inf|infinity|nan,
    * case-insensitive) or ASCII decimal/exponent. The old model used
    * `s.trim.toDouble` with a d/f-suffix guard, which wrongly accepted
    * " 5" and Java hex floats ("0x1p3") and wrongly REJECTED
    * "inf"/"+infinity" (Java spells it "Infinity"). Grammar kept
    * written-out here (not delegated to the engine's rustF64) so the
    * differential compare stays genuinely two-sided. r11. */
  private val numRe = java.util.regex.Pattern.compile(
    "(?i)[+-]?(inf(inity)?|nan|([0-9]+\\.?[0-9]*|\\.[0-9]+)(e[+-]?[0-9]+)?)")
  private def parseNum(s: String): Option[Double] = {
    if (!numRe.matcher(s).matches()) None
    else {
      val neg = s.startsWith("-")
      val body = (if (neg || s.startsWith("+")) s.substring(1) else s).toLowerCase
      val v =
        if (body.startsWith("inf")) Double.PositiveInfinity
        else if (body == "nan") Double.NaN
        else body.toDouble
      Some(if (neg) -v else v)
    }
  }

  /** Rust `String` cmp is UTF-8 byte order == code point order; Java's
    * compareTo is UTF-16 unit order, which disagrees above U+FFFF
    * (surrogate units sort below U+E000-U+FFFF). r11. */
  private def cpCmp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(a.length, b.length)
  }

  private def cmpNum(a: Double, b: Double, op: String): Boolean = op match {
    case "<" => a < b; case "<=" => a <= b; case ">" => a > b
    case ">=" => a >= b; case "=" => a == b; case "<>" => a != b
    case _ => true
  }

  private def cmpStr(a: String, b: String, op: String): Boolean = op match {
    case "<" => cpCmp(a, b) < 0; case "<=" => cpCmp(a, b) <= 0
    case ">" => cpCmp(a, b) > 0; case ">=" => cpCmp(a, b) >= 0
    case "=" => a == b; case "<>" => a != b
    case _ => true
  }

  // --------------------------------------------------------------- RETURN

  private def orderKey(row: Row, e: Expr): String = e match {
    case Expr.Var(v) => row.get(v) match {
      case Some(N(id)) => id; case Some(R(id)) => id; case None => ""
    }
    case Expr.Id(v) => row.get(v) match {
      case Some(N(id)) => id; case Some(R(id)) => id; case None => ""
    }
    case Expr.Prop(v, key) => row.get(v) match {
      case Some(N(id)) if nodes.contains(id) => nodes(id)._2.getOrElse(key, "")
      case _ => ""
    }
    case Expr.StrLit(s) => s
  }

  /** Reference pairwise comparator: numeric when both keys parse, else
    * string; per ORDER key, descending reverses (cypher_spec.rs:1480-1497). */
  private def refLess(ka: Seq[String], kb: Seq[String], orderBy: Seq[OrderKey]): Boolean = {
    val len = math.min(math.min(ka.length, kb.length), orderBy.length)
    var i = 0
    while (i < len) {
      val asc = orderBy(i).ascending
      val ord = (parseNum(ka(i)), parseNum(kb(i))) match {
        case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
        case _ => cpCmp(ka(i), kb(i))
      }
      val o = if (asc) ord else -ord
      if (o != 0) return o < 0
      i += 1
    }
    false
  }

  private def projectVars(row: Row, items: Seq[Expr]): Row =
    items.collect { case Expr.Var(v) if row.contains(v) => v -> row(v) }.toMap

  private def page[T](xs: Seq[T], skip: Option[Int], limit: Option[Int]): Seq[T] = {
    val afterSkip = xs.drop(skip.getOrElse(0))
    limit.fold(afterSkip)(afterSkip.take)
  }

  private def emitItem(row: Row, it: Expr): Seq[ResultRow] = it match {
    case Expr.Var(v) => row.get(v) match {
      case Some(N(id)) =>
        nodes.get(id).map { case (lb, p) => ResultRow.node(id, lb, p) }.toSeq
      case Some(R(id)) =>
        edges.get(id).map { case (f, t, lb, p) => ResultRow.rel(id, f, t, lb, p) }.toSeq
      case None => Seq.empty
    }
    case Expr.Prop(v, key) => row.get(v) match {
      case Some(N(id)) if nodes.contains(id) =>
        nodes(id)._2.get(key).map(ResultRow.info).toSeq
      case _ => Seq.empty
    }
    case Expr.Id(v) => row.get(v) match {
      case Some(N(id)) => Seq(ResultRow.info(id))
      case Some(R(id)) => Seq(ResultRow.info(id))
      case None => Seq.empty
    }
    case Expr.StrLit(s) => Seq(ResultRow.info(s))
  }

  private def execReturn(rows: Seq[Row], items: Seq[Expr], distinct: Boolean,
      orderBy: Seq[OrderKey], skip: Option[Int], limit: Option[Int]): Seq[ResultRow] = {
    val singleItem = items.size == 1
    var projected: Seq[(Seq[String], Seq[ResultRow])] = rows.map { r =>
      val outs = items.flatMap(emitItem(r, _))
      val keys =
        if (singleItem && orderBy.nonEmpty) orderBy.map(ok => orderKey(r, ok.expr))
        else Seq.empty
      (keys, outs)
    }
    if (distinct && singleItem) {
      val seen = mutable.Set.empty[String]
      projected = projected.flatMap { case (keys, outs) =>
        if (outs.isEmpty) None
        else {
          val k = outs.head match {
            case rr if rr.kind == "info" => rr.info
            case rr => rr.id
          }
          if (seen.add(k)) Some((keys, Seq(outs.head))) else None
        }
      }
    }
    if (singleItem && orderBy.nonEmpty)
      projected = projected.sortWith((a, b) => refLess(a._1, b._1, orderBy))
    if (singleItem) {
      val nonEmpty = projected.collect { case (_, outs) if outs.nonEmpty => outs.head }
      page(nonEmpty, skip, limit)
    } else projected.flatMap(_._2)
  }
}
