package graft.cypher

/** AST for the reference's pragmatic OpenCypher subset plus the legacy
  * command dialect. Shapes mirror the reference IR
  * (`/root/reference/src/gql/cypher_spec.rs:15-59`) without copying its
  * parser (string slicing there; recursive descent here).
  */
object Ast {

  /** RETURN / WITH item expressions (cypher_spec.rs:15-21). */
  sealed trait Expr
  object Expr {
    case class Var(name: String) extends Expr
    case class Prop(variable: String, key: String) extends Expr
    case class Id(variable: String) extends Expr
    case class StrLit(value: String) extends Expr
  }

  /** Node pattern `(n:Label {k:"v"})`; the reference splits label on the
    * FIRST ':' only, so `(:A:B)` keeps label "A:B" (cypher_spec.rs:121-126),
    * and supports the shorthand dot form `(n.Label)` (cypher_spec.rs:127-132). */
  case class NodePattern(
      variable: Option[String],
      label: Option[String],
      props: Map[String, PropValue])

  /** Either a literal string or a `$param` reference (resolved at
    * execution, cypher_spec.rs:738-746). */
  sealed trait PropValue
  object PropValue {
    case class Lit(value: String) extends PropValue
    case class Param(name: String) extends PropValue
  }

  /** Relationship pattern `-[r:TYPE {props}]->`, `<-[...]-,` or
    * undirected `-[...]-`; `*min..max` variable length
    * (cypher_spec.rs:153-198). The reference IR keeps only a
    * `right: bool` — a leading `<` is dropped by its parser
    * (cypher_spec.rs:253-256), so `<-[...]-` is undirected; there is
    * no "incoming" direction. */
  sealed trait Direction
  object Direction {
    case object Out extends Direction  // (a)-[]->(b)
    case object Both extends Direction // (a)-[]-(b) and (a)<-[]-(b)
  }

  case class RelPattern(
      variable: Option[String],
      relType: Option[String],
      props: Map[String, PropValue],
      direction: Direction,
      varLength: Option[(Int, Int)])

  /** A path = alternating nodes and relationships. */
  case class PathPattern(
      nodes: Seq[NodePattern],
      rels: Seq[RelPattern])

  /** WHERE conditions — exactly the reference's comparators
    * (cypher_spec.rs:994-1070). */
  sealed trait Cond
  object Cond {
    /** id(a) <op> id(b), u128/string compare (P4). */
    case class IdCmp(left: String, op: String, right: String) extends Cond
    /** var.prop <op> value: numeric if both parse as f64 else string (P5). */
    case class PropCmp(variable: String, key: String, op: String, value: PropValue) extends Cond
    case class Contains(variable: String, key: String, value: PropValue) extends Cond
    case class StartsWith(variable: String, key: String, value: PropValue) extends Cond
    case class EndsWith(variable: String, key: String, value: PropValue) extends Cond
    /** Unrecognized condition — reproduces the reference's fail-open
      * behavior (P9: an unknown condition filters nothing). */
    case class Unknown(text: String) extends Cond
  }

  case class OrderKey(expr: Expr, ascending: Boolean)

  sealed trait Clause
  object Clause {
    case class Match(paths: Seq[PathPattern], optional: Boolean) extends Clause
    case class Where(conds: Seq[Cond]) extends Clause
    case class With(items: Seq[Expr], distinct: Boolean, orderBy: Seq[OrderKey],
        skip: Option[Int], limit: Option[Int]) extends Clause
    case class Create(paths: Seq[PathPattern]) extends Clause
    case class Merge(path: PathPattern) extends Clause
    case class SetProp(variable: String, key: String, value: PropValue) extends Clause
    case class SetLabel(variable: String, label: String) extends Clause
    case class RemoveProp(variable: String, key: String) extends Clause
    case class Delete(variables: Seq[String], detach: Boolean) extends Clause
    case class Return(items: Seq[Expr], distinct: Boolean, orderBy: Seq[OrderKey],
        skip: Option[Int], limit: Option[Int]) extends Clause
  }

  case class Statement(clauses: Seq[Clause])

  // ---------------- legacy command dialect (query_interface.rs) -------------

  sealed trait LegacyCmd
  object LegacyCmd {
    case class CreateNode(label: String, props: Map[String, String]) extends LegacyCmd
    case class CreateRel(from: String, to: String, label: String,
        props: Map[String, String]) extends LegacyCmd
    case class MatchNode(label: Option[String], props: Map[String, String],
        where: Seq[LegacyCond]) extends LegacyCmd
    case class MatchRel(label: Option[String], props: Map[String, String],
        where: Seq[LegacyCond]) extends LegacyCmd
    case class DeleteNode(id: String) extends LegacyCmd
    case class DeleteRel(id: String) extends LegacyCmd
    /** `MATCH (a:L),(b:L) [WHERE id(a) op id(b)] MERGE (a)-[:T]->(b)`
      * (query_interface.rs:368-528). `leftVar`/`rightVar` carry the
      * MERGE pattern's direction (may reverse the MATCH order). */
    case class PairwiseMerge(aVar: String, aLabel: String, bVar: String,
        bLabel: String, idCmp: Option[(String, String, String)],
        relType: String, leftVar: String, rightVar: String) extends LegacyCmd
  }

  /** Legacy WHERE conditions (query_interface.rs:256-352). */
  sealed trait LegacyCond
  object LegacyCond {
    case class IdEq(id: String) extends LegacyCond
    case class LabelEq(label: String) extends LegacyCond
    case class FromEq(id: String) extends LegacyCond
    case class ToEq(id: String) extends LegacyCond
    case class HasKey(key: String) extends LegacyCond
    case class KeyEq(key: String, value: String) extends LegacyCond
    case class KeyNe(key: String, value: String) extends LegacyCond
  }
}
