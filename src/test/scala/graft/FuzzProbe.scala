package graft

import scala.util.Random

import graft.cypher.Parser.ParseException
import graft.engine.GraphSession

/** Dev probe: throw deterministic garbage at the full statement
  * surface (tokenizer → both parsers → router → executor) and report
  * every failure that is NOT the typed ParseException. The API layer
  * maps any error to a client Left, but an internal-looking class
  * (MatchError, IndexOutOfBounds, NumberFormat, ClassCast, NPE) means
  * a parser hole, and at a serving daemon's rate fuzzable holes WILL
  * be hit. ParserRobustnessSpec pins the zero-hole contract with this
  * exact generator; run standalone via tools/run.sh graft.FuzzProbe.
  */
object FuzzProbe {

  /** Valid seed queries across both dialects and every clause family. */
  val seeds: Seq[String] = Seq(
    "CREATE (a:Person {name: 'Ada', age: 36})",
    "CREATE (a:Person {name: 'Bob'})-[:KNOWS {since: 1999}]->(b:City {name: 'Oslo'})",
    "MATCH (a:Person) RETURN a.name, id(a) ORDER BY a.name DESC SKIP 1 LIMIT 3",
    "MATCH (a:Person) WHERE a.age > 30 AND a.name CONTAINS 'd' RETURN a",
    "MATCH (a)-[r:KNOWS]->(b) WHERE id(a) < id(b) RETURN a, r, b",
    "MATCH (a:Person)-[*1..3]->(b) RETURN DISTINCT b",
    "MATCH (a {name: 'Ada'}) SET a.age = 37 RETURN a.age",
    "MATCH (a:Person) WITH a.name ORDER BY a.name LIMIT 2 RETURN a.name",
    "OPTIONAL MATCH (x:Ghost) RETURN x",
    "MERGE (a:Person {name: 'Cyd'})",
    "MATCH (a:Person {name: 'Cyd'}) DETACH DELETE a",
    "MATCH (a:Person) REMOVE a.age",
    "RETURN 'hello'",
    "CREATE NODE label=Person props={name: \"Eve\", age: \"9\"}",
    "CREATE REL from=00000000-0000-0000-0000-000000000000 to=00000000-0000-0000-0000-000000000001 label=KNOWS",
    "MATCH NODE label=Person",
    "MATCH NODE where name=Eve",
    "DELETE NODE 00000000-0000-0000-0000-000000000000",
    "MATCH (a:Person), (b:City) MERGE (a)-[:LIVES_IN]->(b)",
    "MATCH (a:Person) RETURN a; MATCH (b:City) RETURN b",
  )

  /** Hand-picked nasties: boundary shapes mutations rarely reach. */
  val nasties: Seq[String] = Seq(
    "RETURN n LIMIT",                     // eof where a number is due
    "MATCH (a) RETURN a LIMIT 1.2.3",     // multi-dot numeric token
    "MATCH (a) RETURN a SKIP 99999999999999999999", // > Long.MaxValue
    "MATCH (a) RETURN a LIMIT -0.7",      // negative fractional
    "MATCH (a) RETURN a LIMIT -5",        // negative limit
    "MATCH (a) RETURN a SKIP -3",         // negative offset
    "MATCH (a)-[*-2..3]->(b) RETURN b",   // negative hop bound
    "MATCH (a:Person RETURN a",           // unclosed node pattern
    "MATCH (a)-[r]- RETURN a",            // dangling undirected stub
    "MATCH (a)-[*3..1]->(b) RETURN b",    // inverted hop range
    "CREATE (a:Person {name: 'x\\u12'})", // short unicode escape
    "CREATE (a:{})",                      // empty label position
    "MATCH () RETURN",                    // empty return list
    "MATCH (a) WHERE RETURN a",           // empty where
    "MATCH (a) ORDER BY RETURN a",        // order keys missing
    "MERGE (a:Person }name: 'Cyd'{)",     // reversed braces (slice order)
    "CREATE (}:Person {name: 'x'a)-[:K]->(b)", // stray '}' before '{'
    "MATCH (n) RETURN ßß LIMIT 5", // ß: uppercase must not shift offsets
    "MATCH (n) RETURN n ORDER BY ßß DESC", // ß in an order key
    "MATCH (n) SET n.a = 'ß' RETURN n", // ß in a SET value
    "MATCH (a) RETURN a LIMIT ٣",    // Arabic-Indic digit: usize rejects
    "MATCH (n) RETURN \"",                // lone quote: reference panics, we type the error
    "MATCH (n) WHERE n.x = '",            // lone quote in WHERE rhs
    "CREATE NODE label= props=",          // legacy empties
    "CREATE REL from=zz to=yy label=",    // invalid uuids
    "MATCH NODE where =",                 // empty legacy where
    "DELETE REL not-a-uuid",
    "MATCH (a) RETURN a ORDER BY a ASC,", // trailing comma
    "MATCH (a {name: })",                 // missing prop value
    "MATCH (a:Person)-->(b RETURN a,,b",  // double comma
    "RETURN $",                           // empty param name
    "RETURN $p",                          // undefined param
    ";;;",                                // only separators
    "MATCH (a) WHERE a.x = ; RETURN a",   // value cut by splitter
    "(((((((((((((((((((((",
    "}}}}]]]])))))",
    "MATCH " + "(a)-[r]->" * 40 + "(z) RETURN z", // long chain
    "RETURN " + "'s'," * 30 + "'e'",
    "MATCH (a) RETURN a.",                // dangling dot
    "MATCH (a.b.c) RETURN a",             // dotted in node pattern
    "SET a.x = 1",                        // SET without MATCH
    "CREATE ()",                          // anonymous empty node
  )

  /** Deterministic mutation pool: the spec and the probe share it so a
    * spec failure reproduces exactly. */
  def mutated(rounds: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val chars = "()[]{}<>-=:,.'\"$*; \tABmatchwherereturn0129_`"
    (0 until rounds).map { _ =>
      val base = seeds(rnd.nextInt(seeds.length))
      rnd.nextInt(6) match {
        case 0 => // delete one char
          val i = rnd.nextInt(base.length); base.take(i) + base.drop(i + 1)
        case 1 => // insert one char
          val i = rnd.nextInt(base.length + 1)
          base.take(i) + chars(rnd.nextInt(chars.length)) + base.drop(i)
        case 2 => // truncate
          base.take(rnd.nextInt(base.length + 1))
        case 3 => // swap two chars
          val i = rnd.nextInt(base.length); val j = rnd.nextInt(base.length)
          val arr = base.toCharArray
          val t = arr(i); arr(i) = arr(j); arr(j) = t; new String(arr)
        case 4 => // splice two seeds at random cut points
          val other = seeds(rnd.nextInt(seeds.length))
          base.take(rnd.nextInt(base.length + 1)) +
            other.drop(rnd.nextInt(other.length + 1))
        case _ => // duplicate a random slice
          val i = rnd.nextInt(base.length + 1)
          val j = i + rnd.nextInt(base.length - i + 1)
          base.take(j) + base.substring(i, j) + base.drop(j)
      }
    }
  }

  def corpus(rounds: Int = 400, seed: Long = 42L): Seq[String] =
    nasties ++ mutated(rounds, seed)

  /** Runs the corpus; returns (query, throwable) for every failure
    * that is not a ParseException. A fresh session per run — mutated
    * CREATEs may land, which is part of the surface under test. */
  def holes(session: GraphSession, rounds: Int = 400,
      seed: Long = 42L): Seq[(String, Throwable)] =
    corpus(rounds, seed).flatMap { q =>
      try { session.executeWithParams(q, Map("p" -> "1")); None }
      catch {
        case _: ParseException => None
        case t: Throwable      => Some(q -> t)
      }
    }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(400)
    val seed = args.lift(1).map(_.toLong).getOrElse(42L)
    val spark = SparkTestSession.spark
    val found = holes(new GraphSession(spark), rounds, seed)
    println(s"\n=== ${found.size} non-ParseException failures ===")
    found.groupBy(_._2.getClass.getName).foreach { case (cls, qs) =>
      println(s"\n--- $cls (${qs.size}) ---")
      qs.take(5).foreach { case (q, t) =>
        println(s"  [${q.take(90)}]")
        println(s"    ${Option(t.getMessage).getOrElse("").take(120)}")
      }
    }
  }
}
