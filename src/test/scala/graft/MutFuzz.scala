package graft

import scala.collection.mutable
import scala.util.Random

import graft.engine.GraphSession

/** Mutation fuzzer: character-level corruptions of valid statements,
  * adjudicated ENGINE vs the reference's own executor (the
  * `GRAFT_REF_ORACLE` REPL binary, which surfaces reference panics as
  * `ERR panic: ...` lines instead of dying). Where [[DiffFuzz]] sweeps
  * the reference-EXPRESSIBLE dialect, this sweeps the boundary around
  * it: mangled quotes, spliced keywords, multi-byte chars in slice
  * windows, truncations — the inputs where a byte-exact parser mirror
  * either holds or doesn't.
  *
  * Comparison per trial: outcome class (error vs success) and
  * normalized error text on both-error; row multisets (canonicalized
  * through k/ek markers) and affected-counter meta on both-success.
  * After any trial that could have mutated state, both sides dump and
  * compare full state. A reference PANIC leaves the oracle's graph in
  * an unobservable half-applied state (the real binary dies with it),
  * so panic trials compare outcome only and then re-seed both sides
  * from scratch to realign.
  */
object MutFuzz {

  // chars chosen to stress the mirrored surfaces: quote runs, brace
  // slices, AND/WHERE byte windows, rustTrim's Unicode whitespace
  // (U+00A0 Zs, U+0085), and multi-byte panic windows (é, λ, →)
  private val Alphabet: IndexedSeq[Char] =
    "\"'(){}[]:,=<>!$.;*- \tABCxyz019" + "éλ→ "

  private val Keywords = Seq(
    " AND ", " WHERE ", " RETURN ", " SET ", " REMOVE ", " DELETE ",
    " DETACH ", " LIMIT ", " SKIP ", " DISTINCT ", " ORDER BY ",
    " OPTIONAL ", " MATCH ", " MERGE ", " WITH ", " CREATE ", " HAS(",
    "*1..2", "()", "-[]->", "<-", ";", " id(", " NODE ", " REL ")

  private def mutate(rnd: Random, s: String): String = {
    if (s.isEmpty) return s
    rnd.nextInt(8) match {
      case 0 => // insert alphabet char
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + Alphabet(rnd.nextInt(Alphabet.length)) + s.substring(i)
      case 1 => // delete char
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
      case 2 => // replace char
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + Alphabet(rnd.nextInt(Alphabet.length)) + s.substring(i + 1)
      case 3 => // duplicate char
        val i = rnd.nextInt(s.length)
        s.substring(0, i + 1) + s.charAt(i) + s.substring(i + 1)
      case 4 => // case-flip a letter (keyword finds are case-sensitive
        // in spots — strip_prefix vs uppercase scan)
        val letters = s.indices.filter(i => s.charAt(i).isLetter)
        if (letters.isEmpty) s
        else {
          val i = letters(rnd.nextInt(letters.length))
          val c = s.charAt(i)
          val f = if (c.isUpper) c.toLower else c.toUpper
          s.substring(0, i) + f + s.substring(i + 1)
        }
      case 5 => // splice a keyword
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + Keywords(rnd.nextInt(Keywords.length)) + s.substring(i)
      case 6 => // swap adjacent chars
        if (s.length < 2) s
        else {
          val i = rnd.nextInt(s.length - 1)
          s.substring(0, i) + s.charAt(i + 1) + s.charAt(i) + s.substring(i + 2)
        }
      case _ => // truncate
        s.substring(0, rnd.nextInt(s.length))
    }
  }

  /** Statements whose ORIGINAL form could mutate graph state — used to
    * decide when a state compare is warranted (a mangled text can still
    * reach a mutating branch, so match loosely on the mutated text). */
  private def maybeMutating(stmt: String): Boolean = {
    val u = stmt.toUpperCase
    Seq("CREATE", "MERGE", "SET", "DELETE", "REMOVE").exists(u.contains)
  }

  def main(args: Array[String]): Unit = {
    val from = if (args.length > 0) args(0).toLong else 1L
    val to = if (args.length > 1) args(1).toLong else from + 9
    val trials = if (args.length > 2) args(2).toInt else 60
    val binary = sys.env.getOrElse("GRAFT_REF_ORACLE",
      sys.error("MutFuzz needs GRAFT_REF_ORACLE (the reference REPL binary)"))
    val spark = SparkTestSession.spark
    val oracle = new DiffFuzz.RefOracle(binary)
    var bad = 0

    (from to to).foreach { seed =>
      val rnd = new Random(seed)
      val mismatches = mutable.Buffer.empty[DiffFuzz.Mismatch]
      var freshCounter = 10000
      def fresh(): Int = { freshCounter += 1; freshCounter }

      var engineSide: DiffFuzz.SideState = null
      var oracleSide: DiffFuzz.SideState = null
      var baseStmts: Seq[String] = Seq.empty

      def reseed(): Unit = {
        val session = new GraphSession(spark)
        oracle.reset()
        engineSide = new DiffFuzz.SideState("engine", (q, p) =>
          try {
            val o = if (p.isEmpty) session.execute(q)
                    else session.executeWithParams(q, p)
            Right(DiffFuzz.SideResult(o.rows,
              Some((o.affectedNodes, o.affectedRels, o.mutated))))
          } catch { case e: graft.cypher.Parser.ParseException => Left(e.getMessage) })
        oracleSide = new DiffFuzz.SideState("reference", (q, p) => oracle.run(q, p))
        baseStmts.foreach { s => engineSide.run(s, Map.empty); oracleSide.run(s, Map.empty) }
        engineSide.refresh(); oracleSide.refresh()
      }

      baseStmts = DiffFuzz.genGraph(rnd).stmts
      reseed()

      var step = 0
      while (step < trials) {
        step += 1
        val base = rnd.nextInt(10) match {
          case n if n < 6 => DiffFuzz.genQuery(rnd)
          case n if n < 8 => DiffFuzz.genMutation(rnd, () => fresh())
          case 8 => s"""MATCH NODE La WHERE g = "g1" AND HAS("opt")"""
          case _ => s"""CREATE NODE Lb {k:"mf${fresh()}", g:"g2"}"""
        }
        var stmt = base
        (0 to rnd.nextInt(2)).foreach(_ => stmt = mutate(rnd, stmt))

        val er = engineSide.run(stmt, Map.empty)
        val or = oracleSide.run(stmt, Map.empty)
        val oraclePanicked = or.left.exists(_.startsWith("panic: "))

        (er.left.map(DiffFuzz.normErr), or.left.map(DiffFuzz.normErr)) match {
          case (Left(a), Left(b)) =>
            if (a != b) mismatches += DiffFuzz.Mismatch(seed, step, stmt,
              s"engine error [$a] vs reference error [$b]")
          case (Left(a), Right(_)) =>
            mismatches += DiffFuzz.Mismatch(seed, step, stmt,
              s"engine error [$a] but reference succeeded")
          case (Right(_), Left(b)) =>
            mismatches += DiffFuzz.Mismatch(seed, step, stmt,
              s"engine succeeded but reference error [$b]")
          case (Right(a), Right(b)) =>
            val ra = a.rows.map(engineSide.canonRow).sorted
            val rb = b.rows.map(oracleSide.canonRow).sorted
            if (ra != rb) mismatches += DiffFuzz.Mismatch(seed, step, stmt,
              s"engine rows [${ra.mkString("; ")}] vs reference rows [${rb.mkString("; ")}]")
            (a.meta, b.meta) match {
              case (Some(x), Some(y)) if x != y =>
                mismatches += DiffFuzz.Mismatch(seed, step, stmt,
                  s"engine (nodes,rels,mutated)=$x vs reference $y")
              case _ =>
            }
        }

        if (oraclePanicked) {
          // post-panic oracle state is unobservable in the real binary
          // (the process dies) — realign instead of comparing
          reseed()
        } else if (maybeMutating(stmt) || er.exists(_.meta.exists(_._3)) ||
                   or.exists(_.meta.exists(_._3))) {
          engineSide.refresh(); oracleSide.refresh()
          if (engineSide.stateCanon != oracleSide.stateCanon)
            mismatches += DiffFuzz.Mismatch(seed, step, stmt,
              s"state diverged: engine-only " +
                s"${(engineSide.stateCanon._1.diff(oracleSide.stateCanon._1) ++
                     engineSide.stateCanon._2.diff(oracleSide.stateCanon._2)).take(4)}" +
                s" ; reference-only " +
                s"${(oracleSide.stateCanon._1.diff(engineSide.stateCanon._1) ++
                     oracleSide.stateCanon._2.diff(engineSide.stateCanon._2)).take(4)}")
        }
      }

      if (mismatches.isEmpty) println(s"seed $seed: OK ($trials trials)")
      else {
        bad += 1
        mismatches.foreach(m =>
          println(s"seed $seed step ${m.step}: ${m.stmt}\n  -> ${m.detail}"))
      }
    }
    oracle.close()
    println(s"${to - from + 1} seeds, $bad with mismatches")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
