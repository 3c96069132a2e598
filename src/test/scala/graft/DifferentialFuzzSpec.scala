package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate: fixed seeds through [[DiffFuzz]], engine vs
  * the clean-room reference model. Each seed covers a random graph
  * (~6-12 nodes, 8-20 edges), its CREATE stream, 8 read queries across
  * all generator shapes, 5 mutations with full-state comparison, and
  * the param-resolution flavors. Deep sweeps (and three-way runs
  * against the vendored reference executor via GRAFT_REF_ORACLE) use
  * the [[DiffFuzz.main]] entry point; seeds 1-60 were swept three-way
  * in round 8 with zero mismatches.
  */
class DifferentialFuzzSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  Seq(1L, 2L).foreach { seed =>
    test(s"engine_matches_reference_model_seed_$seed") {
      val mismatches = DiffFuzz.runSeed(seed, spark, oracle = None)
      assert(mismatches.isEmpty, mismatches.map(m =>
        s"step ${m.step}: ${m.stmt}\n  -> ${m.detail}").mkString("\n"))
    }
  }
}
