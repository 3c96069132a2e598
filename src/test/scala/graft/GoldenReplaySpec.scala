package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays the golden corpus recorded by [[GoldenGen]] under three-way
  * adjudication (engine vs clean-room model vs the reference's own Rust
  * executor, zero mismatches required at record time) and pins that the
  * engine still produces every recorded outcome — statement text,
  * canonical result rows, counters, mutated flag, and post-mutation
  * full state — WITHOUT the Rust binary present. This keeps the
  * round-8/9 parser-fidelity adjudications (clause slicing, junk
  * folding, count peel, byte-window panics, legacy WHERE quote runs,
  * lazy params) reproducible offline from a fresh checkout.
  *
  * If this spec fails after an intentional behavior change, rebuild the
  * oracle (tools/refharness/build.sh) and re-record with
  * `GRAFT_REF_ORACLE=... tools/run.sh graft.GoldenGen` — recording
  * refuses to write unless all three sides agree.
  */
class GoldenReplaySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("golden corpus replays with zero divergence and full coverage") {
    val path = DiffFuzz.GoldenStore.defaultPath
    assert(java.nio.file.Files.exists(path),
      s"golden corpus missing at $path — run graft.GoldenGen")
    val store = new DiffFuzz.GoldenStore(recording = false)
    store.load(path)
    val mismatches = DiffFuzz.GoldenStore.Seeds.flatMap { seed =>
      DiffFuzz.runSeed(seed, spark, oracle = None, golden = Some(store))
    }
    assert(mismatches.isEmpty, mismatches.map(m =>
      s"seed ${m.seed} step ${m.step}: ${m.stmt}\n  -> ${m.detail}").mkString("\n"))
    assert(store.unvisited.isEmpty,
      s"recorded golden keys never replayed: ${store.unvisited.take(8)}")
  }
}
