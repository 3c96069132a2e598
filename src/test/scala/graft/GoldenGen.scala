package graft

/** Dev tool: record the golden corpus for GoldenReplaySpec.
  *
  * Runs the [[DiffFuzz.GoldenStore.Seeds]] seeds THREE-WAY (engine vs
  * clean-room model vs the reference's own executor) and snapshots the
  * adjudicated canonical outcome of every statement — result rows,
  * counters, mutated flag, and post-mutation full state — to
  * `src/test/resources/golden/diff_goldens.txt`. Recording ABORTS if
  * any side disagrees, so a golden line is by construction a behavior
  * all three implementations produced together.
  *
  * Usage (oracle binary required — see tools/refharness/README.md):
  *   tools/refharness/build.sh
  *   GRAFT_REF_ORACLE=tools/refharness/target/release/refharness \
  *     tools/run.sh graft.GoldenGen
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val binary = sys.env.getOrElse("GRAFT_REF_ORACLE",
      sys.error("GRAFT_REF_ORACLE must point at the refharness binary — " +
        "goldens are only recorded under three-way adjudication"))
    val spark = SparkTestSession.spark
    val oracle = new DiffFuzz.RefOracle(binary)
    val store = new DiffFuzz.GoldenStore(recording = true)
    DiffFuzz.GoldenStore.Seeds.foreach { seed =>
      val ms = DiffFuzz.runSeed(seed, spark, Some(oracle), Some(store))
      if (ms.nonEmpty) {
        ms.foreach(m => println(s"seed $seed step ${m.step}: ${m.stmt}\n  -> ${m.detail}"))
        sys.error(s"seed $seed disagreed on ${ms.size} statement(s) — NOT recording")
      }
      println(s"seed $seed: recorded")
    }
    oracle.close()
    val path = DiffFuzz.GoldenStore.defaultPath
    store.save(path)
    println(s"goldens written to $path")
    spark.stop()
  }
}
