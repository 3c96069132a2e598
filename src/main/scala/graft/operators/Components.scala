package graft.operators

import graft.core.Materialize.GraftMaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-sweep connected components shared by the dedup-clustering
  * operators (text q43, embeddings q44): min-label propagation over an
  * undirected pair set, run for UP TO `sweeps` sweeps with an early
  * exit at the fixpoint — provably identical to running all `sweeps`
  * (see below), which is what the paired DuckDB oracles unroll, so
  * engine and oracle agree bit-for-bit regardless of convergence;
  * union-find tests pin agreement with true components on real
  * near-dup data (tiny cluster diameters). Each sweep is one shuffle
  * (neighbor join + min groupBy, map-side combined) — the standard
  * iteration shape for 100 TB-scale component finding over a
  * near-linear pair set. */
object Components {

  /** `ids`: one long column `id` (every element gets a label);
    * `pairs`: long columns `a`, `b` (undirected edges). Returns
    * (id, cluster, keep) with cluster = smallest id reached within
    * `sweeps` hops and keep marking the canonical member.
    *
    * EARLY EXIT (r13, guide §1.2 — don't compute things you throw
    * away): each sweep maps the label vector through the same pure
    * function f(lbl) = min(own, neighbors), and labels are MONOTONE
    * non-increasing, so the exact Σlbl checksum (DECIMAL(38,0) — no
    * overflow, no wraparound collision) is strictly decreasing until
    * the fixpoint and constant after it. Equal consecutive checksums ⇔
    * no label changed ⇔ every remaining sweep is an identity map —
    * exiting then returns the bit-identical result of the fixed-sweep
    * unroll (pinned in PipelineOpsSpec). Near-dup clusters converge in
    * 2-3 sweeps, so this saves most of the 8 per-sweep
    * join+agg+materialize rounds (q43 warm 2.2 s → ~0.9 s at sf0.1);
    * the checksum itself is one tiny agg job over the
    * just-materialized label frame. */
  def minLabelClusters(ids: DataFrame, pairs: DataFrame, sweeps: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val und = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
      .graftCheckpoint()
    var lbl = ids.select(col("id"), col("id").as("lbl"))
    var prev: DataFrame = null
    var prevSum: Option[Option[BigDecimal]] = None
    var sweep = 0
    var converged = false
    while (sweep < sweeps && !converged) {
      sweep += 1
      val nbr = und.join(lbl.withColumnRenamed("id", "v"), "v")
        .select(col("u").as("id"), col("lbl"))
      // LAZY lineage cut: the checksum aggregation right below is the
      // materializing action, so each sweep runs ONE job (was two —
      // eager-checkpoint count + checksum)
      val next = lbl.unionByName(nbr).groupBy("id").agg(min("lbl").as("lbl"))
        .graftCheckpointLazy()
      // exact label checksum, which also computes+persists the sweep's
      // blocks (empty input sums to null — handled as a value, and two
      // empty sweeps also agree, which is correct: empty is a fixpoint)
      val curSum = Option(
        next.agg(sum(col("lbl").cast(DecimalType(38, 0))).as("s"))
          .head().getDecimal(0)).map(BigDecimal(_))
      converged = prevSum.contains(curSum)
      prevSum = Some(curSum)
      // drop the superseded sweep's blocks so repeated invocations don't
      // pin block-manager storage for the whole session
      if (prev != null) prev.unpersist(false)
      prev = lbl
      lbl = next
    }
    if (prev != null) prev.unpersist(false)
    und.unpersist(false)
    lbl.select(col("id"), col("lbl").as("cluster"),
      (col("lbl") === col("id")).as("keep"))
  }
}
