package graft.operators

import graft.core.Materialize.GraftMaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-sweep connected components shared by the dedup-clustering
  * operators (text q43, embeddings q44): min-label propagation over an
  * undirected pair set, run for EXACTLY `sweeps` sweeps — the paired
  * DuckDB oracles unroll the identical sweeps, so engine and oracle
  * agree bit-for-bit regardless of convergence; union-find tests pin
  * agreement with true components on real near-dup data (tiny cluster
  * diameters). Each sweep is one shuffle (neighbor join + min groupBy,
  * map-side combined) — the standard iteration shape for 100 TB-scale
  * component finding over a near-linear pair set. */
object Components {

  /** `ids`: one long column `id` (every element gets a label);
    * `pairs`: long columns `a`, `b` (undirected edges). Returns
    * (id, cluster, keep) with cluster = smallest id reached within
    * `sweeps` hops and keep marking the canonical member. */
  def minLabelClusters(ids: DataFrame, pairs: DataFrame, sweeps: Int): DataFrame = {
    val und = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
      .graftCheckpoint()
    var lbl = ids.select(col("id"), col("id").as("lbl"))
    var prev: DataFrame = null
    for (_ <- 1 to sweeps) {
      val nbr = und.join(lbl.withColumnRenamed("id", "v"), "v")
        .select(col("u").as("id"), col("lbl"))
      val next = lbl.unionByName(nbr).groupBy("id").agg(min("lbl").as("lbl"))
        .graftCheckpoint()
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
