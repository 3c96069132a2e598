package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.PropertyGraph

/** Graph analytics matching the reference GUI's compute layer
  * (SURVEY §2.8): undirected degree (GA3, frontend.rs:597-600),
  * weighted label-propagation community detection (GA2,
  * frontend.rs:509-588), community density (GA4, frontend.rs:602-616).
  *
  * All DataFrame-iterative (aggregateMessages-style): each LPA sweep is
  * one shuffle on the neighbor join + one groupBy — the plan a
  * 1000-executor cluster runs unchanged. localCheckpoint per sweep cuts
  * the iterative lineage.
  */
object GraphAlgos {

  /** Undirected adjacency (GA1): both edge directions. */
  def undirectedEdges(g: PropertyGraph): DataFrame =
    g.edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(g.edges.select(col("dst").as("u"), col("src").as("v")))

  /** Undirected degree per node (GA3). Nodes with no edges get 0. */
  def degrees(g: PropertyGraph): DataFrame =
    g.nodes.select(col("id"))
      .join(undirectedEdges(g).groupBy(col("u").as("id"))
        .agg(count(lit(1)).as("degree")), Seq("id"), "left")
      .withColumn("degree", coalesce(col("degree"), lit(0L)))

  /** Edge weight of the reference's weighted LPA
    * (frontend.rs:536-562): 1.0 + 0.75·[same label]
    * + 0.5·(shared k=v metadata pairs / max(|meta_a|, 1)).
    * Note the asymmetry: the denominator is the *source* node's
    * metadata size, reproduced faithfully. */
  private def weightedNeighborPairs(g: PropertyGraph): DataFrame = {
    val n1 = g.nodes.select(col("id").as("u"), col("label").as("u_label"),
      col("properties").as("u_props"))
    val n2 = g.nodes.select(col("id").as("v"), col("label").as("v_label"),
      col("properties").as("v_props"))
    undirectedEdges(g)
      .join(n1, "u").join(n2, "v")
      .withColumn("overlap",
        size(map_filter(col("u_props"),
          (k, vv) => col("v_props")(k) === vv)).cast("double"))
      .withColumn("weight",
        lit(1.0) +
          when(col("u_label") === col("v_label"), 0.75).otherwise(0.0) +
          lit(0.5) * col("overlap") / greatest(size(col("u_props")).cast("double"), lit(1.0)))
      .select("u", "v", "weight")
  }

  /** Weighted label propagation (GA2): every node starts as its own
    * community; up to `maxSweeps` synchronous sweeps (the reference
    * sweeps sequentially over id-sorted nodes — a Gauss-Seidel order
    * that a distributed engine replaces with Jacobi sweeps + a
    * deterministic tie-break on the smallest community id); early-stops
    * when no assignment changes. Returns (id, community). */
  def weightedLabelPropagation(g: PropertyGraph, maxSweeps: Int = 8): DataFrame = {
    val pairs = weightedNeighborPairs(g).localCheckpoint(true)
    var assign = g.nodes.select(col("id"), col("id").as("community"))
      .localCheckpoint(true)
    var sweep = 0
    var changed = true
    while (sweep < maxSweeps && changed) {
      sweep += 1
      // u adopts the community with max summed incident weight;
      // min_by over struct(-w, comm) = argmax weight with smallest-id
      // tie-break — one shuffle-agg, no per-partition sort (the window
      // row_number formulation costs an extra sort per sweep at scale)
      val contrib = pairs
        .join(assign.select(col("id").as("v"), col("community").as("v_comm")), "v")
        .groupBy(col("u"), col("v_comm"))
        .agg(sum(col("weight")).as("w"))
      val best = contrib.groupBy(col("u").as("id"))
        .agg(min_by(col("v_comm"), struct(negate(col("w")), col("v_comm")))
          .as("new_comm"))
      val next = assign.join(best, Seq("id"), "left")
        .withColumn("next_comm", coalesce(col("new_comm"), col("community")))
        .select(col("id"), col("next_comm").as("community"))
        .localCheckpoint(true)
      changed = next.join(assign.withColumnRenamed("community", "old_comm"), "id")
        .filter(col("community") =!= col("old_comm"))
        .limit(1).count() > 0
      assign = next
    }
    assign
  }

  /** Community density (GA4): internal undirected edge count over
    * possible pairs n(n−1)/2. Returns (community, n_nodes,
    * internal_edges, density). */
  def communityDensity(g: PropertyGraph, assignment: DataFrame): DataFrame = {
    val sizes = assignment.groupBy("community").agg(count(lit(1)).as("n_nodes"))
    val internal = g.edges
      .join(assignment.select(col("id").as("src"), col("community").as("c1")), "src")
      .join(assignment.select(col("id").as("dst"), col("community").as("c2")), "dst")
      .filter(col("c1") === col("c2"))
      .groupBy(col("c1").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    sizes.join(internal, Seq("community"), "left")
      .withColumn("internal_edges", coalesce(col("internal_edges"), lit(0L)))
      .withColumn("density",
        when(col("n_nodes") > 1,
          col("internal_edges").cast("double") /
            (col("n_nodes") * (col("n_nodes") - 1) / lit(2.0)))
          .otherwise(lit(0.0)))
  }

  /** Distinct label / rel-type / property-key universe (A5,
    * frontend.rs:2160-2175 — the autocomplete scan). */
  def schemaSummary(g: PropertyGraph): (DataFrame, DataFrame, DataFrame) = (
    g.nodes.select("label").distinct(),
    g.edges.select("label").distinct(),
    g.nodes.select(explode(map_keys(col("properties"))).as("key")).distinct())
}
