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
    // metadata overlap via per-NODE "k=v" arrays + native array_intersect
    // per edge. The per-edge map_filter lambda formulation evaluates the
    // captured-map lambda interpreted on every PAIR — measured 264 s for
    // 2.7M pairs vs ~10 s this way; per-node prep is O(|V|), per-edge
    // work is a native intersect of ≤|props| strings.
    val prepped = g.nodes.select(col("id"), col("label"),
      transform(map_entries(col("properties")),
        e => concat(e.getField("key"), lit("="), e.getField("value"))).as("kv"),
      greatest(size(col("properties")).cast("double"), lit(1.0)).as("nprops"))
      .localCheckpoint(true)
    val n1 = prepped.select(col("id").as("u"), col("label").as("u_label"),
      col("kv").as("u_kv"), col("nprops").as("u_nprops"))
    val n2 = prepped.select(col("id").as("v"), col("label").as("v_label"),
      col("kv").as("v_kv"))
    undirectedEdges(g)
      .join(n1, "u").join(n2, "v")
      .withColumn("overlap",
        size(array_intersect(col("u_kv"), col("v_kv"))).cast("double"))
      .withColumn("weight",
        lit(1.0) +
          when(col("u_label") === col("v_label"), 0.75).otherwise(0.0) +
          lit(0.5) * col("overlap") / col("u_nprops"))
      .select("u", "v", "weight")
  }

  /** Weighted label propagation (GA2): every node starts as its own
    * community; up to `maxSweeps` synchronous sweeps (the reference
    * sweeps sequentially over id-sorted nodes — a Gauss-Seidel order
    * that a distributed engine replaces with Jacobi sweeps + a
    * deterministic tie-break on the smallest community id); early-stops
    * when no assignment changes. Returns (id, community) with community
    * named by its seed node's id.
    *
    * Implementation: GraphX aggregateMessages over integer-encoded
    * vertex ids. A DataFrame-loop formulation pays per-sweep query
    * planning + full shuffle materialization (measured ~15 s/sweep at
    * sf0.1); GraphX keeps the edge RDD cached and partition-local
    * across sweeps. Edge weights are computed once, declaratively, in
    * [[weightedNeighborPairs]].
    */
  def weightedLabelPropagation(g: PropertyGraph, maxSweeps: Int = 8): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    val spark = g.nodes.sparkSession
    import spark.implicits._

    // integer-encode node ids (xxhash64 — deterministic, shuffle-free;
    // swap for zipWithIndex at billions-of-nodes scale where 64-bit
    // hash collisions become material)
    val idMap = g.nodes.select(col("id"), xxhash64(col("id")).as("vid"))
      .localCheckpoint(true)
    val pairsDf = weightedNeighborPairs(g)
      .select(xxhash64(col("u")).as("u"), xxhash64(col("v")).as("v"), col("weight"))

    // messages flow v -> u (u adopts from neighbors v)
    val edgeRdd = pairsDf.as[(Long, Long, Double)].rdd
      .map { case (u, v, w) => Edge(v: VertexId, u: VertexId, w) }
    val vertRdd = idMap.select(col("vid")).as[Long].rdd.map(v => (v: VertexId, v))
    val graph0 = Graph(vertRdd, edgeRdd).cache()

    var graph = graph0
    var sweep = 0
    var changed = true
    while (sweep < maxSweeps && changed) {
      sweep += 1
      // per-community weight sums arriving at each vertex, as flat
      // ((dst, community), w) tuples — a Map-valued message merge is
      // O(neighbors²) on hub vertices (measured superlinear blowup)
      val adopted = graph.triplets
        .map(t => ((t.dstId, t.srcAttr), t.attr))
        .reduceByKey(_ + _)
        .map { case ((u, c), w) => (u, (c, w)) }
        // argmax weight, ties to the smallest community id
        .reduceByKey((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a)
        .mapValues(_._1)
      val prev = graph
      graph = graph.outerJoinVertices(adopted) {
        (_, old, newOpt) => newOpt.getOrElse(old)
      }.cache()
      graph.vertices.count()
      changed = prev.vertices.join(graph.vertices)
        .filter { case (_, (o, n)) => o != n }.take(1).nonEmpty
      prev.unpersistVertices(blocking = false)
    }
    val assignment = graph.vertices.toDF("vid", "comm_vid")
    // map vids back to node-id strings for both member and community
    assignment
      .join(idMap, "vid")
      .join(idMap.select(col("vid").as("comm_vid"), col("id").as("community")),
        Seq("comm_vid"))
      .select("id", "community")
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
