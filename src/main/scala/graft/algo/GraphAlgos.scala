package graft.algo

import graft.core.Materialize.GraftMaterializeOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 60-bit integer encoding of a node-id string: first 15 hex chars of
    * its md5, as a positive long. Used as the LPA community identity
    * (and tie-break order), chosen over xxhash64 because the identical
    * value is computable in DuckDB — `('0x' || substring(md5(id), 1,
    * 15))::BIGINT` — which makes the whole LPA chain oracle-checkable
    * (see GraphOps.lpaOracleSql). */
  private[graft] def vidExpr(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Integer fixed-point PageRank over the DIRECTED multigraph, run for
    * a fixed `sweeps` count: pr₀ = scale; pr_{k+1}(v) = (scale·15) div
    * 100 + (17 · Σ_{u→v} (pr_k(u) div outdeg(u))) div 20 (damping
    * 0.85 = 17/20 as exact integer arithmetic). Every operation is
    * integer add/div, so sums are ORDER-INDEPENDENT and the paired
    * DuckDB oracle matches bit-for-bit — the same trick that makes the
    * LPA chain checkable. Dangling-node mass is dropped (no out-edges →
    * no contribution), a documented divergence from the classic
    * redistribute-everywhere formulation that keeps every term local.
    *
    * Overflow: total mass is bounded by n·scale (the damped fixpoint of
    * M ← 0.15·n·scale + 0.85·M), and on a hub-heavy graph a single
    * node's in_sum can approach that whole mass, so the worst-case
    * guard is 17·n·scale < 2⁶³ — with scale=10¹⁰ that holds to
    * ~5·10⁷ nodes (asserted below); larger graphs lower `scale`.
    *
    * Scale shape: one groupBy-sum shuffle per sweep with map-side
    * partial aggregation; edges and out-degrees are checkpointed once
    * and reused; superseded rank snapshots are unpersisted (the same
    * loop hygiene as Components/LPA). */
  def pageRankInt(g: PropertyGraph, sweeps: Int = 8,
      scale: Long = 10000000000L): DataFrame =
    pageRankLoop(g, None, sweeps, scale)

  /** PERSONALIZED integer PageRank: identical exact-integer loop, but
    * both the initial mass and the per-sweep restart term go ONLY to
    * nodes labeled `seedLabel` — rank measures proximity to the seed
    * set (random walk with restart), the graph-similarity primitive
    * behind recommendation / related-entity queries. Same overflow
    * bound (seed mass ≤ full mass), same oracle-checkable arithmetic. */
  def personalizedPageRankInt(g: PropertyGraph, seedLabel: String,
      sweeps: Int = 8, scale: Long = 10000000000L): DataFrame =
    pageRankLoop(g, Some(seedLabel), sweeps, scale)

  /** The rank family's seed-INDEPENDENT derived artifacts, cached per
    * (session, graph instance): the (id, vid) map and the
    * hash-partitioned (src → (dst, outdeg)) edge RDD. q53 and q101 run
    * the same loop over the same graph with different seed sets — before
    * r13 each call re-derived and re-persisted the identical edge chain
    * (2.8M vid hashes + partition + degree join, ~5 s cold at sf0.1);
    * now the second ranker reuses the blocks, the same
    * derived-artifact pattern as GraphOps.graphCache. Keyed by the
    * graph's edge-frame identity (graphCache hands every caller the
    * same PropertyGraph instance per dataset); eviction unpersists. */
  private val rankArtifacts = new graft.core.BoundedCache[
    (String, Int),
    (DataFrame, org.apache.spark.rdd.RDD[(Long, (Long, Long))],
      org.apache.spark.HashPartitioner)](
    release = { v =>
      graft.core.BoundedCache.releaseDf(v._1); v._2.unpersist(false); ()
    })

  private def pageRankLoop(g: PropertyGraph, seedLabel: Option[String],
      sweeps: Int, scale: Long): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val base = scale * 15 / 100
    // Same co-partitioned RDD loop as weightedLabelPropagation: a
    // DataFrame loop re-shuffles the full edge list every sweep
    // (localCheckpoint erases partitioning metadata, so Catalyst plans
    // 3 exchanges/sweep — measured 13.3 s at sf0.1); here the
    // (src→(dst,deg)) RDD is hash-partitioned once, the per-sweep rank
    // lookup and the rank update are narrow joins, and the only shuffle
    // is the flat-tuple (dst, share) reduceByKey.
    val (idMap, eDeg, part) = rankArtifacts.getOrElseUpdate(
      (sc.applicationId, System.identityHashCode(g.edges))) {
      val ids = g.nodes.select(col("id"), vidExpr(col("id")).as("vid"))
        .graftCheckpoint()
      val p = new HashPartitioner(math.max(sc.defaultParallelism, 16))
      val eBySrc: RDD[(Long, Long)] = g.edges
        .select(vidExpr(col("src")).as("s"), vidExpr(col("dst")).as("d"))
        .as[(Long, Long)].rdd
        .partitionBy(p).persist(StorageLevel.MEMORY_AND_DISK)
      val outdeg = eBySrc.mapValues(_ => 1L).reduceByKey(p, _ + _)
      val ed: RDD[(Long, (Long, Long))] = eBySrc.join(outdeg) // narrow
        .persist(StorageLevel.MEMORY_AND_DISK)
      ed.count()
      eBySrc.unpersist(blocking = false)
      (ids, ed, p)
    }
    // hub-heavy worst case: one node can receive ~all the total mass
    // n·scale, and the update multiplies by 17 before dividing
    require(BigInt(17) * idMap.count() * scale < BigInt(Long.MaxValue),
      s"pageRankInt overflow guard: 17*n*scale must stay < 2^63; lower scale=$scale")
    // per-node restart term: `base` at seeds, 0 elsewhere (uniform run
    // = every node a seed); co-partitioned once, narrow-joined per sweep
    val seedCol = seedLabel
      .map(l => col("label") === l).getOrElse(lit(true))
    val seeds = g.nodes.select(vidExpr(col("id")).as("vid"),
      seedCol.as("seed"))
    val seedBase: RDD[(Long, Long)] = seeds
      .select(col("vid"), when(col("seed"), base).otherwise(0L).as("b"))
      .as[(Long, Long)].rdd.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    seedBase.count()
    var pr: RDD[(Long, Long)] = seeds
      .select(col("vid"), when(col("seed"), scale).otherwise(0L).as("p"))
      .as[(Long, Long)].rdd.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    pr.count()
    for (_ <- 1 to sweeps) {
      val contrib = eDeg.join(pr) // narrow
        .map { case (_, ((dst, deg), p)) => (dst, p / deg) }
        .reduceByKey(part, _ + _) // the sweep's one shuffle
      val prev = pr
      pr = seedBase.leftOuterJoin(contrib, part) // narrow
        .mapValues { case (b, in) => b + 17 * in.getOrElse(0L) / 20 }
        .persist(StorageLevel.MEMORY_AND_DISK)
      pr.count()
      prev.unpersist(blocking = false)
    }
    val out = pr.toDF("vid", "pr").join(idMap, "vid")
      .select("id", "pr").graftCheckpoint()
    // blocking: drop the loop's PER-SEED blocks before returning, so the
    // cleanup storm lands inside this analytic's own wall-clock instead
    // of disturbing whatever query runs next in the session. eDeg/idMap
    // stay persisted — they belong to rankArtifacts (released on
    // eviction), and the other ranker of the q53/q101 pair reuses them.
    seedBase.unpersist(blocking = true)
    pr.unpersist(blocking = true)
    out
  }

  /** Multi-source BFS hop distance over the UNDIRECTED graph: nodes
    * whose label matches `sourceLabel` start at 0, everything else at
    * null; up to `sweeps` relaxations take the min of the current
    * distance and (neighbor distance + 1). With sweeps ≥ the graph
    * diameter this is the exact shortest hop count; all-integer
    * min/plus arithmetic keeps the unrolled DuckDB oracle bit-exact
    * (nulls for unreachable nodes on both sides).
    *
    * FRONTIER form of the Jacobi sweep: with unit weights, sweep k of
    * the full relaxation assigns new distances ONLY to neighbors of
    * nodes settled in sweep k−1 (an already-settled neighbor at
    * distance d proposes d+1 ≥ any existing assignment), so messaging
    * from just the newly-settled frontier yields the identical
    * assignment after every sweep while total message volume drops
    * from sweeps·|E| to |E| — and when the frontier empties (the
    * fixpoint the fixed-sweep oracle also reaches) the loop exits
    * early.
    *
    * Scale shape: adjacency hash-partitioned once; each sweep's only
    * shuffle is the frontier's (neighbor, candidate) min-reduceByKey
    * (map-side combined); the settled-distance RDD only ever receives
    * narrow co-partitioned joins.
    *
    * Implemented as [[ssspFrom]] with unit weights — BFS is the
    * weighted relaxation's special case. */
  def hopDistanceFrom(g: PropertyGraph, sourceLabel: String,
      sweeps: Int = 8): DataFrame =
    ssspFrom(g, sourceLabel, Map.empty, sweeps)

  /** Weighted single-source shortest path from every `sourceLabel`
    * node over the undirected FK graph: Bellman–Ford with per-edge-TYPE
    * integer weights, capped at `sweeps` relaxation rounds. After k
    * rounds the assignment is EXACTLY min total weight over walks of
    * ≤ k edges — the same quantity the paired oracle's k unrolled
    * min-relax sweeps compute — whether or not the fixpoint is reached.
    *
    * FRONTIER form of the relaxation: a message dist(u)+w only needs
    * re-sending when dist(u) improved last round (distances are
    * monotone non-increasing and every sweep keeps
    * LEAST(previous, candidate), so messages from non-improved nodes
    * are redundant re-sends of an already-incorporated bound). Unlike
    * BFS, a node can improve — and hence re-enter the frontier —
    * multiple times; the loop still exits early only when the frontier
    * empties, which is the true Bellman–Ford fixpoint.
    *
    * Scale shape mirrors [[hopDistanceFrom]]: weighted adjacency
    * hash-partitioned once; each sweep's only shuffle is the frontier's
    * (neighbor, candidate) min-reduceByKey (map-side combined); the
    * settled-distance RDD only ever receives narrow co-partitioned
    * joins. */
  def ssspFrom(g: PropertyGraph, sourceLabel: String,
      typeWeights: Map[String, Long], sweeps: Int = 8): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val INF = Long.MaxValue
    val idMap = g.nodes.select(col("id"), vidExpr(col("id")).as("vid"))
      .graftCheckpoint()
    val part = new HashPartitioner(math.max(sc.defaultParallelism, 16))
    // empty map = unit weights: hopDistanceFrom's BFS is this loop's
    // special case (a settled node then never re-improves)
    // unknown edge labels default to unit weight: a bare element_at
    // returns NULL for labels missing from the map and the tuple decode
    // below would NPE at runtime — unit weight keeps a new edge type
    // traversable instead of breaking SSSP opaquely (callers that want
    // the engine/oracle edge sets in lockstep pass a complete map)
    val wExpr =
      if (typeWeights.isEmpty) lit(1L)
      else coalesce(element_at(typedLit(typeWeights), col("label")), lit(1L))
    val und: RDD[(Long, (Long, Long))] = g.edges
      .select(vidExpr(col("src")).as("s"), vidExpr(col("dst")).as("d"),
        wExpr.cast("long").as("w"))
      .as[(Long, Long, Long)].rdd
      .flatMap { case (s0, d0, w) => Seq((s0, (d0, w)), (d0, (s0, w))) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    var dist: RDD[(Long, Long)] = g.nodes
      .select(vidExpr(col("id")).as("vid"),
        when(col("label") === sourceLabel, lit(0L)).otherwise(lit(INF)).as("d"))
      .as[(Long, Long)].rdd
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // sweep-0 frontier: the seed nodes
    var frontier: RDD[(Long, Long)] = dist.filter(_._2 == 0L)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontierSize = frontier.count()
    val verbose = spark.conf.getOption("spark.graft.bfs.verbose").contains("true")
    var sweep = 0
    while (sweep < sweeps && frontierSize > 0) {
      sweep += 1
      val tSweep = System.nanoTime()
      val msg = und.join(frontier) // narrow (co-partitioned)
        .map { case (_, ((u, w), dv)) => (u, dv + w) }
        .reduceByKey(part, math.min(_, _)) // the sweep's one shuffle
      // newly-improved nodes: candidate strictly improves current dist.
      // Keys pass through unchanged, so partitioning is preserved — the
      // frontier stays co-partitioned with `und`/`dist` shuffle-free.
      val improved = msg.join(dist) // narrow (both on `part`)
        .mapPartitions(
          _.collect { case (u, (nd, d)) if nd < d => (u, nd) },
          preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val prevDist = dist
      val prevFrontier = frontier
      dist = prevDist.leftOuterJoin(improved, part) // narrow
        .mapValues { case (d, nd) => nd.getOrElse(d) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontierSize = improved.count() // materializes dist's parents too
      dist.count()
      frontier = improved
      prevDist.unpersist(blocking = false)
      prevFrontier.unpersist(blocking = false)
      if (verbose) println(f"[sssp] sweep $sweep: ${(System.nanoTime() - tSweep) / 1e9}%.1f s, frontier=$frontierSize")
    }
    val out = dist.toDF("vid", "d").join(idMap, "vid")
      .select(col("id"),
        when(col("d") === INF, lit(null).cast("bigint"))
          .otherwise(col("d")).as("dist"))
      .graftCheckpoint()
    und.unpersist(blocking = true)
    frontier.unpersist(blocking = true)
    dist.unpersist(blocking = true)
    out
  }

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
  private[graft] def weightedNeighborPairs(g: PropertyGraph): DataFrame = {
    // metadata overlap via per-NODE "k=v" arrays + native array_intersect
    // per edge. The per-edge map_filter lambda formulation evaluates the
    // captured-map lambda interpreted on every PAIR — measured 264 s for
    // 2.7M pairs vs ~10 s this way; per-node prep is O(|V|), per-edge
    // work is a native intersect of ≤|props| strings.
    val prepped = g.nodes.select(col("id"), col("label"),
      vidExpr(col("id")).as("vid"), // hashed ONCE per node, not per pair
      transform(map_entries(col("properties")),
        e => concat(e.getField("key"), lit("="), e.getField("value"))).as("kv"),
      greatest(size(col("properties")).cast("double"), lit(1.0)).as("nprops"))
      .graftCheckpoint()
    val n1 = prepped.select(col("id").as("u"), col("label").as("u_label"),
      col("vid").as("u_vid"), col("kv").as("u_kv"), col("nprops").as("u_nprops"))
    val n2 = prepped.select(col("id").as("v"), col("label").as("v_label"),
      col("vid").as("v_vid"), col("kv").as("v_kv"))
    undirectedEdges(g)
      .join(n1, "u").join(n2, "v")
      .withColumn("overlap",
        size(array_intersect(col("u_kv"), col("v_kv"))).cast("double"))
      .withColumn("weight",
        lit(1.0) +
          // same-label bonus requires a NON-EMPTY label (frontend.rs:546
          // `la == lb && !la.is_empty()`): two unlabeled nodes get no bonus
          when(col("u_label") === col("v_label") && col("u_label") =!= lit(""), 0.75)
            .otherwise(0.0) +
          lit(0.5) * col("overlap") / col("u_nprops"))
      .select("u", "v", "weight", "u_vid", "v_vid")
  }

  /** Weighted label propagation (GA2): every node starts as its own
    * community; up to `maxSweeps` synchronous sweeps (the reference
    * sweeps sequentially over id-sorted nodes — a Gauss-Seidel order
    * that a distributed engine replaces with Jacobi sweeps + a
    * deterministic tie-break on the smallest community id); early-stops
    * when no assignment changes. Returns (id, community) with community
    * named by its seed node's id.
    *
    * Implementation: a co-partitioned RDD loop. The edge list is
    * hash-partitioned ONCE by message source and cached; the community
    * RDD uses the same partitioner, so the per-sweep `edges.join(comm)`
    * and the final `comm.leftOuterJoin(best)` are both narrow (zero
    * shuffle). The only shuffle per sweep is the message aggregation —
    * `reduceByKey` over flat `((dst, comm), weight)` tuples (map-side
    * combined; primitives only, so cost is independent of the
    * configured serializer), partitioned by `dst` alone so the
    * per-destination argmax runs partition-locally and the result stays
    * co-partitioned with the community RDD. Convergence is counted by a
    * LongAccumulator inside the update pass — no separate diff join.
    * (Two prior formulations were measured and rejected: GraphX paid
    * uncopartitioned vertex joins plus a full triplets shuffle and a
    * convergence join per sweep — 1113 s at sf0.1; an `aggregateByKey`
    * with a per-destination mutable.HashMap round-tripped a boxed map
    * per node through the serializer every sweep — 90 s Java / 153 s
    * Kryo for 8 sweeps at sf0.1, and 511 s under bench memory
    * pressure.)
    */
  def weightedLabelPropagation(g: PropertyGraph, maxSweeps: Int = 8): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    import scala.collection.mutable
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext

    // integer-encode node ids (deterministic, shuffle-free; swap for
    // zipWithIndex at billions-of-nodes scale where ~60-bit hash
    // collisions become material)
    val idMap = g.nodes.select(col("id"), vidExpr(col("id")).as("vid"))
      .graftCheckpoint()
    // Hashes tuple keys by their FIRST element and scalar keys as-is, so
    // a `((dst, comm), w)` reduceByKey lands every row for `dst` in the
    // partition a plain `(dst, …)` RDD would use. Inherits
    // HashPartitioner.equals (numPartitions only), so RDDs keyed by dst
    // and RDDs keyed by (dst, comm) co-partition and join narrowly.
    class FirstElemHashPartitioner(n: Int) extends HashPartitioner(n) {
      override def getPartition(key: Any): Int = key match {
        case (a, _) => super.getPartition(a)
        case _      => super.getPartition(key)
      }
    }
    val part = new FirstElemHashPartitioner(math.max(sc.defaultParallelism, 16))

    // messages flow v -> u (u adopts from neighbors v); key by v so the
    // per-sweep community lookup is a narrow co-partitioned join.
    // Weights ride as FIXED-POINT longs (the pageRankInt trick): the
    // per-sweep reduceByKey gives no accumulation-order guarantee, and
    // IEEE double addition is non-associative — with any non-unit
    // weight (0.5·overlap/nprops is non-representable for most nprops)
    // two runs could sum to values an ulp apart and argmax different
    // communities. Each PER-EDGE weight is quantized once by a
    // deterministic double expression (same long every run), then sums
    // are exact integers. 2^20 scale × max weight 2.25 ≈ 2.4e6 per
    // edge; overflow would need a destination degree above ~3.9e12.
    val wScale = 1L << 20
    val edges: RDD[(Long, (Long, Long))] = weightedNeighborPairs(g)
      .select(col("v_vid").as("v"), col("u_vid").as("u"),
        floor(col("weight") * wScale + lit(0.5)).as("w"))
      .as[(Long, Long, Long)].rdd
      .map { case (v, u, w) => (v, (u, w)) }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var comm: RDD[(Long, Long)] = idMap.select(col("vid")).as[Long].rdd
      .map(v => (v, v)).partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    comm.count()

    val verbose = spark.conf.getOption("spark.graft.lpa.verbose").contains("true")
    var sweep = 0
    var changed = true
    while (sweep < maxSweeps && changed) {
      sweep += 1
      val tSweep = System.nanoTime()
      val changedAcc = sc.longAccumulator(s"lpaChanged$sweep")
      // sum weight per (destination, candidate community) as flat
      // primitive tuples — map-side combined, serializer-independent —
      // then argmax per destination with ties to the smallest community
      // id (the deterministic Jacobi stand-in for the reference's
      // sequential id-sorted sweep). `part` hashes (dst, comm) by dst
      // only, so the argmax is partition-local and `best` stays
      // co-partitioned with `comm` for a narrow join below.
      val best: RDD[(Long, Long)] = edges.join(comm) // narrow
        .map { case (_, ((u, w), cv)) => ((u, cv), w) }
        .reduceByKey(part, _ + _) // the sweep's one shuffle; exact BIGINT sums
        .mapPartitions({ it =>
          val bestOf = mutable.HashMap.empty[Long, (Long, Long)]
          it.foreach { case ((u, c), w) =>
            bestOf.get(u) match {
              case Some((bc, bw)) if w > bw || (w == bw && c < bc) =>
                bestOf(u) = (c, w)
              case None => bestOf(u) = (c, w)
              case _    => ()
            }
          }
          bestOf.iterator.map { case (u, (c, _)) => (u, c) }
        }, preservesPartitioning = true)
      val prev = comm
      comm = prev.leftOuterJoin(best, part) // narrow (shared partitioner)
        .mapValues { case (old, upd) =>
          val next = upd.getOrElse(old)
          if (next != old) changedAcc.add(1L)
          next
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      comm.count() // materialize → accumulator is final
      prev.unpersist(blocking = false)
      changed = changedAcc.value > 0L
      if (verbose) println(f"[lpa] sweep $sweep: ${(System.nanoTime() - tSweep) / 1e9}%.1f s, changed=${changedAcc.value}")
    }
    val assignment = comm.toDF("vid", "comm_vid")
    // map vids back to node-id strings for both member and community
    val out = assignment
      .join(idMap, "vid")
      .join(idMap.select(col("vid").as("comm_vid"), col("id").as("community")),
        Seq("comm_vid"))
      .select("id", "community")
      .graftCheckpoint()
    edges.unpersist(blocking = false)
    comm.unpersist(blocking = false)
    out
  }

  /** k-CORE PEELING: repeatedly remove nodes with undirected degree
    * < k (degree counted within the surviving subgraph), `sweeps`
    * fixed rounds with early exit only at the fixpoint — so the result
    * equals the unrolled fixed-sweep DuckDB oracle exactly, the same
    * contract as hopDistanceFrom. Returns surviving (id, deg) with the
    * degree inside the final subgraph. With sweeps ≥ the peeling depth
    * this is the exact k-core.
    *
    * Scale shape: a DataFrame loop — each sweep is one
    * map-side-combined groupBy over the still-alive edge list plus two
    * semi-joins against the (shrinking, localCheckpointed) alive set;
    * Catalyst replans each sweep over materialized inputs, and the
    * alive set only ever shrinks, so per-sweep cost is bounded by the
    * first sweep's. No driver-side iteration state beyond the loop
    * counter and the early-exit count. */
  def kCore(g: PropertyGraph, k: Int = 3, sweeps: Int = 8): DataFrame = {
    require(sweeps >= 1, "kCore needs at least one peel sweep")
    val und = undirectedEdges(g).graftCheckpoint()
    var alive = g.nodes.select(col("id"),
      lit(null).cast("bigint").as("deg")).graftCheckpoint()
    var aliveCount = alive.count()
    var sweep = 0
    var done = false
    while (sweep < sweeps && !done) {
      sweep += 1
      val next = und
        .join(alive.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(alive.select(col("id").as("v")), Seq("v"), "left_semi")
        .groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .graftCheckpoint()
      val nextCount = next.count()
      // peeling only removes, so equal COUNT means equal SET — early
      // exit ONLY at that fixpoint (identical result to running all
      // sweeps, the fixed-sweep oracle's contract; at the fixpoint the
      // carried degrees are stable too)
      done = nextCount == aliveCount
      alive = next
      aliveCount = nextCount
    }
    alive // (id, deg): survivors of the last peel, degree at that peel
  }

  /** Community density (GA4): internal undirected edge count over
    * possible pairs max(n(n−1)/2, 1). Returns (community, n_nodes,
    * internal_edges, density).
    *
    * The formula mirrors frontend.rs:602-616 exactly: the reference
    * pushes BOTH directions of every relationship into its neighbor
    * lists, counts within-community entries, and halves — which equals
    * counting each DIRECTED relationship whose endpoints share the
    * community once (a reciprocal pair contributes 2, a self-loop 1),
    * so density CAN exceed 1.0 on multigraph communities, faithfully.
    * The denominator clamps to 1 (`if possible_edges == 0`), so a
    * singleton community with a self-loop reports density 1.0, not 0. */
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
        col("internal_edges").cast("double") /
          greatest(col("n_nodes") * (col("n_nodes") - 1) / lit(2.0), lit(1.0)))
  }

  /** Distinct label / rel-type / property-key universe (A5,
    * frontend.rs:2160-2175 — the autocomplete scan). */
  def schemaSummary(g: PropertyGraph): (DataFrame, DataFrame, DataFrame) = (
    g.nodes.select("label").distinct(),
    g.edges.select("label").distinct(),
    g.nodes.select(explode(map_keys(col("properties"))).as("key")).distinct())
}
