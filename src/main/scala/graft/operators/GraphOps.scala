package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.GraphAlgos
import graft.core.GraphBuilder

/** Graph-analytics queries over the FK-derived property graph
  * (FIXTURES.md §3): the reference GUI's analytics (SURVEY §2.8)
  * rendered as driver-checkable queries.
  */
object GraphOps {

  /** One FK-derived graph per dataset per process: every graph query
    * (q30-q34) consumes the same materialized snapshot instead of
    * re-deriving the 6-table union — the shared-scan shape a warehouse
    * deployment gets from a materialized graph table. */
  // keyed by (session applicationId, dataset path): a cached DataFrame
  // is bound to the session that built it — a second session in the
  // same JVM must not receive one bound to a stopped/stale session
  private val graphCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), graft.core.PropertyGraph]

  private def builtGraph(s: SparkSession, d: String): graft.core.PropertyGraph =
    graphCache.getOrElseUpdate((s.sparkContext.applicationId, d),
      GraphBuilder.fromTables(s, d).materialized)

  /** GA3/A3: undirected degree of every node. Oracle-checked. */
  def graphDegree(s: SparkSession, d: String): DataFrame =
    GraphAlgos.degrees(builtGraph(s, d)).orderBy("id")

  /** One LPA assignment per dataset per process: q31 and q32 share it
    * (the assignment is the expensive iterative piece; density on top
    * of it is one join + two aggregations). The cached value is
    * localCheckpointed inside [[GraphAlgos.weightedLabelPropagation]],
    * so reuse costs no recomputation. */
  private val lpaCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def lpaAssignment(s: SparkSession, d: String): DataFrame =
    lpaCache.getOrElseUpdate((s.sparkContext.applicationId, d),
      GraphAlgos.weightedLabelPropagation(builtGraph(s, d)))

  /** GA2: weighted label-propagation communities (iterative — pinned by
    * determinism of the tie-break, rows-only driver check). The derived
    * graph is materialized once up front: the iterative consumer would
    * otherwise re-derive the 6-table union per sweep. */
  def lpaCommunities(s: SparkSession, d: String): DataFrame =
    lpaAssignment(s, d).orderBy("id")

  /** GA4: community density over the (shared) full LPA assignment. */
  def communityDensity(s: SparkSession, d: String): DataFrame =
    GraphAlgos.communityDensity(builtGraph(s, d), lpaAssignment(s, d))
      .withColumn("density", round(col("density"), 6))
      .orderBy("community")

  /** GA5/GA6: grouping sizes — per-label node groups (the label-centric
    * layout grouping) with per-group mean degree. Oracle-checked. */
  def labelGroups(s: SparkSession, d: String): DataFrame = {
    val g = builtGraph(s, d)
    val deg = GraphAlgos.degrees(g)
    g.nodes.select(col("id"), col("label"))
      .join(deg, "id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum(col("degree")).as("total_degree"))
      .orderBy("label")
  }

  /** A5: label / rel-type / property-key universe. Oracle-checked. */
  def schemaSummary(s: SparkSession, d: String): DataFrame = {
    val g = builtGraph(s, d)
    val (nl, el, pk) = GraphAlgos.schemaSummary(g)
    nl.select(lit("node_label").as("kind"), col("label").as("value"))
      .unionByName(el.select(lit("rel_type").as("kind"), col("label").as("value")))
      .unionByName(pk.select(lit("prop_key").as("kind"), col("key").as("value")))
      .distinct()
      .orderBy("kind", "value")
  }
}
