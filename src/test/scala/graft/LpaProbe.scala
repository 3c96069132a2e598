package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraphBuilder
import graft.algo.GraphAlgos

/** Temporary instrumentation: stage-by-stage timing of the q32 path. */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.graft.lpa.verbose", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val g = time("graph build+materialize") { GraphBuilder.fromTables(spark, sfDir).materialized }
    println(s"[probe] nodes=${g.nodes.count()} edges=${g.edges.count()}")
    val pairs = time("weightedNeighborPairs count") {
      val p = GraphAlgos.weightedNeighborPairs(g); val n = p.count(); println(s"[probe] pairs=$n"); p
    }
    val asg = time("weightedLabelPropagation (8 sweeps)") {
      val a = GraphAlgos.weightedLabelPropagation(g); a.count(); a
    }
    time("communityDensity") { GraphAlgos.communityDensity(g, asg).count() }
    spark.stop()
  }
}
