package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraphBuilder
import graft.algo.GraphAlgos

/** Temporary instrumentation: stage-by-stage timing of q53/q54. */
object HopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.graft.bfs.verbose", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val g = time("graph build+materialize") { GraphBuilder.fromTables(spark, sfDir).materialized }
    println(s"[probe] nodes=${g.nodes.count()} edges=${g.edges.count()}")
    time("pageRankInt (8 sweeps)") { GraphAlgos.pageRankInt(g).count() }
    time("hopDistanceFrom Region") { GraphAlgos.hopDistanceFrom(g, "Region").count() }
    time("hopDistanceFrom Region (2nd)") { GraphAlgos.hopDistanceFrom(g, "Region").count() }
    spark.stop()
  }
}
