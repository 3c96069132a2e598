package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Instrumentation: verifies the dataset fact the LPA oracle relies on
  * (GraphOps.lpaSqlPrefix) — every weighted neighbor pair on the
  * FK-derived graph has weight exactly 1.0, because edges only connect
  * nodes of different types (no same-label bonus, no property
  * overlap). Run after regenerating test data or changing
  * GraphBuilder's property mapping. */
object WCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (sf <- dirs) {
      val g = graft.core.GraphBuilder.fromTables(spark, sf).materialized
      val w = graft.algo.GraphAlgos.weightedNeighborPairs(g)
      val nonUnit = w.filter(col("weight") =!= 1.0).count()
      println(s"[wcheck] $sf nonUnitWeights=$nonUnit of ${w.count()}")
      if (nonUnit > 0)
        println(s"[wcheck] WARNING: q31/q32 oracle SQL assumes all-1.0 weights")
    }
    spark.stop()
  }
}
