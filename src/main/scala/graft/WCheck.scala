package graft
object WCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val g = graft.core.GraphBuilder.fromTables(spark, sf).materialized
      val w = graft.algo.GraphAlgos.weightedNeighborPairs(g)
      val nonUnit = w.filter(org.apache.spark.sql.functions.col("weight") =!= 1.0).count()
      println(s"[wcheck] $sf nonUnitWeights=$nonUnit of ${w.count()}")
    }
    spark.stop()
  }
}
