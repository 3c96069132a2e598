package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    var t0 = System.nanoTime()
    def lap(s: String): Unit = {
      println(f"[pr] $s: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
    }
    val g = graft.core.GraphBuilder.fromTables(spark, d).materialized
    g.edges.count(); g.nodes.count()
    lap("graph build")
    import spark.implicits._
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val part = new HashPartitioner(32)
    val eBySrc = g.edges
      .select(graft.algo.GraphAlgos.vidExpr(col("src")).as("s"),
        graft.algo.GraphAlgos.vidExpr(col("dst")).as("d"))
      .as[(Long, Long)].rdd.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    println("edges: " + eBySrc.count()); lap("eBySrc partition+persist")
    val outdeg = eBySrc.mapValues(_ => 1L).reduceByKey(part, _ + _)
    val eDeg = eBySrc.join(outdeg).persist(StorageLevel.MEMORY_AND_DISK)
    eDeg.count(); lap("eDeg join")
    val idMap = g.nodes.select(col("id"), graft.algo.GraphAlgos.vidExpr(col("id")).as("vid")).localCheckpoint(true)
    var pr = idMap.select(col("vid")).as[Long].rdd.map(v => (v, 10000000000L)).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    pr.count(); lap("pr init")
    for (k <- 1 to 8) {
      val contrib = eDeg.join(pr).map { case (_, ((dst, deg), p)) => (dst, p / deg) }.reduceByKey(part, _ + _)
      val prev = pr
      pr = prev.leftOuterJoin(contrib, part).mapValues { case (_, in) => 1500000000L + 17 * in.getOrElse(0L) / 20 }.persist(StorageLevel.MEMORY_AND_DISK)
      pr.count(); prev.unpersist(blocking = false)
      lap(s"sweep $k")
    }
    val out = pr.toDF("vid", "pr").join(idMap, "vid").select("id", "pr")
    println("rows: " + out.count()); lap("map back")
    spark.stop()
  }
}
