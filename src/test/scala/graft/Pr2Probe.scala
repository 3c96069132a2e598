package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: phase timing of the REAL q101 call chain. */
object Pr2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tme[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pr2] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val g = tme("builtGraph") {
      graft.core.GraphBuilder.fromTables(spark, sfDir).materialized
    }
    val ppr = tme("personalizedPageRankInt") {
      graft.algo.GraphAlgos.personalizedPageRankInt(g, "Supplier")
    }
    tme("orderBy+count") { ppr.orderBy("id").count() }
    tme("q53 pageRankInt") { graft.algo.GraphAlgos.pageRankInt(g).orderBy("id").count() }
    spark.stop()
  }
}
