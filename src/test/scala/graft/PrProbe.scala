package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
/** Dev probe: phase timing of the q101/q53 PageRank cold path. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext
    def tme[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pr] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val g = tme("builtGraph+materialize") {
      val gg = graft.core.GraphBuilder.fromTables(spark, sfDir).materialized
      gg
    }
    import org.apache.spark.HashPartitioner
    def vid(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val idMap = tme("idMap checkpoint") {
      g.nodes.select(col("id"), vid(col("id")).as("vid"),
        (col("label") === "Supplier").as("seed")).localCheckpoint(true)
    }
    val part = new HashPartitioner(math.max(sc.defaultParallelism, 16))
    val eBySrc = tme("eBySrc partitionBy+persist") {
      val r = g.edges.select(vid(col("src")).as("s"), vid(col("dst")).as("d"))
        .as[(Long, Long)].rdd.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val eDeg = tme("outdeg+join eDeg persist") {
      val outdeg = eBySrc.mapValues(_ => 1L).reduceByKey(part, _ + _)
      val r = eBySrc.join(outdeg).persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val seedBase = tme("seedBase") {
      val r = idMap.select(col("vid"), when(col("seed"), 15L).otherwise(0L).as("b"))
        .as[(Long, Long)].rdd.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    var pr = tme("pr init") {
      val r = idMap.select(col("vid"), when(col("seed"), 100L).otherwise(0L).as("p"))
        .as[(Long, Long)].rdd.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    for (i <- 1 to 8) {
      tme(s"sweep $i") {
        val contrib = eDeg.join(pr)
          .map { case (_, ((dst, deg), p)) => (dst, p / deg) }
          .reduceByKey(part, _ + _)
        val prev = pr
        pr = seedBase.leftOuterJoin(contrib, part)
          .mapValues { case (b, in) => b + 17 * in.getOrElse(0L) / 20 }
          .persist(StorageLevel.MEMORY_AND_DISK)
        pr.count()
        prev.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
