package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphBuilder
/** Dev probe: LPA weighted-pair derivation + RDD conversion cost,
  * stock vs broadcast-hinted node joins, same JVM. */
object LpaEdgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def tme[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lpae] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val g = tme("graph") { GraphBuilder.fromTables(spark, sfDir) }
    val gslim = graft.core.PropertyGraph(
      g.nodes, g.edges.select(col("src"), col("dst"), col("label"))).materialized
    def vid(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    def prepped = gslim.nodes.select(col("id"), col("label"),
      vid(col("id")).as("vid"),
      transform(map_entries(col("properties")),
        e => concat(e.getField("key"), lit("="), e.getField("value"))).as("kv"),
      greatest(size(col("properties")).cast("double"), lit(1.0)).as("nprops"))
      .localCheckpoint(true)
    def und = gslim.edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(gslim.edges.select(col("dst").as("u"), col("src").as("v")))
    def pairs(hint: Boolean): DataFrame = {
      val p = prepped
      val n1 = p.select(col("id").as("u"), col("label").as("u_label"),
        col("vid").as("u_vid"), col("kv").as("u_kv"), col("nprops").as("u_nprops"))
      val n2 = p.select(col("id").as("v"), col("label").as("v_label"),
        col("vid").as("v_vid"), col("kv").as("v_kv"))
      val (j1, j2) = if (hint) (broadcast(n1), broadcast(n2)) else (n1, n2)
      und.join(j1, "u").join(j2, "v")
        .withColumn("overlap",
          size(array_intersect(col("u_kv"), col("v_kv"))).cast("double"))
        .withColumn("weight", lit(1.0) +
          when(col("u_label") === col("v_label") && col("u_label") =!= lit(""), 0.75)
            .otherwise(0.0) + lit(0.5) * col("overlap") / col("u_nprops"))
        .select(col("v_vid").as("v"), col("u_vid").as("u"),
          floor(col("weight") * (1L << 20) + lit(0.5)).as("w"))
    }
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val part = new HashPartitioner(32)
    for (hint <- Seq(false, true, false, true)) {
      tme(s"pairs->RDD partitionBy persist (broadcast=$hint)") {
        val e = pairs(hint).as[(Long, Long, Long)].rdd
          .map { case (v, u, w) => (v, (u, w)) }
          .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
        println("edges=" + e.count())
        e.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
