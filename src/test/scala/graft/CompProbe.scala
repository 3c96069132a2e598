package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: per-sweep convergence of the dedup-cluster components
  * (q43/q44) — prints the sweep at which the label checksum stabilizes. */
object CompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.types.DecimalType
    def probe(name: String, ids: org.apache.spark.sql.DataFrame,
        pairs: org.apache.spark.sql.DataFrame): Unit = {
      val und = pairs.select(col("a").as("u"), col("b").as("v"))
        .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint(true)
      var lbl = ids.select(col("id"), col("id").as("lbl"))
      for (sweep <- 1 to 8) {
        val nbr = und.join(lbl.withColumnRenamed("id", "v"), "v")
          .select(col("u").as("id"), col("lbl"))
        val t0 = System.nanoTime()
        lbl = lbl.unionByName(nbr).groupBy("id").agg(min("lbl").as("lbl"))
          .localCheckpoint(true)
        val tSweep = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val s = lbl.agg(sum(col("lbl").cast(DecimalType(38, 0)))).head().getDecimal(0)
        val tSum = (System.nanoTime() - t1) / 1e9
        println(f"$name sweep $sweep: sum=$s sweep=${tSweep}%.2fs sumjob=${tSum}%.2fs")
      }
    }
    probe("q43",
      Tables.documents(spark, sfDir).select(col("doc_id").as("id")),
      operators.TextOps.ngramJaccardPairs(spark, sfDir)
        .select(col("a_id").as("a"), col("b_id").as("b")))
    probe("q44",
      Tables.embeddings(spark, sfDir).select(col("vec_id").as("id")),
      operators.SimilarityOps.cosineNearDupPairs(spark, sfDir)
        .select(col("a_id").as("a"), col("b_id").as("b")))
    spark.stop()
  }
}
