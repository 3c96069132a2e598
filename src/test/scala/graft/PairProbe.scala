package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: stage timing of the q57/q58 pair generation at scale,
  * new (collect+explode) vs old (self-join) formulations. */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tme[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pair] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val lp = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct().localCheckpoint(true)
    println(s"[pair] memb rows=${lp.count()}")
    val baskets = lp.groupBy("okey")
      .agg(array_sort(array_distinct(collect_list(col("pkey")))).as("ps"))
      .filter(size(col("ps")) <= 64)
    tme("A groupBy collect only (count)") { baskets.count() }
    tme("A basket size histogram") {
      baskets.select(size(col("ps")).as("n")).groupBy("n").count()
        .orderBy(desc("n")).show(5)
    }
    val pairsNew = baskets
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
      .select(col("p1"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
    for (r <- 1 to 2) tme(s"NEW full pair count run$r") { println("pairs=" + pairsNew.count()) }
    // old formulation
    val kept = lp.join(
      lp.groupBy("okey").agg(count(lit(1)).as("bsize"))
        .filter(col("bsize") <= 64).select("okey"), "okey")
      .localCheckpoint(true)
    val pairsOld = kept.select(col("okey"), col("pkey").as("p1"))
      .join(kept.select(col("okey"), col("pkey").as("p2")), "okey")
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
    for (r <- 1 to 2) tme(s"OLD full pair count run$r") { println("pairs=" + pairsOld.count()) }
    // variant C: window-based cap + self-join, no checkpoint, no object agg
    import org.apache.spark.sql.expressions.Window
    val keptW = lp
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("okey")))
      .filter(col("bsize") <= 64)
    val pairsWin = keptW.select(col("okey"), col("pkey").as("p1"))
      .join(keptW.select(col("okey"), col("pkey").as("p2")), "okey")
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
    for (r <- 1 to 2) tme(s"WIN full pair count run$r") { println("pairs=" + pairsWin.count()) }
    // ---- q58 shape: supplier pairs per part ----
    val sp = Tables(spark, sfDir, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
      .distinct().localCheckpoint(true)
    println(s"[pair] sp rows=${sp.count()}")
    val keptOld = sp.join(
      sp.groupBy("pk").agg(count(lit(1)).as("pdeg"))
        .filter(col("pdeg") <= 1000).select("pk"), "pk")
      .localCheckpoint(true)
    val sharedOld = keptOld.select(col("pk"), col("sk").as("s1"))
      .join(keptOld.select(col("pk"), col("sk").as("s2")), "pk")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("shared"))
    for (r <- 1 to 2) tme(s"q58-OLD run$r") { println("pairs=" + sharedOld.count()) }
    val keptWin = sp
      .withColumn("pdeg", count(lit(1)).over(Window.partitionBy("pk")))
      .filter(col("pdeg") <= 1000)
    val sharedWin = keptWin.select(col("pk"), col("sk").as("s1"))
      .join(keptWin.select(col("pk"), col("sk").as("s2")), "pk")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("shared"))
    for (r <- 1 to 2) tme(s"q58-WIN run$r") { println("pairs=" + sharedWin.count()) }
    spark.stop()
  }
}
