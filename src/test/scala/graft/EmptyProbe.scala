package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: run every pack query against a ZERO-ROW twin of the
  * testdata (same schemas, canonical LongType raw-nanos events.ts).
  * At warehouse scale an upstream filter, a partition prune, or an
  * empty ingest window routinely hands an operator zero rows — any
  * query that THROWS here would take a production pipeline down on a
  * quiet day. Prints one line per query: rows, EMPTY-OK, or the
  * exception. */
object EmptyProbe {

  /** Zero-row copies of every testdata table (schemas read from `src`)
    * staged under a fresh temp dir; returns the dir. Shared with
    * EmptyInputSpec. */
  def stageEmptyTwin(spark: SparkSession, src: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("sf_empty").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val schema = spark.read.parquet(s"$src/$t.parquet").schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stageEmptyTwin(spark, "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    for (name <- names) {
      val res =
        try s"${SparkEntry.queries(name)(spark, dir).count()} rows"
        catch { case e: Throwable =>
          failed += 1
          s"FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)}"
        }
      println(f"$name%-28s $res")
    }
    println(s"\n${names.size - failed} ok, $failed fail (empty-input probe)")
    spark.stop()
  }
}
