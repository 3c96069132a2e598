package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Instrumentation for the q27 cost breakdown: compares the wide
  * (64-agg-column) signature build against a long-format
  * (explode-bit, narrow agg) variant to see whether the wide
  * aggregation is codegen-degraded. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tokenRows = Tables.documents(spark, d)
      .select(col("doc_id"), explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), md5(col("tok").cast("binary")).as("h"))
      .localCheckpoint(true)
    def hexDigit(pos: Int): Column = {
      val a = ascii(substring(col("h"), pos, 1))
      when(a >= 97, a - 87).otherwise(a - 48)
    }
    for (round <- 1 to 3) {
      // wide: 64 agg columns
      val t0 = System.nanoTime()
      val bitCols = (0 until 64).map { b =>
        shiftright(hexDigit(16 - b / 4), b % 4).bitwiseAND(lit(1)).as(s"bit$b")
      }
      val voteCols = (0 until 64).map { b =>
        sum(when(col(s"bit$b") === 1, col("cnt")).otherwise(-col("cnt"))).as(s"v$b")
      }
      val wide = tokenRows.select(col("doc_id") +: col("cnt") +: bitCols: _*)
        .groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      val nWide = wide.count()
      val t1 = System.nanoTime()
      // long: explode 64 (b, ±cnt) rows, narrow agg, re-assemble array
      val longFmt = tokenRows
        .select(col("doc_id"), col("cnt"),
          posexplode(array((0 until 64).map(b =>
            shiftright(hexDigit(16 - b / 4), b % 4).bitwiseAND(lit(1))): _*))
            .as(Seq("b", "bit")))
        .groupBy("doc_id", "b")
        .agg(sum(when(col("bit") === 1, col("cnt")).otherwise(-col("cnt"))).as("v"))
        .groupBy("doc_id")
        .agg(transform(array_sort(collect_list(struct(col("b"), col("v")))),
          x => when(x("v") > 0, 1).otherwise(0)).as("bits"))
      val nLong = longFmt.count()
      val t2 = System.nanoTime()
      println(f"[simhash r$round] wide=$nWide (${(t1 - t0) / 1e9}%.2f s) " +
        f"long=$nLong (${(t2 - t1) / 1e9}%.2f s)")
    }
    spark.stop()
  }
}
