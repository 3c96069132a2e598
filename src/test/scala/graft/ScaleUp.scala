package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an N×-replicated copy of an sf dir so the
  * query pack's runtime SCALING can be measured, not guessed.
  *
  * Replication models organic growth, not densification: every fact
  * table is copied N times with key offsets that keep foreign keys
  * coherent inside each replica (replica i's orders point at replica
  * i's customers), so key cardinality grows N× while per-key row
  * counts stay constant — the growth mode a real corpus has. The
  * events stream is additionally TIME-SHIFTED per replica by the full
  * span + 1 h, so the stream gets N× longer rather than N× denser and
  * per-bucket pair counts in the temporal range joins stay a data
  * property, not a replication artifact. Dimension tables (region,
  * nation) stay fixed, like the real world. Replica 0 is the original
  * data bit-for-bit, so id-anchored query constants (q28's
  * `vec_id < 8` query set, contamination's eval slice) keep their
  * meaning.
  *
  * Usage: tools/run.sh graft.ScaleUp /root/testdata/sf0.1 /tmp/sfx10 10
  * then SPARK_GRAFT_SF_DIR=/tmp/sfx10 tools/run.sh graft.Bench
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, nStr) = args.take(3)
    val n = nStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // replica index 0..n-1 exploded per row; offsets are i * base where
    // base = max(key)+1 so replicas never collide. Keys are read as
    // Number: the testdata contract allows int32 key columns, where
    // getLong would ClassCastException
    def keyBase(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getAs[Number](0).longValue + 1L
    def replicate(df: DataFrame, shifted: (DataFrame, Column) => DataFrame): DataFrame = {
      val withI = df.withColumn("__i", explode(sequence(lit(0L), lit(n - 1L))))
      shifted(withI, col("__i")).drop("__i")
    }

    // dims: fixed
    write(read("region"), "region")
    write(read("nation"), "nation")

    val cust = read("customer"); val cBase = keyBase(cust, "c_custkey")
    write(replicate(cust, (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + i * cBase)), "customer")

    val supp = read("supplier"); val sBase = keyBase(supp, "s_suppkey")
    write(replicate(supp, (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + i * sBase)), "supplier")

    val part = read("part"); val pBase = keyBase(part, "p_partkey")
    write(replicate(part, (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + i * pBase)), "part")

    val ord = read("orders"); val oBase = keyBase(ord, "o_orderkey")
    write(replicate(ord, (d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + i * oBase)
      .withColumn("o_custkey", col("o_custkey") + i * cBase)), "orders")

    write(replicate(read("lineitem"), (d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + i * oBase)
      .withColumn("l_partkey", col("l_partkey") + i * pBase)
      .withColumn("l_suppkey", col("l_suppkey") + i * sBase)), "lineitem")

    // events go through the engine's width-agnostic reader
    // (Tables.events → deriveTsNs): a plain read crashes on a
    // TIMESTAMP(NANOS) regeneration, and a timestampadd-based shift
    // breaks on the LongType ts that nanosAsLong produces. The shift is
    // pure Long arithmetic on ts_ns, and the result is written back
    // under the on-disk name `ts` at the canonical LongType raw-nanos
    // width (deriveTsNs maps LongType ts → ts_ns losslessly on re-read)
    val ev = Tables.events(spark, src)
    val eBase = keyBase(ev, "event_id")
    val uBase = keyBase(ev, "user_id")
    val Array(tsMin, tsMax) =
      ev.agg(min(col("ts_ns")), max(col("ts_ns"))).head
        .toSeq.map(_.asInstanceOf[Long]).toArray
    val shiftNs = (tsMax - tsMin) + 3600L * 1000000000L
    write(replicate(ev, (d, i) => d
      .withColumn("event_id", col("event_id") + i * eBase)
      .withColumn("user_id", col("user_id") + i * uBase)
      .withColumn("ts_ns", col("ts_ns") + i * shiftNs))
      .withColumnRenamed("ts_ns", "ts"),
      "events")

    val doc = read("documents"); val dBase = keyBase(doc, "doc_id")
    write(replicate(doc, (d, i) =>
      d.withColumn("doc_id", col("doc_id") + i * dBase)), "documents")

    val emb = read("embeddings"); val vBase = keyBase(emb, "vec_id")
    write(replicate(emb, (d, i) =>
      d.withColumn("vec_id", col("vec_id") + i * vBase)), "embeddings")

    println(s"""{"scaled": $n, "src": "$src", "dst": "$dst"}""")
    spark.stop()
  }
}
