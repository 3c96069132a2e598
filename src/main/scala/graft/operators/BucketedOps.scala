package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Bucketed-table (hive-style bucketing) support — the CO-LOCATED JOIN
  * path. A fact-fact join on raw parquet always shuffles both sides on
  * the join key; when both tables are WRITTEN bucketed (and sorted) by
  * that key with the same bucket count, Spark's bucketed scan exposes
  * the hash-partitioning to the planner and the SortMergeJoin runs with
  * ZERO Exchange on either side — at 100 TB that deletes the two
  * largest shuffles of the workload. `PlanShapeSpec` pins exactly that:
  * the physical plan of [[bucketedRevenueByPriority]]'s join carries no
  * ShuffleExchange below the join.
  *
  * The bucket count is a `buckets` knob (default 8 — test-scale; a
  * warehouse deployment sizes it to data volume ÷ target partition
  * size once, at ingest). Bucketed layout is an INGEST-TIME choice:
  * this object materializes the bucketed copies once per (session,
  * dataset) into a temp warehouse dir and registers them in the session
  * catalog, mirroring what a production pipeline does once on landing.
  */
object BucketedOps {

  /** Best-effort recursive delete — external-table DROP keeps files and
    * deleteOnExit can't remove non-empty dirs, so eviction has to walk. */
  private def rmTree(root: java.io.File): Unit =
    try {
      val fs = Option(root.listFiles()).getOrElse(Array.empty)
      fs.foreach(f => if (f.isDirectory) rmTree(f) else { f.delete(); () })
      root.delete(); ()
    } catch { case _: Throwable => () }

  // eviction drops the catalog entries AND the on-disk copies, so a
  // long-lived daemon cycling datasets doesn't accumulate stale
  // bucketed tables or orphaned parquet under /tmp (DROP TABLE on a
  // path-backed table removes only metadata)
  private val ensured = new graft.core.BoundedCache[(String, String, Int),
      (SparkSession, String, String, java.io.File)](
    release = { case (sess, ot, lt, dir) =>
      try {
        sess.sql(s"DROP TABLE IF EXISTS $ot")
        sess.sql(s"DROP TABLE IF EXISTS $lt")
      } catch { case _: Throwable => () }
      rmTree(dir)
    })

  /** Materialize bucketed `orders`/`lineitem` copies for `d` (once per
    * session+dataset+bucket-count) and return their catalog table
    * names. `buckets` is part of the cache key: co-locating against
    * another table requires matching bucket counts, so an 8-bucket
    * cache hit must never satisfy a 16-bucket request. */
  def ensureBucketed(s: SparkSession, d: String, buckets: Int = 8):
      (String, String) = {
    val (_, ot, lt, _) = ensuredEntry(s, d, buckets)
    (ot, lt)
  }

  private def ensuredEntry(s: SparkSession, d: String, buckets: Int):
      (SparkSession, String, String, java.io.File) =
    ensured.getOrElseUpdate((s.sparkContext.applicationId, d, buckets)) {
      val sfx = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#$buckets".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val dir = Files.createTempDirectory(s"graft_bucketed_$sfx").toFile
      dir.deleteOnExit()
      val (ot, lt) = (s"graft_orders_$sfx", s"graft_lineitem_$sfx")
      Tables.orders(s, d).write.format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"${dir.getAbsolutePath}/$ot")
        .mode("overwrite").saveAsTable(ot)
      Tables.lineitem(s, d).write.format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"${dir.getAbsolutePath}/$lt")
        .mode("overwrite").saveAsTable(lt)
      (s, ot, lt, dir)
    }

  /** q73: revenue by order priority off the BUCKETED orders⋈lineitem
    * join — numerically identical to the raw-parquet join (the oracle
    * runs on the raw files), but the join itself is co-located: both
    * bucketed scans report hash-partitioning on the order key, so the
    * only Exchange in the plan is the tiny priority-keyed aggregate
    * above the join. */
  def bucketedRevenueByPriority(s: SparkSession, d: String): DataFrame = {
    val (ot, lt) = ensureBucketed(s, d)
    s.table(ot).join(s.table(lt), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** DuckDB rendering of [[bucketedRevenueByPriority]] (raw parquet —
    * bucketing is a physical-layout property, not a semantic one). */
  def bucketedRevenueOracleSql(): String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // eviction deletes the partitioned copy from disk (same rationale as
  // the bucketed cache: deleteOnExit can't remove non-empty dirs)
  private val partitioned =
    new graft.core.BoundedCache[(String, String), java.io.File](
      release = rmTree)

  /** Materialize an `event_type`-partitioned copy of `events` (once per
    * session+dataset) and return its root path — hive-style partition
    * directories, the layout a warehouse lands high-volume event data
    * in so per-type queries PRUNE partitions instead of scanning and
    * filtering. */
  def ensurePartitionedEvents(s: SparkSession, d: String): String = {
    val dir = partitioned.getOrElseUpdate((s.sparkContext.applicationId, d)) {
      val tmp = Files.createTempDirectory("graft_part_events").toFile
      tmp.deleteOnExit()
      Tables.events(s, d).write.partitionBy("event_type")
        .mode("overwrite").parquet(s"${tmp.getAbsolutePath}/events")
      tmp
    }
    s"${dir.getAbsolutePath}/events"
  }

  /** q76: per-type stats off the PARTITIONED events layout, filtered to
    * one type — the scan must show the predicate as a PartitionFilter
    * (directory pruning, zero data files of other types read; pinned in
    * PlanShapeSpec). Numerically identical to filtering the flat file,
    * which is exactly what the oracle does. */
  def partitionPrunedTypeStats(s: SparkSession, d: String,
      eventType: String = "purchase"): DataFrame = {
    val path = ensurePartitionedEvents(s, d)
    // explicit schema: skips the footer-inference listing pass, and a
    // ZERO-ROW source writes no partition dirs at all — inference would
    // throw UNABLE_TO_INFER_SCHEMA where the schema is statically known
    s.read.schema(Tables.events(s, d).schema).parquet(path)
      .filter(col("event_type") === eventType)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** DuckDB rendering of [[partitionPrunedTypeStats]] (flat scan +
    * filter — partitioning is layout, not semantics). */
  def partitionPrunedOracleSql(eventType: String = "purchase"): String =
    s"""SELECT event_type, COUNT(*) AS cnt,
       |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events WHERE event_type = '$eventType'
       |GROUP BY event_type ORDER BY event_type""".stripMargin
}
