package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalOps
import graft.streaming.StreamingOps

/** Restart-from-checkpoint recovery — the fault-tolerance contract the
  * stateful streaming ops lean on at cluster scale, exercised
  * end-to-end: a query is drained, STOPPED, the source grows, and a
  * rebuilt query resumes on the SAME checkpoint. Recovery means two
  * things, and each test proves both:
  *
  *   1. no reprocessing — the resumed run's input-row count equals
  *      exactly the rows that arrived after the first run's commit
  *      (the offset log was honored, not restarted from zero);
  *   2. state recovery — the resumed run's output reflects the FIRST
  *      run's events too, which, given (1), can only come from the
  *      recovered state store.
  *
  * StreamingSpec pins batch/stream parity of each op; this spec pins
  * that the parity SURVIVES a stop/restart boundary — without it, the
  * "bounded state, unbounded stream" story is a single-process story.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Stage the events table split into two single-file halves by time:
    * half 1 (ts < median) written now, half 2 appended by the caller
    * via `addSecondHalf`. Single files per half so the file source's
    * modification-time ordering preserves event-time order across
    * batches (the same guarantee a time-partitioned warehouse layout
    * gives a production resume). */
  private def stageHalves(): (String, Long) = {
    val root = java.nio.file.Files.createTempDirectory("ev_recovery").toString
    val ev = Tables.events(spark, sf).withColumnRenamed("ts_ns", "ts")
    val median = ev.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    ev.filter(col("ts") < median).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    (root, median)
  }

  private def addSecondHalf(root: String, median: Long): Long = {
    val ev = Tables.events(spark, sf).withColumnRenamed("ts_ns", "ts")
    val half2 = ev.filter(col("ts") >= median)
    half2.coalesce(1).write.mode("append").parquet(s"$root/events.parquet")
    half2.count()
  }

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The hourly-rollup recovery flow, shared by the provider matrix.
    * Spark records the state-store provider class in the checkpoint's
    * offset metadata and restores it on resume, so setting the conf
    * before the FIRST run makes the whole stop/restart cycle run under
    * that provider — exactly the cluster deployment shape (RocksDB =
    * state on executor local disk, bounded block-cache memory). */
  private def hourlyRecoveryFlow(tag: String): Unit = {
    val (root, median) = stageHalves()
    val ckpt = java.nio.file.Files.createTempDirectory(s"ckpt_recovery_hourly_$tag")
    def run(name: String) = StreamingOps.runToMemoryResumable(spark,
      StreamingOps.hourlyCounts(StreamingOps.eventsStream(spark, root)),
      name, ckpt, OutputMode.Complete)

    val (_, n1) = run(s"recovery_hourly_${tag}_1")
    val half2Count = addSecondHalf(root, median)
    val (t2, n2) = run(s"recovery_hourly_${tag}_2")

    // no reprocessing: the resumed run read exactly the appended file
    assert(n2 == half2Count,
      s"resumed run must read only the new rows: read $n2, new $half2Count")
    assert(n1 > 0 && half2Count > 0, "both halves must be non-trivial")
    // state recovery: Complete-mode output covers ALL events although
    // the resumed run ingested only half 2 — the half-1 contributions
    // can only come from the recovered aggregation state
    val streamed = t2.select("hour", "event_type", "cnt", "sum_value")
      .orderBy("hour", "event_type").collect().toSeq
    val batch = RelationalOps.eventsHourly(spark, sf)
      .select("hour", "event_type", "cnt", "sum_value")
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed == batch,
      "resumed Complete-mode rollup must equal the full-data batch rollup")
  }

  test("windowed aggregation resumes from checkpoint without reprocessing") {
    hourlyRecoveryFlow("hdfs")
  }

  test("recovery survives a restart under the RocksDB state provider") {
    // RocksDbStateSpec pins result parity; this pins the OTHER half of
    // the cluster deployment contract — restart-from-checkpoint with
    // RocksDB state recovered from disk, end-to-end
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDbProvider)
    try hourlyRecoveryFlow("rocksdb")
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("sessionize stitches sessions across a stop/restart boundary") {
    // the memory sink refuses checkpoint recovery outside Complete mode,
    // so the Update-mode stateful restart goes through foreachBatch —
    // the sink shape a production pipeline uses for exactly this resume
    type Sess = (Long, Long, Long, Int, Boolean) // user, start, end, n, closed
    def run(root: String, ckpt: java.nio.file.Path): (Seq[Sess], Long) = {
      val out = collection.mutable.ArrayBuffer[Sess]()
      val q = StreamingOps.sessionize(StreamingOps.eventsStream(spark, root))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOps.SessionOut], _: Long) =>
          val rows = b.collect()
          out.synchronized { out ++= rows.map(s =>
            (s.user_id, s.session_start, s.session_end, s.n_events, s.closed)) }
          ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (out.toSeq, q.recentProgress.map(_.numInputRows).sum)
    }
    // final session set: every emitted close, plus the LAST open-session
    // progress row per user (session_end never moves backward, so max
    // (end, n) picks the final one)
    def sessionSet(rows: Seq[Sess]): Set[Sess] = {
      val closed = rows.filter(_._5)
      val open = rows.filterNot(_._5).groupBy(_._1).values
        .map(_.maxBy(s => (s._3, s._4))).toSeq
      (closed ++ open).toSet
    }

    val (root, median) = stageHalves()
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_recovery_sess")
    val (runA, _) = run(root, ckpt)
    val half2Count = addSecondHalf(root, median)
    val (runB, n2) = run(root, ckpt)
    assert(n2 == half2Count, "resumed sessionize must not reprocess half 1")

    // reference: one uninterrupted drain over the SAME two-file layout
    // (fresh checkpoint) — restart must be invisible in the session set
    val (single, _) = run(root,
      java.nio.file.Files.createTempDirectory("ckpt_recovery_sess_single"))
    assert(sessionSet(runA ++ runB) == sessionSet(single),
      "restarted session set must equal the uninterrupted run's")

    // the stitch is exercised, not vacuous: the resumed run must emit
    // closes for sessions that STARTED before the split — sessions that
    // only the recovered state could know about
    val stitched = runB.count(s => s._5 && s._2 < median / 1000000L)
    assert(stitched > 0,
      "no session spanned the restart — the recovery path was not exercised")
  }
}
