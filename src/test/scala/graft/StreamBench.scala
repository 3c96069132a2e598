package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

/** Dev tool: wall-clock the streaming surface over a full events
  * file-stream drain (AvailableNow trigger), for throughput records —
  * the streaming twin of QBench. Rows/sec here is events ingested
  * divided by end-to-end drain time including state management, so it
  * understates a long-lived micro-batch pipeline (which amortizes the
  * source listing + sink setup this pays once).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sfx10 tools/run.sh graft.StreamBench
  *        sessionize hourly latest
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STATE_STORE=rocksdb → measure the disk-backed scale
    // path (RocksDbStateSpec pins result parity; this measures cost)
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").exists(_.equalsIgnoreCase("rocksdb")))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // count through the width-agnostic reader: a plain read crashes on
    // TIMESTAMP(NANOS) events data before the stream path ever runs
    val nEvents = Tables.events(spark, sfDir).count()
    val names = if (args.nonEmpty) args.toSeq else Seq("sessionize", "hourly", "latest")
    for (name <- names) {
      val t0 = System.nanoTime()
      val stream = StreamingOps.eventsStream(spark, sfDir)
      val out = name match {
        case "sessionize" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.sessionize(stream).toDF, s"sb_$name", OutputMode.Update)
        case "sessionize_flat" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.sessionizeFlat(stream).toDF, s"sb_$name", OutputMode.Update)
        case "hourly" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.hourlyCounts(stream), s"sb_$name", OutputMode.Complete)
        case "latest" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.latestStateStream(stream), s"sb_$name", OutputMode.Complete())
        case "dedup" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.dedupStream(stream, Seq("event_id")), s"sb_$name")
        case "nearpairs" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.nearPairsStream(stream), s"sb_$name")
        case "attribution" =>
          StreamingOps.runToMemory(spark,
            StreamingOps.attributionStream(stream), s"sb_$name")
        case other => sys.error(s"unknown stream op: $other")
      }
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name: $sec%.2f s, $rows rows out, $nEvents events in, " +
        f"${nEvents / sec}%.0f events/s")
    }
    spark.stop()
  }
}
