package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** The default HDFS-backed state store keeps every partition's state
  * in executor HEAP — fine at test scale, a hard ceiling for the
  * stateful streams (sessionize, dedup, latest-state, windowed aggs)
  * once watermark-bounded state reaches hundreds of millions of keys.
  * Spark's RocksDB provider is the shipped scale path: state lives on
  * executor local disk with bounded block-cache memory. This spec pins
  * that every stateful-op family produces IDENTICAL results under the
  * RocksDB provider, so flipping the one conf on a real cluster
  * (`spark.sql.streaming.stateStore.providerClass`) is a pure capacity
  * change, not a semantics change. The provider is read at QUERY
  * start, so setting it on the shared session only affects streams
  * started inside `withRocksDb`. */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val confKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, rocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None    => spark.conf.unset(confKey)
    }
  }

  private def rows(df: DataFrame, sortCols: Seq[String]): Seq[org.apache.spark.sql.Row] =
    df.orderBy(sortCols.head, sortCols.tail: _*).collect().toSeq

  test("stateful ops match the default provider under RocksDB state") {
    // one case per distinct state-machinery family:
    //   flatMapGroupsWithState / dropDuplicates / last-agg / windowed agg
    def runAll(tag: String): Map[String, Seq[org.apache.spark.sql.Row]] = Map(
      "sessionize" -> rows(
        StreamingOps.runToMemory(spark,
          StreamingOps.sessionize(StreamingOps.eventsStream(spark, sf)).toDF,
          s"rocks_sess_$tag", OutputMode.Update),
        Seq("user_id", "session_start")),
      "dedup" -> rows(
        StreamingOps.runToMemory(spark,
          StreamingOps.dedupStream(
            StreamingOps.eventsStream(spark, sf), Seq("event_id")),
          s"rocks_dedup_$tag"),
        Seq("event_id")),
      "latest_state" -> rows(
        StreamingOps.runToMemory(spark,
          StreamingOps.latestStateStream(StreamingOps.eventsStream(spark, sf)),
          s"rocks_latest_$tag", OutputMode.Complete),
        Seq("user_id", "event_type")),
      "hourly" -> rows(
        StreamingOps.runToMemory(spark,
          StreamingOps.hourlyCounts(StreamingOps.eventsStream(spark, sf)),
          s"rocks_hourly_$tag", OutputMode.Complete),
        Seq("hour", "event_type")),
    )
    val baseline = runAll("hdfs")
    val rocked = withRocksDb(runAll("rdb"))
    for ((name, expect) <- baseline) {
      assert(rocked(name) == expect, s"op $name diverged under RocksDB state")
      assert(expect.nonEmpty, s"op $name returned no rows — vacuous parity")
    }
  }
}
