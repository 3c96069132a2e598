package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every pack query must be TOTAL on zero-row input. At warehouse
  * scale an upstream filter, a partition prune, or an empty ingest
  * window routinely hands an operator empty frames — a query that
  * only works when data exists takes the pipeline down on a quiet
  * day. The fragile shapes this guards (each crashed or would crash
  * before being hardened): driver-side `.head()` on aggregates,
  * quantile arrays that come back empty, sample-trained models (q41's
  * IVF quantizer now degrades to a single zero centroid = brute
  * force), and re-reading a derived layout that wrote zero files
  * (q76's partitioned copy now reads with its statically-known
  * schema). `graft.EmptyProbe` is the standalone dev runner. */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val emptyDir = EmptyProbe.stageEmptyTwin(spark, "/root/testdata/sf0.001")

  test("all pack queries run on a zero-row dataset") {
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(100)}")
      }
    }
    assert(failures.isEmpty,
      s"queries not total on empty input:\n${failures.mkString("\n")}")
  }

  test("streaming ops drain a zero-event day to empty, not to a crash") {
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamingOps
    // one per state-machinery family — the "quiet day" twin of the
    // batch totality test above: an empty ingest window must drain to
    // zero rows with clean state, not throw at schema probe or drain
    val stream = () => StreamingOps.eventsStream(spark, emptyDir)
    val outs = Map(
      "hourly" -> StreamingOps.runToMemory(spark,
        StreamingOps.hourlyCounts(stream()), "empty_hourly", OutputMode.Complete),
      "sessionize" -> StreamingOps.runToMemory(spark,
        StreamingOps.sessionize(stream()).toDF, "empty_sess", OutputMode.Update),
      "dedup" -> StreamingOps.runToMemory(spark,
        StreamingOps.dedupStream(stream(), Seq("event_id")), "empty_dedup"),
      "attribution" -> StreamingOps.runToMemory(spark,
        StreamingOps.attributionStream(stream()).toDF, "empty_attr"),
      "docgate" -> StreamingOps.runToMemory(spark,
        StreamingOps.docGateStream(
          StreamingOps.documentsStream(spark, emptyDir)), "empty_gate"),
    )
    for ((name, df) <- outs)
      assert(df.count() == 0L, s"stream $name non-empty on zero events")
  }
}
