package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TemporalOps, TextOps}

/** Specs for the r3 training-pipeline additions: backward as-of join
  * (q45), train/test contamination (q46), hash-stratified sampling
  * (q47). Bit-exactness vs DuckDB is pinned by the Verify oracle; these
  * pin the operator semantics on hand-built inputs and the invariants
  * the oracle can't express. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("asof_join_backward_semantics") {
    import spark.implicits._
    val left = Seq( // (user_id, ts_us, event_id)
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L),
      (2L, 10L, 103L), (3L, 10L, 104L))
      .toDF("user_id", "ts_us", "event_id")
    val right = Seq( // (user_id, ts_us, click_id)
      (1L, 10L, 7L), (1L, 10L, 8L), (1L, 15L, 9L), (2L, 1L, 10L))
      .toDF("user_id", "ts_us", "click_id")
    val out = TemporalOps.asOfJoinBackward(left, right, "user_id", "ts_us")
      .select("event_id", "click_id", "ts_us_r")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap
    // equal time matches (<=); among equal-time clicks the max id wins
    assert(out(100L) == ((Some(8L), Some(10L))))
    // strictly-later click excluded; latest at-or-before wins
    assert(out(101L) == ((Some(9L), Some(15L))))
    // nothing at-or-before -> nulls
    assert(out(102L) == ((None, None)))
    // per-key isolation
    assert(out(103L) == ((Some(10L), Some(1L))))
    assert(out(104L) == ((None, None)))
  }

  test("asof_join_rejects_colliding_payload") {
    import spark.implicits._
    val l = Seq((1L, 1L, 2L)).toDF("k", "t", "x")
    val r = Seq((1L, 1L, 3L)).toDF("k", "t", "x")
    intercept[IllegalArgumentException] {
      TemporalOps.asOfJoinBackward(l, r, "k", "t")
    }
  }

  test("contamination_invariants") {
    val c = TextOps.contamination(spark, sf).cache()
    val rows = c.collect()
    assert(rows.nonEmpty)
    // hits never exceed the document's shingle count; counts positive
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
    assert(rows.forall(_.getLong(1) > 0))
    // exactly the held-out docs that have >=3 tokens appear
    val expected = Tables.documents(spark, sf)
      .filter(col("source").isin("src1", "src2", "src3", "src4"))
      .filter(size(split(trim(col("text")), "\\s+")) >= 3)
      .count()
    assert(rows.length == expected)
    c.unpersist()
  }

  test("contamination_matches_independent_recompute") {
    // recompute n_sh/n_hit in plain Scala from the raw text (tiny
    // corpus at sf0.001) and require exact agreement
    import spark.implicits._
    def shingleSet(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    val testSrc = Set("src1", "src2", "src3", "src4")
    val trainSh = docs.filterNot(d => testSrc(d._3))
      .iterator.flatMap(d => shingleSet(d._2)).toSet
    val expected = docs.filter(d => testSrc(d._3))
      .map { case (id, text, _) =>
        val sh = shingleSet(text)
        id -> ((sh.size.toLong, sh.count(trainSh).toLong))
      }.filter(_._2._1 > 0L).toMap
    val got = TextOps.contamination(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, h) => id -> ((n, h)) }.toMap
    assert(got == expected)
  }

  test("stratified_sample_deterministic_and_stratified") {
    val a = TextOps.stratifiedSample(spark, sf).collect()
    val b = TextOps.stratifiedSample(spark, sf).collect()
    // pure function of the row: identical across runs
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // a genuine subset
    val total = Tables.documents(spark, sf).count()
    assert(a.length > 0 && a.length < total)
    // per-stratum rates: the en stratum is sampled ~4x thinner than the
    // rest; verify the realized ratio honors the configured direction
    val byLang = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val totals = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0).toDouble / totals("en")
    val restRate = (a.length - byLang.getOrElse("en", 0)).toDouble /
      (total - totals("en"))
    assert(enRate < restRate)
  }
}
