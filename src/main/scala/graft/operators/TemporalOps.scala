package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Temporal operators over the `events` table. The reference engine has
  * no temporal joins (its only event-ish surface is the query/API logs,
  * `src/api/server.rs:163`); these are the standard additions an
  * event-analytics / training-data pipeline needs on Spark.
  */
object TemporalOps {

  /** Distributed backward as-of join: for every `left` row, attach the
    * single `right` row with the greatest (time, payload) among rows
    * sharing `key` with right.time <= left.time; null columns when no
    * such row exists.
    *
    * Shape: ONE shuffle. Union both sides tagged, hash-partition by
    * `key`, sort in-partition by (time, side, payload), sweep a running
    * `last(ignoreNulls)` window. No per-row point lookups, no
    * range-predicate cross join, no broadcast of either side — the
    * sort-merge as-of plan that still works when both sides are fact
    * tables at 100 TB (one exchange each; AQE splits skewed keys).
    *
    * Semantics: a right row at exactly left.time matches (<=, the right
    * side sorts before the left at equal time). Among right rows at the
    * same time the greatest payload struct wins — put an id first in
    * the right schema for a deterministic tie-break.
    *
    * `right`'s non-key/time columns must not collide with `left`'s;
    * the matched right time comes back as `<time>_r`.
    */
  def asOfJoinBackward(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == time).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    require(payload.toSet.intersect(left.columns.toSet).isEmpty,
      s"right payload columns ${payload.mkString(",")} collide with the left side")
    val rStruct = struct((col(time).as("__rt") +: payload.map(col)): _*)
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rType))
    val rTagged = right.select(col(key), col(time), lit(0).as("__side"),
      rStruct.as("__r"))
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val rightOut = payload.map(p => col("__m").getField(p).as(p)) :+
      col("__m").getField("__rt").as(time + "_r")
    matched.select(left.columns.toSeq.map(col) ++ rightOut: _*)
  }

  /** q45: for every purchase event, the most recent click by the same
    * user at-or-before the purchase, plus the microsecond gap — the
    * classic attribution as-of. Null click columns for purchases with
    * no preceding click.
    *
    * Times are floored to MICROseconds on both sides: DuckDB reads the
    * parquet TIMESTAMP(NANOS) column at µs resolution, so the oracle
    * cannot see nanosecond digits — comparing and differencing at µs
    * keeps engine and oracle bit-identical (ties inside one µs resolve
    * by click_id on both sides). */
  def lastClickBeforePurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
    asOfJoinBackward(purchases, clicks, "user_id", "ts_us")
      .withColumn("gap_us", col("ts_us") - col("ts_us_r"))
      .select("event_id", "user_id", "click_id", "gap_us")
      .orderBy("event_id")
  }

  /** DuckDB rendering of [[lastClickBeforePurchase]]: greatest-per-group
    * over an inequality join (fine at oracle scale; the engine side is
    * the scalable one-shuffle plan). epoch_us(ts) equals Spark's
    * `ts_ns div 1000` because DuckDB's parquet reader already floors
    * TIMESTAMP(NANOS) to µs. */
  def lastClickOracleSql(): String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, p.user_id, c.click_id,
      |        p.ts_us - c.ts_us AS gap_us,
      |        row_number() OVER (PARTITION BY p.event_id
      |          ORDER BY c.ts_us DESC, c.click_id DESC) AS rn
      |      FROM p LEFT JOIN c
      |        ON c.user_id = p.user_id AND c.ts_us <= p.ts_us)
      |SELECT event_id, user_id, click_id, gap_us
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin
}
