package graft.operators

import graft.core.Materialize.GraftMaterializeOps

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

  /** ORDERED FUNNEL: per user, the earliest view, the earliest click
    * at-or-after that view, and the earliest purchase at-or-after that
    * click — `stage` is how deep the user got (0-3). The ordering
    * constraint is the point: a purchase BEFORE the user's first
    * qualifying click does not count, which a per-type min cannot
    * express. Null stages stay null; all times are exact integer µs so
    * the oracle matches bit-for-bit.
    *
    * Scale: three user_id-keyed aggregations with map-side partial
    * `min`, chained by user_id equi-joins — every shuffle is on the
    * same key, so Catalyst reuses the exchange partitioning; no window
    * over the event stream, no per-user event sort. */
  def funnelStages(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("v_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") >= col("v_us"))
      .groupBy("user_id").agg(min("ts_us").as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") >= col("c_us"))
      .groupBy("user_id").agg(min("ts_us").as("p_us"))
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("p_us").isNotNull, 3)
          .when(col("c_us").isNotNull, 2)
          .when(col("v_us").isNotNull, 1)
          .otherwise(0).cast("bigint"))
      .select("user_id", "v_us", "c_us", "p_us", "stage")
      .orderBy("user_id")
  }

  /** DuckDB rendering of [[funnelStages]]. */
  def funnelOracleSql(): String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
      |            FROM events),
      |v AS (SELECT user_id, MIN(ts_us) AS v_us FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT ev.user_id, MIN(ts_us) AS c_us FROM ev
      |      JOIN v ON v.user_id = ev.user_id AND ev.ts_us >= v.v_us
      |      WHERE event_type = 'click' GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, MIN(ts_us) AS p_us FROM ev
      |      JOIN c ON c.user_id = ev.user_id AND ev.ts_us >= c.c_us
      |      WHERE event_type = 'purchase' GROUP BY ev.user_id),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT u.user_id, v_us, c_us, p_us,
      |  CAST(CASE WHEN p_us IS NOT NULL THEN 3
      |    WHEN c_us IS NOT NULL THEN 2
      |    WHEN v_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |  LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** q60: BUCKETED RANGE SELF-JOIN — all pairs of events by the same
    * user within `gapUs` microseconds of each other (the interval/range
    * join Spark has no native operator for; a raw |tₐ−t_b| ≤ Δ
    * predicate plans as a nested-loop join). Bucketing by Δ-wide time
    * windows turns it into an equi-join: a pair within Δ can differ by
    * at most one bucket, so one side keeps its bucket and the other
    * explodes to {b−1, b, b+1}; the exact |gap| ≤ Δ predicate then
    * filters the candidates. Each qualifying unordered pair surfaces
    * exactly once (the left row's single bucket appears in the right
    * row's 3-bucket set at most once, and `a_id < b_id` fixes the
    * orientation) — so no distinct step is needed.
    *
    * Scale shape: one shuffle per side on (user, bucket); candidate
    * volume is Σ per-(user, bucket) deg² — locally quadratic only
    * within a user's Δ-window, the best possible bound for this
    * predicate; 3× duplication of one side only. gap_us is exact
    * integer µs (signed: b relative to a). */
  def eventNearPairs(s: SparkSession, d: String,
      gapUs: Long = 4L * 3600 * 1000000): DataFrame =
    eventNearPairsOf(
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("ts_us")),
      gapUs)

  /** [[eventNearPairs]] over an explicit (event_id, user_id,
    * event_type, ts_us) frame — the unit-testable core. */
  def eventNearPairsOf(events: DataFrame, gapUs: Long): DataFrame = {
    val ev = events.withColumn("bkt", expr(s"ts_us div ${gapUs}L"))
    val a = ev.select(col("user_id"), col("bkt"),
      col("event_id").as("a_id"), col("event_type").as("a_type"),
      col("ts_us").as("a_us"))
    val b = ev.select(col("user_id"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"),
      col("event_id").as("b_id"), col("event_type").as("b_type"),
      col("ts_us").as("b_us"))
    a.join(b, Seq("user_id", "bkt"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("b_us") - col("a_us")) <= gapUs)
      .select(col("user_id"), col("a_id"), col("b_id"),
        col("a_type"), col("b_type"),
        (col("b_us") - col("a_us")).as("gap_us"))
      .orderBy("a_id", "b_id")
  }

  /** q66: BATCH SESSIONIZATION — the batch twin of
    * [[graft.streaming.StreamingOps.sessionize]]: per user, maximal
    * event runs with inter-event gap ≤ `gapUs`; a session breaks where
    * the lag-gap exceeds the threshold, and the session index is the
    * running count of breaks (the classic lag + cumulative-flag-sum
    * formulation). All integer µs arithmetic → exact oracle.
    *
    * Scale shape: both windows share ONE partitioning (user_id), so
    * the whole computation is a single shuffle + in-partition sort;
    * the session rollup then combines map-side. No global window, no
    * self-join. */
  def sessions(s: SparkSession, d: String,
      gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("ts_us"))
      .withColumn("brk",
        when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("brk").over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "session_idx")
  }

  /** q105: CHANGELOG COMPACTION — latest-wins state per (user,
    * event_type): the CDC/upsert compaction every materialized view or
    * feature store runs over a change stream. ONE map-side-combined
    * `max(struct(ts, id, payload))` aggregation — the struct's
    * lexicographic order makes (ts, event_id) the deterministic
    * recency key, so no per-group window sort ever touches the stream
    * (the oracle states the same semantics as a row_number window,
    * which is the non-scalable formulation). Payload decimal-cast so
    * the surfaced value is engine-exact.
    *
    * Scale: partial max combines map-side; state is one struct per
    * live key — the same shape streams as an Update-mode aggregation
    * ([[graft.streaming.StreamingOps.latestStateStream]], parity-
    * pinned). */
  def latestState(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .as("v"))
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("ts_us"), col("event_id"), col("v"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_us").as("ts_us"), col("m.event_id").as("event_id"),
        col("m.v").cast("double").as("value"))
      .orderBy("user_id", "event_type")

  /** DuckDB rendering of [[latestState]]. */
  def latestStateOracleSql(): String =
    """SELECT user_id, event_type, ts_us, event_id, value FROM (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** q102: TIME-SERIES RESAMPLE — per event type, the DENSE daily count
    * series over the corpus' day span (missing days filled with 0 — the
    * resample step every time-series pipeline runs before windowing,
    * because lag/moving windows are wrong on sparse rows), plus the
    * day-over-day delta and the trailing 7-day sum. All integer
    * arithmetic on epoch days → bit-exact oracle.
    *
    * Scale shape: the raw aggregation is one map-side-combined
    * groupBy; the spine is types × days (tiny — generated, not
    * shuffled); the windows run per type over the dense spine, which
    * is bounded by the calendar, not the event volume. */
  def dailyActivity(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        expr("(ts_ns div 1000) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      .graftCheckpoint() // feeds the span scalar, the type list, and the join
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val w7 = w.rowsBetween(-6, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("delta", col("cnt") - lag("cnt", 1).over(w))
      .withColumn("sum7", sum("cnt").over(w7))
      .select("event_type", "day", "cnt", "delta", "sum7")
      .orderBy("event_type", "day")
  }

  /** DuckDB rendering of [[dailyActivity]]. */
  def dailyActivityOracleSql(): String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |spine AS (SELECT t.event_type, d.day
      |  FROM (SELECT DISTINCT event_type FROM daily) t,
      |    (SELECT unnest(range(d0, d1 + 1)) AS day FROM span) d),
      |dense AS (SELECT s.event_type, s.day, COALESCE(daily.cnt, 0) AS cnt
      |  FROM spine s LEFT JOIN daily USING (event_type, day))
      |SELECT event_type, day, cnt,
      |  cnt - lag(cnt) OVER w AS delta,
      |  CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum7
      |FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |ORDER BY event_type, day""".stripMargin

  /** q99: MULTI-TOUCH CLICK ATTRIBUTION — for every purchase, ALL of
    * the same user's clicks in the hour before it (inclusive both
    * ends), with the exact µs gap: the window-join companion to q45's
    * single last-touch as-of. This is the batch twin of the
    * stream-stream interval join
    * ([[graft.streaming.StreamingOps.attributionStream]]), whose
    * parity spec pins the two to identical output.
    *
    * Scale shape: same Δ-bucket trick as q60, but DIRECTIONAL — a
    * qualifying click lies in [p−Δ, p], so its bucket is the
    * purchase's or the one before; the purchase side explodes to
    * {b−1, b}, the click side keeps its single bucket, and the exact
    * predicate filters — each pair surfaces exactly once, equi-join
    * on (user, bucket), no distinct, no nested-loop plan. */
  def clickAttribution(s: SparkSession, d: String,
      windUs: Long = 3600L * 1000000): DataFrame =
    clickAttributionOf(
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts_ns div 1000").as("ts_us")),
      windUs)

  /** [[clickAttribution]] over an explicit (event_id, user_id,
    * event_type, ts_us) frame — the unit-testable / parity-checkable
    * core. */
  def clickAttributionOf(ev: DataFrame, windUs: Long): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_us"))
      .withColumn("bkt0", expr(s"p_us div ${windUs}L"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("c_us"),
        expr(s"ts_us div ${windUs}L").as("bkt"))
    p.select(col("user_id"), col("purchase_id"), col("p_us"),
        explode(array(col("bkt0") - 1, col("bkt0"))).as("bkt"))
      .join(c, Seq("user_id", "bkt"))
      .filter(col("c_us") <= col("p_us") &&
        col("c_us") >= col("p_us") - windUs)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("p_us") - col("c_us")).as("gap_us"))
      .orderBy("purchase_id", "click_id")
  }

  /** DuckDB rendering of [[clickAttribution]]. */
  def clickAttributionOracleSql(windUs: Long = 3600L * 1000000): String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |             epoch_us(ts) AS ts_us FROM events),
       |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_us
       |      FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us
       |      FROM e WHERE event_type = 'click')
       |SELECT p.user_id, purchase_id, click_id, p_us - c_us AS gap_us
       |FROM p JOIN c ON p.user_id = c.user_id
       |  AND c_us <= p_us AND c_us >= p_us - $windUs
       |ORDER BY purchase_id, click_id""".stripMargin

  /** Shared sessionization CTE ladder ending in `sess(user_id,
    * session_idx, start_us, end_us, n_events, duration_us)` — one copy
    * behind [[sessionsOracleSql]] and [[sessionOverlapOracleSql]]. */
  private def sessionsCtes(gapUs: Long): String =
    s"""e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
       |b AS (SELECT user_id, event_id, ts_us,
       |    CASE WHEN ts_us - lag(ts_us) OVER w > $gapUs THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |s AS (SELECT user_id, ts_us,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM b),
       |sess AS (SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |    MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       |    COUNT(*) AS n_events, MAX(ts_us) - MIN(ts_us) AS duration_us
       |  FROM s GROUP BY user_id, session_idx)""".stripMargin

  /** DuckDB rendering of [[sessions]]. */
  def sessionsOracleSql(gapUs: Long = 30L * 60 * 1000000): String =
    s"""WITH ${sessionsCtes(gapUs)}
       |SELECT user_id, session_idx, start_us, end_us, n_events, duration_us
       |FROM sess ORDER BY user_id, session_idx""".stripMargin

  /** q98: SESSION OVERLAP — the INTERVAL overlap join over the q66
    * session table: all cross-user session pairs active at the same
    * time, with the exact overlap length. Where q60 joins points within
    * a fixed Δ, this joins VARIABLE-length intervals — Spark plans a
    * raw `a.start ≤ b.end AND b.start ≤ a.end` predicate as a
    * nested-loop join, so the engine side buckets time by W = the
    * longest session duration: two intervals can only overlap if b
    * starts within [a.start − W, a.start + W], i.e. their start buckets
    * differ by at most 1, making it an equi-join on (bucket) with the
    * exact predicate as a post-filter. One side explodes to its 3
    * neighbor buckets; the other keeps its single start bucket, so each
    * qualifying pair surfaces exactly once — no distinct. W comes from
    * the data via a broadcast scalar (guarded ≥ 1), not a tuned
    * constant. Same-user pairs are impossible by construction (maximal
    * sessions are gap-separated), so orientation is a_user < b_user.
    *
    * Scale: candidate volume is Σ per-bucket (sessions starting in
    * bucket)² — locally quadratic only within a W-window, the
    * unavoidable bound for interval overlap; the session table is
    * already events-compressed. A pathological W (one huge session)
    * degrades candidates gracefully rather than breaking correctness. */
  def sessionOverlap(s: SparkSession, d: String,
      gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val sess = sessions(s, d, gapUs)
      .select("user_id", "session_idx", "start_us", "end_us")
      .graftCheckpoint() // feeds the W scalar and both join sides
    val wMax = sess.agg(
      greatest(max(col("end_us") - col("start_us")), lit(1L)).as("w"))
    val withW = sess.crossJoin(broadcast(wMax))
      .withColumn("bkt0", expr("start_us div w"))
    val a = withW.select(col("user_id").as("a_user"),
      col("session_idx").as("a_idx"), col("start_us").as("a_start"),
      col("end_us").as("a_end"),
      explode(array(col("bkt0") - 1, col("bkt0"), col("bkt0") + 1)).as("bkt"))
    val b = withW.select(col("user_id").as("b_user"),
      col("session_idx").as("b_idx"), col("start_us").as("b_start"),
      col("end_us").as("b_end"), col("bkt0").as("bkt"))
    a.join(b, "bkt")
      .filter(col("a_user") < col("b_user") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_user"), col("a_idx"), col("b_user"), col("b_idx"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_us"))
      .orderBy("a_user", "a_idx", "b_user", "b_idx")
  }

  /** DuckDB rendering of [[sessionOverlap]]: the plain interval-overlap
    * inequality join over the shared session CTE — equivalent to the
    * engine's bucketed equi-join (see the W-window argument above). */
  def sessionOverlapOracleSql(gapUs: Long = 30L * 60 * 1000000): String =
    s"""WITH ${sessionsCtes(gapUs)}
       |SELECT a.user_id AS a_user, a.session_idx AS a_idx,
       |  b.user_id AS b_user, b.session_idx AS b_idx,
       |  LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us)
       |    AS overlap_us
       |FROM sess a JOIN sess b ON a.user_id < b.user_id
       |  AND a.start_us <= b.end_us AND b.start_us <= a.end_us
       |ORDER BY a_user, a_idx, b_user, b_idx""".stripMargin

  /** q89: RETENTION COHORTS — the classic cohort/retention triangle:
    * each user joins the cohort of their first active day; the cell
    * (cohort_day, day_offset) counts users from that cohort active
    * `day_offset` days later. Days are exact integer epoch-days
    * (µs div 86_400_000_000), so the oracle matches bit-for-bit.
    *
    * Scale shape: the (user, day) distinct pre-aggregates map-side;
    * first-day and the activity set shuffle on the SAME user_id key, so
    * Catalyst reuses one exchange for the groupBy and the join; the
    * final cell rollup is map-side combined and cohort×offset-bounded
    * (days², tiny). Because (user, day) rows are already distinct, the
    * cell count is a plain COUNT — no countDistinct expansion. */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    // r13 (guide §2.4): the cohort day is a per-user window min over
    // the distinct activity set — the previous cohort groupBy +
    // user_id join + checkpoint collapse into one window pass on the
    // user key (the same exchange the join paid), identical output.
    val wU = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"),
        expr("(ts_ns div 1000) div 86400000000").as("day"))
      .distinct()
      .withColumn("cohort_day", min("day").over(wU))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** DuckDB rendering of [[retentionCohorts]]. */
  def retentionCohortsOracleSql(): String =
    """WITH a AS (SELECT DISTINCT user_id,
      |             epoch_us(ts) // 86400000000 AS day FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
      |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
      |  COUNT(*) AS n_users
      |FROM a JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q90: SCD2-STYLE STATE INTERVALS (gaps-and-islands): per user,
    * collapse consecutive same-type event runs into validity intervals
    * `[valid_from_us, valid_to_us)` — `valid_to_us` is the next run's
    * start, NULL for the open current interval. This is the dimension-
    * history build (slowly-changing-dimension type 2) a warehouse runs
    * at every load, and the island step `lag`-change flag + running sum
    * is the same one-partitioning trick as [[sessions]] keyed on state
    * change instead of time gap. All integer µs → bit-exact oracle.
    *
    * Scale shape: every window and the rollup share ONE user_id
    * partitioning — a single shuffle end to end; runs-per-user bounds
    * the interval table, and no self-join touches the event stream. */
  def stateIntervals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagType = lag("event_type", 1).over(w)
    val runs = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("chg",
        when(lagType.isNull || col("event_type") =!= lagType, 1L)
          .otherwise(0L))
      .withColumn("run_idx", sum("chg").over(wRun))
      .groupBy("user_id", "run_idx")
      .agg(min("event_type").as("state"),
        min("ts_us").as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wIv = Window.partitionBy("user_id").orderBy("run_idx")
    runs
      .withColumn("valid_to_us", lead("valid_from_us", 1).over(wIv))
      .select("user_id", "run_idx", "state", "valid_from_us",
        "valid_to_us", "n_events")
      .orderBy("user_id", "run_idx")
  }

  /** DuckDB rendering of [[stateIntervals]]. */
  def stateIntervalsOracleSql(): String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             epoch_us(ts) AS ts_us FROM events),
      |b AS (SELECT user_id, event_id, event_type, ts_us,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR event_type <> lag(event_type) OVER w
      |         THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |r AS (SELECT user_id, event_type, ts_us,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS run_idx
      |  FROM b),
      |iv AS (SELECT user_id, CAST(run_idx AS BIGINT) AS run_idx,
      |         MIN(event_type) AS state, MIN(ts_us) AS valid_from_us,
      |         COUNT(*) AS n_events
      |       FROM r GROUP BY user_id, run_idx)
      |SELECT user_id, run_idx, state, valid_from_us,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_idx)
      |    AS valid_to_us,
      |  n_events
      |FROM iv ORDER BY user_id, run_idx""".stripMargin

  /** DuckDB rendering of [[eventNearPairs]]: the plain inequality
    * self-join — fine at oracle scale; the bucketed equi-join on the
    * engine side is exactly equivalent (|gap| ≤ Δ ⇒ bucket distance
    * ≤ 1). */
  def eventNearPairsOracleSql(gapUs: Long = 4L * 3600 * 1000000): String =
    s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
       |           FROM events)
       |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       |  a.event_type AS a_type, b.event_type AS b_type,
       |  b.ts_us - a.ts_us AS gap_us
       |FROM e a JOIN e b
       |  ON a.user_id = b.user_id AND a.event_id < b.event_id
       |  AND abs(b.ts_us - a.ts_us) <= $gapUs
       |ORDER BY a_id, b_id""".stripMargin
}
