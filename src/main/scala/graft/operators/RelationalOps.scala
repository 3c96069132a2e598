package graft.operators

import graft.core.Materialize.GraftMaterializeOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational renderings of the reference's operator inventory
  * (SURVEY.md §2) over the driver's TPC-H-ish tables.
  *
  * Each query here has a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  * Determinism rules shared with the oracle:
  *  - every aggregate over doubles is computed exactly by casting the
  *    addend to DECIMAL first and casting the exact sum back to DOUBLE
  *    (float summation order is engine-dependent; decimal is not);
  *  - every result carries a total ORDER BY on a unique key set;
  *  - aggregate/computed columns are aliased identically on both sides.
  *
  * Scale notes (100 TB design):
  *  - dimension tables (region/nation/supplier) are joined with an
  *    explicit `broadcast()` hint — no shuffle of the fact table;
  *  - fact-fact joins (orders⋈lineitem) are plain equi-joins so Catalyst
  *    picks shuffled hash/sort-merge with AQE skew splitting;
  *  - filters/projections sit directly on the scan so they reach parquet
  *    as PushedFilters/ReadSchema.
  */
object RelationalOps {

  /** Exact decimal sum of a double column, returned as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** S1/P5 scan + predicate + projection; pushdown-friendly. */
  def scanFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** A1-A5 grouped aggregation (TPC-H Q1 shape); map-side partial agg. */
  def aggGroup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        (dsum(col("l_discount"), 4) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** J1 + top-k (TPC-H Q3 shape): filter is pushed below the join, the
    * revenue expression is decimal-exact, LIMIT is a TakeOrdered. */
  def joinTopK(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** O1/O2 global sort + limit → Spark TakeOrderedAndProject (no full
    * sort materialization at scale). */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** O3 DISTINCT projection. */
  def distinctProj(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select("c_nationkey", "c_mktsegment")
      .distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  /** Window top-k per group (beyond-reference: Spark Window). */
  def windowTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Running (prefix) sum per key — the relational rendering of
    * per-key streaming state; decimal-exact. */
  def runningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    Tables.events(s, d)
      .withColumn("running",
        sum(col("value").cast(DecimalType(18, 4))).over(w).cast("double"))
      .select("event_id", "user_id", "running")
      .orderBy("user_id", "event_id")
  }

  /** Semi join (EXISTS): customers with ≥1 order. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Anti join (NOT EXISTS): customers with no orders — the MERGE
    * existence check of SURVEY J6/M3 is this exact shape. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Set op (UNION ALL) with tagged provenance. */
  def unionAll(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        lit("customer").as("kind"))
      .unionByName(Tables.supplier(s, d)
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
          lit("supplier").as("kind")))
      .orderBy("kind", "id")

  /** 3-hop join chain region→nation→customer→orders (relational J5):
    * both dimension hops broadcast, single shuffle for the final agg. */
  def multiHopRevenue(s: SparkSession, d: String): DataFrame =
    broadcast(Tables.region(s, d))
      .join(broadcast(Tables.nation(s, d)), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name")
      .agg(dsum(col("o_totalprice")).as("total"))
      .orderBy("r_name")

  /** A3/GA3 node degree: union both edge directions, groupBy count.
    * Nation nodes, edges = customer-FROM_NATION + supplier-FROM_NATION. */
  def degree(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("node_id"))
      .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("node_id")))
      .groupBy("node_id")
      .agg(count(lit(1)).as("degree"))
      .orderBy("node_id")

  /** J6 pairwise MATCH..MERGE rendering: same-label cross product with
    * id(a) < id(b), counted per group. Self-join on the equi-key keeps
    * it a hash join, not a cartesian. */
  def pairwiseMerge(s: SparkSession, d: String): DataFrame = {
    val a = Tables.supplier(s, d).select(col("s_suppkey").as("a_key"),
      col("s_nationkey").as("nationkey"))
    val b = Tables.supplier(s, d).select(col("s_suppkey").as("b_key"),
      col("s_nationkey").as("nationkey"))
    a.join(b, Seq("nationkey"))
      .filter(col("a_key") < col("b_key"))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("pair_cnt"))
      .orderBy("nationkey")
  }

  /** J5 variable-length reachability rendering: distinct parts reachable
    * in 2 hops from each customer (customer→order→lineitem→part). */
  def varlenReach(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_custkey")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("c_custkey")

  /** GROUP BY + HAVING. */
  def aggHaving(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("n_cust") > 5)
      .orderBy("c_nationkey")

  /** CASE-expression bucketing. */
  def caseBucket(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("bucket",
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** Event-time tumbling window aggregation (streaming-ish analog;
    * identical batch semantics to a Structured Streaming window). */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour",
        date_format(timestamp_micros(expr("ts_ns div 1000")),
          "yyyy-MM-dd HH:00:00"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("cnt"), dsum(col("value"), 4).as("sum_value"))
      .orderBy("hour", "event_type")

  /** q63: SEMI-STRUCTURED EXTRACTION — pull a typed field out of the
    * `props` JSON-string column and roll it up per event type. The
    * extraction (`get_json_object`) is a codegen row-pure expression,
    * so the JSON never leaves the scan stage un-projected and the
    * aggregate is the usual partial+final combine — the shape that
    * holds when the props blob is kilobytes instead of bytes. All
    * output integers are exact.
    *
    * The extracted value is gated to strictly-integer strings (≤18
    * digits, so the cast can never overflow or throw under ANSI mode)
    * BEFORE the bigint cast: unguarded, the engines disagree on every
    * edge input — Spark truncates '2.5' (or throws under ANSI) where
    * DuckDB rounds it to 3, and DuckDB hard-errors on malformed JSON
    * where get_json_object returns NULL. With the twin regex gate both
    * sides yield NULL for anything that isn't a plain JSON integer. */
  def jsonPropsRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), jsonIntField(col("props"), "k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        count(col("k")).as("k_present"))
      .orderBy("event_type")

  /** The gated bigint extraction behind q63 — public so the edge-case
    * parity contract (see [[jsonPropsRollup]]) is unit-testable on
    * synthetic rows. */
  def jsonIntField(props: Column, field: String): Column = {
    val v = get_json_object(props, "$." + field)
    when(v.rlike("^-?\\d{1,18}$"), v.cast("bigint"))
  }

  /** q64: EXACT LENGTH QUANTILES per source — interpolating percentile
    * (rank p·(n−1), linear between neighbors) over integer document
    * lengths. With integer inputs and binary-exact fractions the
    * interpolation is bit-exact across engines (Spark `percentile` and
    * DuckDB `quantile_cont` share the definition). Exact percentile
    * shuffles each group's values once — at corpus scale swap in a
    * t-digest/GK sketch and accept approximation; this operator is the
    * exact-answer variant a quality-cutoff calibration run wants. */
  def lengthQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        percentile(col("n_chars"), lit(0.25)).as("p25"),
        percentile(col("n_chars"), lit(0.5)).as("p50"),
        percentile(col("n_chars"), lit(0.75)).as("p75"))
      .orderBy("source")

  /** q70: ROLLUP — hierarchical subtotals (region → nation → grand
    * total) in ONE aggregation pass. Spark expands the rollup into
    * grouping sets inside a single Expand+HashAggregate, so the fact
    * table is scanned and shuffled once for all three levels — the
    * shape that matters when the fact side is 100 TB (three separate
    * GROUP BYs would triple the scan). Grouped-out keys surface as
    * NULL; both engines render them through the same `*ALL*` sentinel
    * so ordering/hashing is engine-independent. */
  def rollupRevenue(s: SparkSession, d: String): DataFrame =
    broadcast(Tables.region(s, d))
      .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .select("r_name", "n_name", "o_totalprice")
      // Column-arg rollup: the name-based overload misfires Spark 4's
      // ambiguous-self-join detection downstream of any join
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("*ALL*")).as("region"),
        coalesce(col("n_name"), lit("*ALL*")).as("nation"),
        col("total"), col("n_orders"))
      .orderBy("region", "nation")

  /** DuckDB rendering of [[rollupRevenue]]. */
  def rollupRevenueOracleSql(): String =
    """SELECT COALESCE(r_name, '*ALL*') AS region,
      |  COALESCE(n_name, '*ALL*') AS nation,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n_orders
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |  JOIN customer ON c_nationkey = n_nationkey
      |  JOIN orders ON o_custkey = c_custkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** q71: PIVOT — long→wide reshape, one row per user with a count
    * column per event type. The pivot values are declared explicitly
    * (the production rule at scale: an undeclared pivot forces a
    * distinct-values collect on the driver), so the plan is a single
    * groupBy with pivoted partial aggregates — one shuffle on user_id,
    * output width fixed at plan time. */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("error"), lit(0L)).as("n_error"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("view"), lit(0L)).as("n_view"))
      .orderBy("user_id")

  /** q93: USER FEATURE MATRIX — the per-entity feature-engineering
    * rollup an ML training job runs against the event stream: activity
    * counts by type, exact-decimal monetary mass, first/last activity
    * and active-day span. Everything lands in ONE map-side-combined
    * groupBy on user_id (conditional aggregates, no pivot collect, no
    * self-joins), so the plan is a single shuffle whatever the event
    * volume — the canonical wide-feature build at 100 TB. Counts and
    * µs/day arithmetic are exact integers; the value mass is the exact
    * DECIMAL sum rendered as double (order-independent on both
    * engines). */
  def userFeatures(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("day", expr("ts_us div 86400000000"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchase"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_click"),
        dsum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)), 4).as("purchase_value"),
        min("ts_us").as("first_us"),
        max("ts_us").as("last_us"),
        countDistinct(col("day")).as("n_active_days"))
      .orderBy("user_id")

  /** DuckDB rendering of [[userFeatures]]. */
  def userFeaturesOracleSql(): String =
    """WITH e AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
      |             epoch_us(ts) // 86400000000 AS day FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchase,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_click,
      |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
      |    ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS purchase_value,
      |  MIN(ts_us) AS first_us, MAX(ts_us) AS last_us,
      |  COUNT(DISTINCT day) AS n_active_days
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** DuckDB rendering of [[pivotEvents]] (conditional aggregation — the
    * engine-portable spelling of an explicit-values pivot). */
  def pivotEventsOracleSql(): String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q72: Z-SCORE OUTLIERS — per-event-type mean/stddev from EXACT
    * decimal sums (sum and sum-of-squares of the DECIMAL(18,4)-cast
    * value — order-independent, so both engines derive bit-identical
    * moments), then flag events with |z| > `zCut`. Classic data-quality
    * / anomaly gate.
    *
    * Scale shape: one map-side-combined aggregation to a
    * type-cardinality stats table, broadcast back onto the event
    * stream, row-pure z computation — the fact table shuffles zero
    * times. The double arithmetic downstream of the exact sums
    * (division, sqrt) is IEEE-deterministic on both engines; the
    * emitted z is rounded to 6 places. */
  def valueOutliers(s: SparkSession, d: String, zCut: Double = 2.0): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        col("value").cast(DecimalType(18, 4)).as("v"))
    // sd > 0 guard: a constant-valued group yields 0/0 z-scores whose
    // NaN comparison semantics differ across engines — exclude the
    // degenerate group identically on both sides
    ev.join(broadcast(valueStats(s, d)), "event_type")
      .filter(col("sd") > 0)
      .withColumn("z", OracleSql.roundTo((col("v").cast("double") - col("mean")) / col("sd"), 6))
      .filter(abs(col("z")) > zCut)
      .select(col("event_id"), col("event_type"),
        col("v").cast("double").as("value"), col("z"))
      .orderBy("event_id")
  }

  /** The "trained" half of [[valueOutliers]]: per-type (mean, sd) from
    * exact decimal moments. Also feeds the streaming outlier gate
    * (StreamingOps.outlierGateStream) as its broadcast stats table. */
  def valueStats(s: SparkSession, d: String): DataFrame =
    valueStatsOf(Tables.events(s, d)
      .select(col("event_type"), col("value").cast(DecimalType(18, 4)).as("v")))

  /** [[valueStats]] over an explicit (event_type, v DECIMAL(18,4))
    * frame — the unit-testable core (the n = 1 singleton guard is
    * pinned in spec against an in-memory frame). */
  def valueStatsOf(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("double").as("s1"),
        sum((col("v") * col("v")).cast(DecimalType(38, 8)))
          .cast("double").as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      // clamp before sqrt, mirroring the oracle's GREATEST(..., 0): a
      // near-constant group can round the variance slightly negative,
      // and Spark's sqrt(negative)=NaN compares GREATER than any number
      // so it would leak through the sd > 0 gate downstream. The n=1
      // case needs its own guard: 0.0/0 is NaN in BOTH engines, but
      // DuckDB's GREATEST(NaN, 0) returns 0 while Spark's greatest
      // keeps NaN (NaN sorts greatest), so only an explicit n > 1
      // branch gives the two sides the same sd = 0 for singletons
      .withColumn("sd", when(col("n") > 1,
        sqrt(greatest(
          col("s2") - col("s1") * col("s1") / col("n"), lit(0.0))
          / (col("n") - 1)))
        .otherwise(lit(0.0)))
      .select("event_type", "mean", "sd")

  /** DuckDB rendering of [[valueOutliers]]. */
  def valueOutliersOracleSql(zCut: Double = 2.0): String =
    s"""WITH ev AS (SELECT event_id, event_type,
       |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
       |st AS (SELECT event_type, COUNT(*) AS n,
       |    CAST(SUM(v) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST(v * v AS DECIMAL(38,8))) AS DOUBLE) AS s2
       |  FROM ev GROUP BY event_type),
       |m AS (SELECT event_type, s1 / n AS mean,
       |    CASE WHEN n > 1
       |      THEN sqrt(GREATEST((s2 - s1 * s1 / n) / (n - 1), 0))
       |      ELSE 0 END AS sd FROM st)
       |SELECT event_id, ev.event_type, CAST(v AS DOUBLE) AS value,
       |  ${OracleSql.roundSql("(CAST(v AS DOUBLE) - mean) / sd", 6)} AS z
       |FROM ev JOIN m USING (event_type)
       |WHERE sd > 0
       |  AND ABS(${OracleSql.roundSql("(CAST(v AS DOUBLE) - mean) / sd", 6)}) > $zCut
       |ORDER BY event_id""".stripMargin

  /** q103: REFERENTIAL-INTEGRITY AUDIT — orphan counts for every FK
    * edge of the star schema (child keys with no parent row), the
    * data-quality gate a warehouse load runs before publishing. Each
    * check is an anti-join reduced to one count row; on consistent
    * data every count is 0, and a non-zero row names the broken edge.
    *
    * Scale shape: each check is one anti-join on its FK — dimension
    * parents broadcast, the two fact-fact checks shuffle on the join
    * key; counts combine map-side. Checks are independent, so the
    * union executes them in parallel. */
  def integrityAudit(s: SparkSession, d: String): DataFrame = {
    def check(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      // no distinct on the parent: anti-join semantics are duplicate-
      // insensitive, and a distinct would add a full shuffle per check
      child.select(col(key).as("k"))
        .join(parent.select(col(pkey).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("chk"), col("n_orphans"))
    val li = Tables(s, d, "lineitem")
    Seq(
      check("lineitem->orders", li, "l_orderkey",
        Tables(s, d, "orders"), "o_orderkey"),
      check("lineitem->part", li, "l_partkey",
        Tables(s, d, "part"), "p_partkey"),
      check("lineitem->supplier", li, "l_suppkey",
        Tables(s, d, "supplier"), "s_suppkey"),
      check("orders->customer", Tables(s, d, "orders"), "o_custkey",
        Tables(s, d, "customer"), "c_custkey"),
      check("customer->nation", Tables(s, d, "customer"), "c_nationkey",
        Tables(s, d, "nation"), "n_nationkey"),
      check("supplier->nation", Tables(s, d, "supplier"), "s_nationkey",
        Tables(s, d, "nation"), "n_nationkey"),
      check("nation->region", Tables(s, d, "nation"), "n_regionkey",
        Tables(s, d, "region"), "r_regionkey"))
      .reduce(_ unionByName _)
      .orderBy("chk")
  }

  /** DuckDB rendering of [[integrityAudit]]. */
  def integrityAuditOracleSql(): String =
    """SELECT * FROM (
      |  SELECT 'lineitem->orders' AS chk, COUNT(*) AS n_orphans
      |  FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'lineitem->part', COUNT(*) FROM lineitem l
      |    ANTI JOIN part p ON l.l_partkey = p.p_partkey
      |  UNION ALL
      |  SELECT 'lineitem->supplier', COUNT(*) FROM lineitem l
      |    ANTI JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  UNION ALL
      |  SELECT 'orders->customer', COUNT(*) FROM orders o
      |    ANTI JOIN customer c ON o.o_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT 'customer->nation', COUNT(*) FROM customer c
      |    ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  UNION ALL
      |  SELECT 'supplier->nation', COUNT(*) FROM supplier s
      |    ANTI JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  UNION ALL
      |  SELECT 'nation->region', COUNT(*) FROM nation n
      |    ANTI JOIN region r ON n.n_regionkey = r.r_regionkey)
      |ORDER BY chk""".stripMargin

  /** q95: MAD ROBUST OUTLIERS — the median-based companion to q72's
    * z-score gate: per event type, flag events whose absolute deviation
    * from the type median exceeds `cut` × the median absolute deviation
    * (MAD). Unlike mean/stddev, the median/MAD pair is immune to the
    * outliers it is hunting — the robust-statistics default for data-
    * quality gates. Both medians are LOWER medians (the ⌈n/2⌉-th order
    * statistic, percentile_disc-style): pure SELECTION, never float
    * interpolation or accumulation, so every surviving number is a raw
    * input double compared exactly and the oracle matches bit-for-bit
    * (the only arithmetic is |x − med| and one IEEE multiply by `cut`).
    *
    * Scale shape: two (event_type)-keyed window sorts over the event
    * stream (the same single partitioning reused), each reduced to a
    * per-type scalar table that joins back by broadcast. An exact
    * median cannot avoid sorting the group once; at extreme scale swap
    * the q87 histogram sketch in for the selection step. */
  def madOutliers(s: SparkSession, d: String, cut: Double = 5.0): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
      .graftCheckpoint() // feeds both median passes and the final gate
    def lowerMedian(df: DataFrame, valueCol: String,
        out: String): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy(valueCol)
      val wn = Window.partitionBy("event_type")
      df.withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("n", count(lit(1)).over(wn))
        // integer div: Column./ is DOUBLE division and would silently
        // select no row for even-sized groups
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col(valueCol).as(out))
    }
    val med = lowerMedian(ev, "value", "med")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
      .graftCheckpoint() // feeds the MAD pass and the final gate
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0 && col("dev") > col("mad") * cut)
      .select("event_id", "event_type", "value", "med", "dev", "mad")
      .orderBy("event_id")
  }

  /** DuckDB rendering of [[madOutliers]]. */
  def madOutliersOracleSql(cut: Double = 5.0): String =
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |rm AS (SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM ev),
       |med AS (SELECT event_type, value AS med FROM rm
       |        WHERE rn = (n + 1) // 2),
       |dv AS (SELECT ev.event_id, ev.event_type, ev.value, med.med,
       |         ABS(ev.value - med.med) AS dev
       |       FROM ev JOIN med USING (event_type)),
       |rd AS (SELECT event_type, dev,
       |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM dv),
       |mad AS (SELECT event_type, dev AS mad FROM rd
       |        WHERE rn = (n + 1) // 2)
       |SELECT event_id, dv.event_type, value, med, dev, mad
       |FROM dv JOIN mad USING (event_type)
       |WHERE mad > 0 AND dev > mad * $cut
       |ORDER BY event_id""".stripMargin

  /** q97: EXACT GROUPED PERCENTILES — p50/p90/p99 of order value per
    * customer nation, each the ⌈n·p⌉-th order statistic selected by
    * rank (percentile_disc semantics): pure integer rank arithmetic +
    * row selection, no interpolation, so the oracle is bit-exact. The
    * exact-selection complement to q87's histogram sketch and q64's
    * global quantiles.
    *
    * Scale shape: one (nation)-partitioned window sort over the joined
    * orders, three rank filters off the SAME ranked frame (materialized
    * once), then nation-cardinality joins. An exact percentile must
    * sort each group once; the group count bounds everything after. */
  def groupPercentiles(s: SparkSession, d: String): DataFrame = {
    val j = Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val w = Window.partitionBy("n_name").orderBy("price")
    val wn = Window.partitionBy("n_name")
    val ranked = j
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("n", count(lit(1)).over(wn))
      .graftCheckpoint() // three rank picks read it
    def pick(p: Int, out: String): DataFrame = ranked
      .filter(col("rn") === expr(s"(n * $p + 99) div 100")) // ⌈n·p/100⌉
      .select(col("n_name"), col("price").cast("double").as(out))
    pick(50, "p50").join(pick(90, "p90"), "n_name")
      .join(pick(99, "p99"), "n_name")
      .orderBy("n_name")
  }

  /** DuckDB rendering of [[groupPercentiles]]. */
  def groupPercentilesOracleSql(): String =
    """WITH j AS (SELECT n_name, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |r AS (SELECT n_name, price,
      |    row_number() OVER (PARTITION BY n_name ORDER BY price) AS rn,
      |    COUNT(*) OVER (PARTITION BY n_name) AS n
      |  FROM j),
      |p50 AS (SELECT n_name, CAST(price AS DOUBLE) AS p50 FROM r
      |        WHERE rn = (n * 50 + 99) // 100),
      |p90 AS (SELECT n_name, CAST(price AS DOUBLE) AS p90 FROM r
      |        WHERE rn = (n * 90 + 99) // 100),
      |p99 AS (SELECT n_name, CAST(price AS DOUBLE) AS p99 FROM r
      |        WHERE rn = (n * 99 + 99) // 100)
      |SELECT n_name, p50, p90, p99
      |FROM p50 JOIN p90 USING (n_name) JOIN p99 USING (n_name)
      |ORDER BY n_name""".stripMargin

  /** q74: TIME-RANGE WINDOW FRAME — per-user running 1-hour sum: for
    * each event, the exact-decimal sum of `value` over all of that
    * user's events in the preceding hour (RANGE frame on the raw
    * nanosecond timestamp, so frame membership is a pure integer
    * comparison — engine-independent even with timestamp ties, because
    * RANGE frames include all peers regardless of intra-tie order).
    *
    * Scale shape: one hash-partition shuffle on user_id, in-partition
    * sort by time, single streaming pass per partition — the standard
    * sliding-window plan. Skewed users cap at one partition's worth of
    * a single user's events; beyond that, pre-bucket time (q60's trick)
    * before windowing. */
  def runningHourSum(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-hourUs, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"),
        col("value").cast(DecimalType(18, 4)).as("v"))
      .withColumn("hour_sum", sum(col("v")).over(w).cast("double"))
      .select("event_id", "user_id", "hour_sum")
      .orderBy("event_id")
  }

  /** DuckDB rendering of [[runningHourSum]] (same integer-µs RANGE
    * frame; `epoch_us(ts)` = Spark's `ts_ns div 1000`, both floor). */
  def runningHourSumOracleSql(): String =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS hour_sum
      |FROM events ORDER BY event_id""".stripMargin

  /** q75: EXACT CORRELATION — Pearson r of (quantity, extendedprice)
    * per return flag, derived entirely from order-independent DECIMAL
    * sums (n, Σx, Σy, Σxy, Σx², Σy²) so both engines compute
    * bit-identical moments; only the final closed-form division/sqrt
    * runs in (IEEE-deterministic) double, rounded to 6 places. The
    * shape generalizes to covariance matrices: one map-side-combined
    * aggregation pass, output cardinality = group count. */
  def quantityPriceCorr(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(18, 2))
    val y = col("l_extendedprice").cast(DecimalType(18, 2))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum((x * y).cast(DecimalType(38, 4))).cast("double").as("sxy"),
        sum((x * x).cast(DecimalType(38, 4))).cast("double").as("sxx"),
        sum((y * y).cast(DecimalType(38, 4))).cast("double").as("syy"))
      // zero/epsilon-negative variance (constant column, double
      // rounding) → NULL identically on both engines: DuckDB would
      // hard-error on sqrt(negative) and NULL on x/0, Spark would NaN
      .withColumn("vx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("vy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("corr_qty_price",
        when(col("vx") > 0 && col("vy") > 0,
          OracleSql.roundTo((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("vx")) * sqrt(col("vy"))), 6)))
      .select("l_returnflag", "n", "corr_qty_price")
      .orderBy("l_returnflag")
  }

  /** DuckDB rendering of [[quantityPriceCorr]]. */
  def quantityPriceCorrOracleSql(): String =
    s"""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
      |      CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
      |      CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  CASE WHEN sxx - sx * sx / n > 0 AND syy - sy * sy / n > 0
      |    THEN ${OracleSql.roundSql(
             "(sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))", 6)}
      |    ELSE NULL END AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** SKEW-SALTED equi-join: tag each left row with a deterministic salt
    * in [0, salt) derived from `saltSource` (any left column — ideally
    * a near-unique id so a hot key's rows spread evenly), replicate the
    * right side across ALL salt values, and join on (key, salt). A key
    * carrying 30% of the left table — which would pin one reducer in a
    * plain shuffle join — now splits across `salt` reducers at the cost
    * of a `salt`× right-side replication; use it when the right side is
    * medium (too big to broadcast, small enough to replicate) and AQE's
    * runtime skew-split can't apply (e.g. the join feeds a co-partition
    *-preserving downstream op). Semantically identical to the plain
    * join: every right row meets every left row of its key exactly once
    * (left salt values partition the left rows; the right copy exists
    * for each value). */
  def saltedJoin(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, salt: Int, saltSource: Column): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(salt.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** q77: revenue by order status through the SALTED lineitem⋈orders
    * join — bit-identical to the plain join (the oracle runs one), with
    * the skew-proof physical shape: the shuffle key is (orderkey, salt)
    * so no single reducer can own a hot order. Pinned in PlanShapeSpec:
    * the join keys include the salt column. */
  def saltedRevenueByStatus(s: SparkSession, d: String, salt: Int = 8): DataFrame =
    saltedJoin(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount")),
      "l_orderkey",
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
      "o_orderkey", salt, col("l_linenumber"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy("o_orderstatus")

  /** DuckDB rendering of [[saltedRevenueByStatus]] (plain join —
    * salting is a physical rebalance, not a semantic change). */
  def saltedRevenueOracleSql(): String =
    """SELECT o_orderstatus, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q80: FULL OUTER join — per-nation customer and supplier counts
    * side by side, keeping nations that have only one of the two
    * (rendered as 0 via coalesce). Both inputs are pre-aggregated to
    * key cardinality BEFORE the join — at 100 TB the full-outer join
    * runs on two nation-sized tables, not on the raw fact rows. */
  def fullOuterNationCounts(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** DuckDB rendering of [[fullOuterNationCounts]]. */
  def fullOuterOracleSql(): String =
    """WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
      |           FROM customer GROUP BY 1),
      |p AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
      |      FROM supplier GROUP BY 1)
      |SELECT COALESCE(c.nationkey, p.nationkey) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN p ON c.nationkey = p.nationkey
      |ORDER BY nationkey""".stripMargin

  /** q81: SET OPERATORS — INTERSECT and EXCEPT over the customer- and
    * supplier-nation key sets, tagged and unioned into one result
    * (nations with both kinds / customers only / suppliers only). Set
    * ops compile to aggregate/anti-join plans on key-cardinality
    * inputs — no fact-table shuffle survives the pre-aggregation. */
  def nationSetOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val p = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(p).withColumn("which", lit("both"))
      .unionByName(c.except(p).withColumn("which", lit("customer_only")))
      .unionByName(p.except(c).withColumn("which", lit("supplier_only")))
      .orderBy("which", "nationkey")
  }

  /** DuckDB rendering of [[nationSetOps]]. */
  def nationSetOpsOracleSql(): String =
    """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |p AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT nationkey, which FROM (
      |  SELECT nationkey, 'both' AS which FROM (
      |    SELECT nationkey FROM c INTERSECT SELECT nationkey FROM p)
      |  UNION ALL
      |  SELECT nationkey, 'customer_only' FROM (
      |    SELECT nationkey FROM c EXCEPT SELECT nationkey FROM p)
      |  UNION ALL
      |  SELECT nationkey, 'supplier_only' FROM (
      |    SELECT nationkey FROM p EXCEPT SELECT nationkey FROM c))
      |ORDER BY which, nationkey""".stripMargin

  /** q82: BLOCKED FUZZY MATCHING — near-identical supplier-name pairs
    * by Levenshtein distance ≤ `maxDist`, candidates restricted to the
    * same nation (the blocking key). Both engines implement the same
    * textbook edit-distance DP, so the integer distances agree exactly.
    *
    * Scale shape: candidates come from a DELETION-NEIGHBORHOOD
    * (symmetric-delete) equi-join, not a per-block self-join. If
    * lev(a,b) ≤ k then |a|−LCS(a,b) ≤ k and |b|−LCS(a,b) ≤ k, so both
    * strings reach a common subsequence by deleting ≤ k characters —
    * meaning every true pair shares at least one ≤k-deletion variant,
    * and the variant equi-join yields an EXACT candidate superset that
    * the final levenshtein filter trims to the same rows as the naive
    * quadratic formulation (the DuckDB oracle keeps the naive shape).
    * Each row emits O(len^k) variant keys (k=2, len 18 → ≤ 172, a
    * per-row CONSTANT), so shuffled bytes grow linearly with the table
    * while the Σ_b |block|² pair blowup of nation-only blocking never
    * materializes: a measured 10× scale-up moved nation-blocking
    * super-linearly (0.24 s → 5.2 s warm) because block width grows
    * with the table when the block-key cardinality is fixed. Variant
    * group sizes are bounded by genuine near-duplicate density — a
    * data property, not a table-size property — and the quadratic
    * step inside a variant group touches only rows that agree on all
    * but ≤ 2k characters. */
  def fuzzySupplierPairs(s: SparkSession, d: String, maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"supported maxDist: 1..2, got $maxDist")
    // STEP 0 — collapse exact duplicates. Every downstream cost is paid
    // per DISTINCT name, and identical strings would otherwise share
    // their entire variant neighborhood (all ~172 keys), turning each
    // duplicate clique into a duplicate-candidate storm. Real corpora
    // always carry exact-dup mass; this groupBy bounds it at one row.
    // null names can never satisfy `levenshtein(...) <= k` (null
    // comparison), so the naive formulation drops them; dropping them
    // BEFORE grouping keeps the dedup path from pairing two null-named
    // rows at distance 0. Null nation keys likewise: the naive equi-join
    // on s_nationkey drops them, so a null-nk group must not emit dist-0
    // pairs for duplicate names either
    val groups = Tables.supplier(s, d)
      .filter(col("s_name").isNotNull && col("s_nationkey").isNotNull)
      .groupBy(col("s_nationkey").as("nk"), col("s_name"))
      .agg(sort_array(collect_list(col("s_suppkey"))).as("ks"))
    // intra-group pairs: identical names, dist 0, all key pairs i<j
    val samePairs = groups
      .filter(size(col("ks")) >= 2)
      .select(explode(flatten(transform(
          sequence(lit(0), size(col("ks")) - 2), i =>
            transform(sequence(i + 1, size(col("ks")) - 1), j =>
              struct(element_at(col("ks"), i + 1).as("k1"),
                element_at(col("ks"), j + 1).as("k2")))))).as("p"))
      .select(col("p.k1"), col("p.k2"), lit(0L).as("dist"))
    // all variants of s_name with 0, 1, or (maxDist=2) 2 chars deleted,
    // built from codegen'd substring arithmetic — no UDF. 1-based
    // substring positions; i and j are 0-based deletion indices, i < j.
    val m = length(col("s_name"))
    val d0 = array(col("s_name"))
    val d1 = transform(sequence(lit(0), m - 1), i =>
      concat(col("s_name").substr(lit(1), i),
        col("s_name").substr(i + 2, m)))
    val d2 = flatten(transform(sequence(lit(0), m - 2), i =>
      transform(sequence(i + 1, m - 1), j =>
        concat(col("s_name").substr(lit(1), i),
          col("s_name").substr(i + 2, j - i - 1),
          col("s_name").substr(j + 2, m)))))
    val variants = maxDist match {
      case 1 => concat(d0, d1)
      case 2 => concat(d0, d1, when(m >= 2, d2).otherwise(array()))
    }
    val sigs = groups.select(col("nk"), col("s_name"), col("ks"),
      explode(array_distinct(variants)).as("sig"))
    // candidate DISTINCT-NAME pairs (name1 < name2 fixes orientation;
    // names are unique within a nation after the groupBy), then one
    // exact verify per name pair, then key-group expansion. Distance-2
    // name pairs share exactly one variant, distance-1 pairs O(len) —
    // the pre-distinct duplication is a small constant, never the
    // all-pairs square.
    val cands = sigs.select(col("nk"), col("s_name").as("n1"),
        col("ks").as("ks1"), col("sig"))
      .join(sigs.select(col("nk"), col("s_name").as("n2"),
          col("ks").as("ks2"), col("sig")),
        Seq("nk", "sig"))
      .filter(col("n1") < col("n2"))
      .select("n1", "n2", "ks1", "ks2").distinct()
      .withColumn("dist", levenshtein(col("n1"), col("n2")))
      .filter(col("dist") <= maxDist)
    // a cross-group pair's key order is unrelated to the name order
    val crossPairs = cands
      .select(explode(col("ks1")).as("ka"), col("ks2"), col("dist"))
      .select(col("ka"), explode(col("ks2")).as("kb"), col("dist"))
      .select(least(col("ka"), col("kb")).as("k1"),
        greatest(col("ka"), col("kb")).as("k2"),
        col("dist").cast("bigint").as("dist"))
    samePairs.unionByName(crossPairs)
      .orderBy("k1", "k2")
  }

  /** DuckDB rendering of [[fuzzySupplierPairs]]. */
  def fuzzySupplierOracleSql(maxDist: Int = 2): String =
    s"""SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
       |  CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
       |FROM supplier a JOIN supplier b
       |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
       |WHERE levenshtein(a.s_name, b.s_name) <= $maxDist
       |ORDER BY k1, k2""".stripMargin

  /** q85: NTILE + DENSE_RANK — quartile assignment of orders by price
    * within each priority class, rolled up to per-(priority, quartile)
    * counts and exact price sums, plus the dense rank of each
    * quartile's price ceiling. Covers the two window functions the
    * pack didn't yet exercise; the window ORDER BY carries the unique
    * orderkey tie-break so NTILE boundaries are engine-deterministic.
    *
    * Scale shape: one hash-partition shuffle on the priority key,
    * in-partition sort, single window pass, then a map-side-combined
    * rollup to (priority × 4) rows. */
  def priceQuartiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      .groupBy("o_orderpriority", "quartile")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        max(col("o_totalprice")).as("max_price"))
      .withColumn("price_rank",
        dense_rank().over(Window.partitionBy("o_orderpriority")
          .orderBy(col("max_price"))).cast("bigint"))
      .orderBy("o_orderpriority", "quartile")
  }

  /** DuckDB rendering of [[priceQuartiles]]. */
  def priceQuartilesOracleSql(): String =
    """WITH q AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
      |  FROM orders),
      |g AS (
      |  SELECT o_orderpriority, quartile, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    MAX(o_totalprice) AS max_price
      |  FROM q GROUP BY 1, 2)
      |SELECT o_orderpriority, quartile, n_orders, sum_price, max_price,
      |  CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
      |    ORDER BY max_price) AS BIGINT) AS price_rank
      |FROM g ORDER BY o_orderpriority, quartile""".stripMargin

  /** q88: ORDERED LIST AGGREGATION — per nation, the pipe-joined list
    * of its top-3 suppliers by account balance. `collect_list` carries
    * no ordering guarantee across partitions, so the deterministic
    * spelling is collect structs → array_sort → project — the same
    * rebuild trick as the segment dedup; the oracle's
    * `string_agg(... ORDER BY)` is its SQL twin. Nested/array results
    * are the hand-off format for feature lists and grouped exports.
    *
    * Scale shape: rank-window per nation (WindowGroupLimit pushes the
    * top-3 below the exchange), then a nation-keyed aggregation whose
    * payload is capped at 3 rows per key — no unbounded group blowup. */
  def topSupplierLists(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("s_nationkey")
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    Tables.supplier(s, d)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_top"),
        array_join(transform(
          array_sort(collect_list(struct(col("rk"), col("s_name")))),
          p => p("s_name")), "|").as("top_names"))
      .orderBy("nationkey")
  }

  /** DuckDB rendering of [[topSupplierLists]]. */
  def topSupplierListsOracleSql(k: Int = 3): String =
    s"""WITH r AS (
       |  SELECT s_nationkey, s_name,
       |    ROW_NUMBER() OVER (PARTITION BY s_nationkey
       |      ORDER BY s_acctbal DESC, s_suppkey) AS rk
       |  FROM supplier)
       |SELECT s_nationkey AS nationkey, COUNT(*) AS n_top,
       |  string_agg(s_name, '|' ORDER BY rk) AS top_names
       |FROM r WHERE rk <= $k
       |GROUP BY s_nationkey ORDER BY nationkey""".stripMargin

  /** Global min/max/count/count-distinct stats in one pass. */
  def globalStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
}
