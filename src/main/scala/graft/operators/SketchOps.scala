package graft.operators

import graft.core.Materialize.GraftMaterializeOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Probabilistic sketches — the sublinear-memory summaries a 100 TB
  * pipeline runs where exact answers don't fit (cardinality of a
  * trillion-shingle stream, per-token frequencies of an unbounded
  * vocabulary). Both sketches here are built from md5-derived hash
  * values and exact integer/power-of-two arithmetic, so — unusually for
  * sketches — their ESTIMATES are deterministic and bit-reproducible in
  * DuckDB: the oracle doesn't just sanity-check rows, it recomputes the
  * whole sketch.
  *
  * Scale shapes:
  *  - [[hllDistinctShingles]]: map-side (bucket, rank) extraction, one
  *    256-key max-aggregation — the sketch state is 256 small ints no
  *    matter the input size, and merging partitions is the same MAX, so
  *    the plan is a textbook partial+final aggregate with constant
  *    output.
  *  - [[countMinTokens]]: vocabulary-keyed count (the only input-sized
  *    shuffle), then a 4×256-cell table; point queries join the tiny
  *    cell table back by broadcast. Heavy-hitter reporting off the
  *    sketch costs O(vocab) map work + a top-k.
  */
object SketchOps {

  private val M = 256 // HLL buckets (2^8): ±6.5% standard error

  /** Row-pure (bucket, rank) extraction from a string column `v` — the
    * map side of the HLL sketch, shared by the batch operator and the
    * streaming sketch maintenance (StreamingOps.hllTokenStream). */
  def hllRanks(values: DataFrame): DataFrame =
    hllRanksKeyed(values.select("v"))

  /** [[hllRanks]] preserving every non-`v` column (the group keys of a
    * per-group sketch): row-pure map from `v` to (bucket, w, rank). */
  def hllRanksKeyed(values: DataFrame): DataFrame = {
    val keep = values.columns.filterNot(_ == "v").map(col).toSeq
    values
      .withColumn("h", md5(col("v").cast("binary")))
      .select(keep :+
        conv(substring(col("h"), 1, 2), 16, 10).cast("long").as("bucket") :+
        conv(substring(col("h"), 3, 15), 16, 10).cast("long").as("w"): _*)
      .withColumn("rank",
        when(col("w") === 0L, lit(61L))
          .otherwise(lit(61L) - length(bin(col("w"))).cast("long")))
  }

  /** Fold a (bucket, mx) bucket-maxima frame (missing buckets allowed)
    * into the one-row HLL estimate — the merge+estimate side, shared
    * with the streaming spec so stream-maintained sketch state proves
    * batch parity through the identical formula. */
  def hllEstimateOf(s: SparkSession, bucketMax: DataFrame): DataFrame = {
    val mj = s.range(M).select(col("id").as("bucket"))
      .join(bucketMax, Seq("bucket"), "left")
      .select(coalesce(col("mx"), lit(0L)).as("mj"))
    val agg = mj.agg(
      sum(pow(lit(2.0), lit(61.0) - col("mj")).cast(DecimalType(38, 0)))
        .cast("double").as("harm"),
      sum(when(col("mj") === 0L, 1L).otherwise(0L)).as("v0"))
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    agg.select(
      OracleSql.roundTo(when(col("v0") > 0 &&
          lit(alpha * M * M) * pow(lit(2.0), lit(61.0)) / col("harm")
            <= lit(2.5 * M),
          lit(M.toDouble) * log(lit(M.toDouble) / col("v0")))
        .otherwise(
          lit(alpha * M * M) * pow(lit(2.0), lit(61.0)) / col("harm")), 4)
        .as("hll_estimate"))
  }

  /** q78: HyperLogLog distinct-count estimate of the corpus' 3-gram
    * shingle vocabulary, next to the exact count and the relative
    * error. Hash = md5: first 2 hex digits pick the bucket, the next 15
    * (60 bits) feed the leading-zero rank via `bin()` string length —
    * both engines render binary without leading zeros, so rank is pure
    * integer arithmetic. The harmonic sum Σ 2^(−Mⱼ) is carried as the
    * EXACT integer Σ 2^(61−Mⱼ) in DECIMAL(38,0) (every term a power of
    * two ≤ 2⁶¹, sum ≤ 2⁶⁹), so the only floating-point steps are the
    * final division and rounding — IEEE-deterministic on both engines.
    * The small-range linear-counting branch (raw ≤ 2.5m with empty
    * buckets) uses ln(), whose last ulp is libm-dependent; on this
    * corpus raw ≫ 2.5m so the oracle never exercises it — flagged here
    * rather than silently assumed. */
  def hllDistinctShingles(s: SparkSession, d: String): DataFrame = {
    val sh = TextOps.shingleRows(s, d).select(col("sh").as("v"))
    val est = hllEstimateOf(s,
      hllRanks(sh).groupBy("bucket").agg(max("rank").as("mx")))
    val exact = sh.agg(countDistinct(col("v")).as("n_exact"))
    exact.crossJoin(est)
      .withColumn("rel_err",
        OracleSql.roundTo(abs(col("hll_estimate") - col("n_exact")) / col("n_exact"), 4))
  }

  /** DuckDB rendering of [[hllDistinctShingles]]. */
  def hllOracleSql(): String = {
    val bucket = OracleSql.hexPoly("h", 1, 2)
    val w = OracleSql.hexPoly("h", 3, 15)
    val alpha = s"(0.7213 / (1.0 + 1.079 / $M))"
    s"""WITH ${TextOps.shingleCtesSql},
       |hh AS (SELECT md5(sh) AS h FROM sh),
       |br AS (SELECT CAST($bucket AS BIGINT) AS bucket,
       |         CAST($w AS BIGINT) AS w FROM hh),
       |rk AS (SELECT bucket,
       |         CASE WHEN w = 0 THEN 61
       |           ELSE 61 - CAST(length(bin(w)) AS BIGINT) END AS rank
       |       FROM br),
       |bk AS (SELECT range AS bucket FROM range($M)),
       |mx AS (SELECT bk.bucket, COALESCE(MAX(rk.rank), 0) AS mj
       |       FROM bk LEFT JOIN rk USING (bucket) GROUP BY bk.bucket),
       |ag AS (SELECT CAST(SUM(CAST(power(2, 61 - mj) AS DECIMAL(38,0)))
       |           AS DOUBLE) AS harm,
       |         SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS v0
       |       FROM mx),
       |ex AS (SELECT COUNT(DISTINCT sh) AS n_exact FROM sh),
       |es AS (SELECT ${OracleSql.roundSql(
             s"""CASE WHEN v0 > 0 AND
       |             $alpha * $M * $M * power(2, 61) / harm <= 2.5 * $M
       |           THEN $M * ln($M / v0)
       |           ELSE $alpha * $M * $M * power(2, 61) / harm END""", 4)}
       |           AS hll_estimate
       |       FROM ag)
       |SELECT n_exact, hll_estimate,
       |  ${OracleSql.roundSql("ABS(hll_estimate - n_exact) / n_exact", 4)} AS rel_err
       |FROM ex, es""".stripMargin
  }

  /** q94: PER-GROUP HLL — the distinct-shingle estimate of [[q78
    * hllDistinctShingles]] maintained per language, the form a corpus
    * dashboard actually wants ("vocabulary per stratum"). Sketch state
    * is 256 small ints PER GROUP regardless of input size; the
    * (lang, bucket) maxima aggregate map-side, the 256-row-per-lang
    * grid join is trivially small, and the exact count exists only to
    * report the error.
    *
    * Unlike q78 this uses the PURE bias-corrected estimate on both
    * engines — the small-range linear-counting branch is deliberately
    * omitted, because its ln() is libm-dependent in the last ulp and a
    * per-group sketch WILL hit small groups at some stratum; the cost
    * is the documented HLL small-range positive bias instead of a
    * non-portable oracle. */
  def hllDistinctByLang(s: SparkSession, d: String): DataFrame = {
    val sh = TextOps.shingleRows(s, d)
      .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("sh").as("v"))
      .graftCheckpoint() // feeds ranks, the lang grid, and the exact count
    val mx = hllRanksKeyed(sh)
      .groupBy("lang", "bucket").agg(max("rank").as("mx"))
    val grid = sh.select("lang").distinct()
      .crossJoin(s.range(M).select(col("id").as("bucket")))
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val est = grid.join(mx, Seq("lang", "bucket"), "left")
      .select(col("lang"), coalesce(col("mx"), lit(0L)).as("mj"))
      .groupBy("lang")
      .agg(sum(pow(lit(2.0), lit(61.0) - col("mj")).cast(DecimalType(38, 0)))
        .cast("double").as("harm"))
      .select(col("lang"),
        OracleSql.roundTo(lit(alpha * M * M) * pow(lit(2.0), lit(61.0)) / col("harm"), 4)
          .as("hll_estimate"))
    sh.groupBy("lang").agg(countDistinct(col("v")).as("n_exact"))
      .join(est, "lang")
      .withColumn("rel_err",
        OracleSql.roundTo(abs(col("hll_estimate") - col("n_exact")) / col("n_exact"), 4))
      .orderBy("lang")
  }

  /** DuckDB rendering of [[hllDistinctByLang]]. */
  def hllByLangOracleSql(): String = {
    val bucket = OracleSql.hexPoly("h", 1, 2)
    val w = OracleSql.hexPoly("h", 3, 15)
    val alpha = s"(0.7213 / (1.0 + 1.079 / $M))"
    s"""WITH ${TextOps.shingleCtesSql},
       |lsh AS (SELECT DISTINCT d.lang, sh.sh FROM sh
       |        JOIN documents d USING (doc_id)),
       |hh AS (SELECT lang, md5(sh) AS h FROM lsh),
       |br AS (SELECT lang, CAST($bucket AS BIGINT) AS bucket,
       |         CAST($w AS BIGINT) AS w FROM hh),
       |rk AS (SELECT lang, bucket,
       |         CASE WHEN w = 0 THEN 61
       |           ELSE 61 - CAST(length(bin(w)) AS BIGINT) END AS rank
       |       FROM br),
       |grid AS (SELECT lang, range AS bucket
       |         FROM (SELECT DISTINCT lang FROM lsh), range($M)),
       |mx AS (SELECT grid.lang, grid.bucket, COALESCE(MAX(rk.rank), 0) AS mj
       |       FROM grid LEFT JOIN rk
       |         ON rk.lang = grid.lang AND rk.bucket = grid.bucket
       |       GROUP BY grid.lang, grid.bucket),
       |ag AS (SELECT lang, CAST(SUM(CAST(power(2, 61 - mj) AS DECIMAL(38,0)))
       |           AS DOUBLE) AS harm
       |       FROM mx GROUP BY lang),
       |es AS (SELECT lang, ${OracleSql.roundSql(
             s"$alpha * $M * $M * power(2, 61) / harm", 4)}
       |           AS hll_estimate FROM ag),
       |ex AS (SELECT lang, COUNT(DISTINCT sh) AS n_exact FROM lsh GROUP BY lang)
       |SELECT ex.lang, n_exact, hll_estimate,
       |  ${OracleSql.roundSql("ABS(hll_estimate - n_exact) / n_exact", 4)} AS rel_err
       |FROM ex JOIN es USING (lang) ORDER BY lang""".stripMargin
  }

  private val BM = 1L << 18 // Bloom bits (262,144): ~1.1% FP at 3 hashes, sf0.01 train set

  /** q100: BLOOM-FILTER CONTAMINATION SCREEN — the sketch version of
    * q46's exact train/test shingle semi-join: train shingles set k=3
    * md5-derived bit positions in an m=2¹⁸ Bloom filter; a test shingle
    * "hits" when all three of its positions are set. Output reports the
    * Bloom hit count NEXT TO the exact hit count per test document, so
    * the sketch's one-sided error is visible in the result itself
    * (n_bloom_hit ≥ n_exact_hit always — no false negatives;
    * property-pinned). Positions come from three disjoint md5 hex
    * slices mod m — pure integer arithmetic, so the oracle rebuilds the
    * filter bit-for-bit.
    *
    * Scale shape: the filter is a DISTINCT over ≤ m integers — bounded
    * state no matter the train-corpus size, broadcast to the test side
    * (m=2¹⁸ longs ≈ 2 MB); the test stream is map-side position
    * extraction + a broadcast join. This is why a 100 TB decontam pass
    * runs a Bloom pre-screen before the exact semi-join: the exact join
    * shuffles both corpora, the Bloom screen shuffles neither. */
  def bloomContamination(s: SparkSession, d: String,
      testSources: Seq[String] = Seq("src1", "src2", "src3", "src4")): DataFrame = {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val tagged = TextOps.shingleRows(s, d).join(src, "doc_id")
      .withColumn("h", md5(col("sh").cast("binary")))
      .select(col("doc_id"), col("source"), col("sh"),
        (conv(substring(col("h"), 1, 12), 16, 10).cast("long") % BM).as("p0"),
        (conv(substring(col("h"), 13, 12), 16, 10).cast("long") % BM).as("p1"),
        (conv(substring(col("h"), 25, 8), 16, 10).cast("long") % BM).as("p2"))
      .graftCheckpoint() // feeds the filter build and the test probe
    val isTest = col("source").isin(testSources: _*)
    val bits = tagged.filter(!isTest)
      .select(explode(array(col("p0"), col("p1"), col("p2"))).as("bit"))
      .distinct()
    val probes = tagged.filter(isTest)
      .select(col("doc_id"), col("sh"),
        posexplode(array(col("p0"), col("p1"), col("p2"))))
      .toDF("doc_id", "sh", "i", "bit")
    val bloomHits = probes.join(broadcast(bits), "bit")
      .groupBy("doc_id", "sh").agg(countDistinct(col("i")).as("k_hit"))
      .filter(col("k_hit") === 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n_bloom_hit"))
    TextOps.contamination(s, d, testSources)
      .withColumnRenamed("n_hit", "n_exact_hit")
      .join(bloomHits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"), col("n_exact_hit"),
        coalesce(col("n_bloom_hit"), lit(0L)).as("n_bloom_hit"))
      .orderBy("doc_id")
  }

  /** DuckDB rendering of [[bloomContamination]]. */
  def bloomContaminationOracleSql(
      testSources: Seq[String] = Seq("src1", "src2", "src3", "src4")): String = {
    val srcList = testSources.map(x => s"'$x'").mkString(", ")
    val p0 = OracleSql.hexPoly("h", 1, 12)
    val p1 = OracleSql.hexPoly("h", 13, 12)
    val p2 = OracleSql.hexPoly("h", 25, 8)
    s"""WITH ${TextOps.shingleCtesSql},
       |srcs AS (SELECT doc_id, source FROM documents),
       |hp AS (SELECT sh.doc_id, srcs.source, sh.sh, md5(sh.sh) AS h
       |       FROM sh JOIN srcs USING (doc_id)),
       |pos AS (SELECT doc_id, source, sh,
       |    CAST(($p0) % $BM AS BIGINT) AS p0,
       |    CAST(($p1) % $BM AS BIGINT) AS p1,
       |    CAST(($p2) % $BM AS BIGINT) AS p2
       |  FROM hp),
       |bits AS (SELECT DISTINCT bit FROM (
       |    SELECT p0 AS bit FROM pos WHERE source NOT IN ($srcList)
       |    UNION ALL SELECT p1 FROM pos WHERE source NOT IN ($srcList)
       |    UNION ALL SELECT p2 FROM pos WHERE source NOT IN ($srcList))),
       |test AS (SELECT doc_id, sh, p0, p1, p2 FROM pos
       |         WHERE source IN ($srcList)),
       |bl AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hit
       |       FROM test t
       |         JOIN bits b0 ON b0.bit = t.p0
       |         JOIN bits b1 ON b1.bit = t.p1
       |         JOIN bits b2 ON b2.bit = t.p2
       |       GROUP BY t.doc_id),
       |train AS (SELECT DISTINCT sh.sh FROM sh JOIN srcs USING (doc_id)
       |          WHERE source NOT IN ($srcList)),
       |testsh AS (SELECT sh.doc_id, sh.sh FROM sh JOIN srcs USING (doc_id)
       |           WHERE source IN ($srcList)),
       |ex AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
       |         CAST(COUNT(tr.sh) AS BIGINT) AS n_exact_hit
       |       FROM testsh t LEFT JOIN train tr ON t.sh = tr.sh
       |       GROUP BY t.doc_id)
       |SELECT ex.doc_id, n_sh, n_exact_hit,
       |  COALESCE(bl.n_bloom_hit, 0) AS n_bloom_hit
       |FROM ex LEFT JOIN bl USING (doc_id) ORDER BY ex.doc_id""".stripMargin
  }

  private val HB = 64 // histogram-quantile buckets

  /** q87: HISTOGRAM QUANTILE SKETCH — approximate per-source p25/p50/
    * p75 of document length from a fixed 64-bucket equi-width
    * histogram, the mergeable sublinear stand-in for exact percentiles
    * that q64's scaladoc promises at corpus scale (exact percentile
    * shuffles every group value; the histogram shuffles 64 counters
    * per group and merges by addition — the same role t-digest/GK play,
    * in a form both engines can reproduce EXACTLY). Bucket assignment
    * is pure integer arithmetic off the global max; the quantile read
    * interpolates inside the bucket from exact integer counts, so the
    * estimates are bit-identical in DuckDB. Error bound: the estimate
    * lands in the bucket holding the ceil(q·n)-th ORDER STATISTIC, so
    * it is within one bucket width (max+1)/64 of that order statistic
    * (property-tested). It is NOT bounded relative to the interpolated
    * percentile (q64's definition): adjacent order statistics can span
    * many buckets on sparse data — the accuracy/memory trade every
    * fixed-histogram sketch makes.
    *
    * Scale shape: one max aggregation (scalar), one map-side-combined
    * (source, bucket) count, one tiny per-source window pass over ≤64
    * rows per source. The corpus shuffles counters, never values. */
  def histogramQuantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
    val mx = docs.agg(max("n_chars").as("mx"))
    val hist = docs.crossJoin(broadcast(mx))
      // integer div on both engines: Spark `div`, DuckDB `//` — a
      // double-division-then-cast would round in DuckDB but truncate
      // in Spark
      .select(col("source"),
        expr(s"n_chars * $HB div (mx + 1)").as("bucket"), col("mx"))
      .groupBy("source", "bucket", "mx").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source").orderBy("bucket")
    // materialized: the three est() branches each read it — as a view
    // each would re-run the corpus histogram aggregation
    val cum = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
      .graftCheckpoint()
    // for quantile q: the first bucket whose cumulative count reaches
    // ceil(q*n); interpolate position within the bucket
    def est(q: Double, name: String): DataFrame = cum
      .withColumn("target", ceil(lit(q) * col("n")).cast("long"))
      .filter(col("cum") >= col("target"))
      .groupBy("source").agg(
        min(struct(col("bucket"), col("cum"), col("cnt"), col("mx"),
          col("target"))).as("st"))
      .select(col("source"),
        OracleSql.roundTo((col("st.bucket") +
          (col("st.target") - (col("st.cum") - col("st.cnt")))
            .cast("double") / col("st.cnt"))
          * (col("st.mx") + 1).cast("double") / HB, 4).as(name))
    est(0.25, "p25_est")
      .join(est(0.5, "p50_est"), "source")
      .join(est(0.75, "p75_est"), "source")
      .orderBy("source")
  }

  /** DuckDB rendering of [[histogramQuantiles]]. */
  def histogramQuantilesOracleSql(): String = {
    def est(q: Double, name: String) =
      s"""SELECT source,
         |  ${OracleSql.roundSql(
           s"(bucket + CAST(target - (cum - cnt) AS DOUBLE) / cnt) * CAST(mx + 1 AS DOUBLE) / $HB", 4)} AS $name
         |FROM (
         |  SELECT source, bucket, cum, cnt, mx, target,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY bucket) AS pick
         |  FROM (SELECT *, CAST(ceil($q * n) AS BIGINT) AS target FROM cum)
         |  WHERE cum >= CAST(ceil($q * n) AS BIGINT))
         |WHERE pick = 1""".stripMargin
    s"""WITH mx AS (SELECT MAX(n_chars) AS mx FROM documents),
       |hist AS (
       |  SELECT source, (n_chars * $HB) // (mx + 1) AS bucket,
       |    mx, COUNT(*) AS cnt
       |  FROM documents, mx GROUP BY 1, 2, 3),
       |cum AS (
       |  SELECT source, bucket, cnt, mx,
       |    SUM(cnt) OVER (PARTITION BY source ORDER BY bucket) AS cum,
       |    SUM(cnt) OVER (PARTITION BY source) AS n
       |  FROM hist)
       |SELECT a.source, a.p25_est, b.p50_est, c.p75_est
       |FROM (${est(0.25, "p25_est")}) a
       |  JOIN (${est(0.5, "p50_est")}) b USING (source)
       |  JOIN (${est(0.75, "p75_est")}) c USING (source)
       |ORDER BY source""".stripMargin
  }

  private val CmD = 4 // count-min depth (hash rows); width = 256 (one
                      // 2-hex-digit md5 slice per row)

  /** The 4 per-row bucket columns (b0..b3) of a `tok` column — the
    * row-pure hash side of the count-min sketch, shared by the batch
    * operator and streaming maintenance (StreamingOps.cmCellStream). */
  def cmBuckets(toks: DataFrame): DataFrame = {
    val withH = toks.withColumn("h", md5(col("tok").cast("binary")))
    (0 until CmD).foldLeft(withH) { case (df, i) =>
      df.withColumn(s"b$i",
        conv(substring(col("h"), 1 + 2 * i, 2), 16, 10).cast("long"))
    }
  }

  /** Per-occurrence (row, bucket) pairs of a `tok` column — one pair
    * per sketch row per token occurrence; grouping these by (row,
    * bucket) with a count IS the cell table, batch or streaming. */
  def cmRowBuckets(toks: DataFrame): DataFrame =
    cmBuckets(toks)
      .select(posexplode(array((0 until CmD).map(i => col(s"b$i")): _*))
        .as(Seq("row", "bucket")))

  /** q79: Count-Min heavy hitters — estimate each token's corpus
    * frequency from a 4×256-cell integer sketch and report the top-k by
    * estimated count with the exact count alongside (the estimate is
    * an upper bound: cell collisions only ever ADD). Every value is an
    * exact integer, so the full sketch — cells, point queries, ranking
    * — reproduces bit-for-bit in DuckDB. The 4 row-hashes are disjoint
    * 8-bit slices of the token's md5 (hex digits 1-2, 3-4, 5-6, 7-8) —
    * independent uniform bits, no multiply-mod arithmetic that could
    * overflow BIGINT on either engine.
    *
    * At 100 TB the token→count aggregation is the only input-sized
    * step (map-side combined); the sketch itself is 1 KB and the
    * reporting pass is vocabulary-sized. */
  def countMinTokens(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    // materialized: the 4 cell aggregations + the estimate base all
    // read this input-sized frame — as a view each reference would
    // re-run the corpus tokenization+count
    val withRows = cmBuckets(toks).graftCheckpoint()
    // cell table: 4 rows × 256 buckets of summed counts (materialized:
    // referenced once per row in the point-query joins)
    val cells = (0 until CmD).map { i =>
      withRows.groupBy(col(s"b$i").as("bucket"))
        .agg(sum("cnt").as("cell"))
        .withColumn("row", lit(i))
    }.reduce(_ unionByName _).graftCheckpoint()
    val est = (0 until CmD).foldLeft(withRows) { case (df, i) =>
      df.join(broadcast(cells.filter(col("row") === i)
          .select(col("bucket").as(s"b$i"), col("cell").as(s"c$i"))),
        Seq(s"b$i"))
    }.withColumn("cm_estimate",
      least((0 until CmD).map(i => col(s"c$i")): _*))
    est.select(col("tok"), col("cnt").as("n_exact"), col("cm_estimate"))
      .orderBy(col("cm_estimate").desc, col("tok"))
      .limit(k)
  }

  /** DuckDB rendering of [[countMinTokens]]. */
  def countMinOracleSql(k: Int = 10): String = {
    val rows = 0 until CmD
    val bCols = rows.map { i =>
      s"CAST(${OracleSql.hexPoly("md5(tok)", 1 + 2 * i, 2)} AS BIGINT) AS b$i"
    }.mkString(",\n    ")
    val cellUnion = rows.map { i =>
      s"SELECT $i AS row, b$i AS bucket, CAST(SUM(cnt) AS BIGINT) AS cell FROM tc GROUP BY b$i"
    }.mkString("\n  UNION ALL ")
    val joins = rows.map { i =>
      s"JOIN cells c$i ON c$i.row = $i AND c$i.bucket = tc.b$i" }
      .mkString("\n  ")
    s"""WITH t0 AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |tc AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    $bCols
       |  FROM t0 GROUP BY tok),
       |cells AS (
       |  $cellUnion)
       |SELECT tok, cnt AS n_exact,
       |  LEAST(c0.cell, c1.cell, c2.cell, c3.cell) AS cm_estimate
       |FROM tc
       |  $joins
       |ORDER BY cm_estimate DESC, tok LIMIT $k""".stripMargin
  }
}
