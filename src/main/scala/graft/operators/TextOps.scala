package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data text pipeline operators over the `documents` table:
  * exact dedup, token counting, quality scoring, language ID,
  * fingerprinting, n-gram Jaccard near-dup.
  *
  * Oracle-portability rules (DuckDB must reproduce bit-for-bit):
  *  - only md5 is used as a content hash (identical hex in both engines);
  *    xxhash64/murmur live in the no-oracle ops (MinHash/SimHash);
  *  - similarity scores are kept as exact integer counts (common/union)
  *    instead of floating ratios;
  *  - all array lengths are cast to BIGINT (Spark `size` is int32,
  *    DuckDB `len` is int64).
  *
  * PERFORMANCE INVARIANT: tokenization is always materialized as its
  * own projected attribute (`toks`) before any expression references
  * it. Referencing `tokens(col("text"))` repeatedly builds duplicate
  * expression trees, and inside a lambda the split is re-evaluated
  * PER ARRAY ELEMENT — measured 10-50× slowdown on the shingle path.
  *
  * Scale notes: everything here is embarrassingly parallel per document
  * except the near-dup self-join, which joins on the shingle value — at
  * 100 TB that join's key space is bounded by the shingle vocabulary, so
  * AQE skew-join handles hot shingles; a stop-shingle filter (drop
  * shingles with document frequency above a cap) is the standard
  * mitigation and is applied here.
  */
object TextOps {

  /** Whitespace tokenizer shared by every operator (and by the oracle:
    * `regexp_split_to_array(trim(text), '\s+')`). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** documents + a materialized `toks` attribute (see invariant above). */
  private def withToks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))

  /** Word 3-gram shingles from a *bound attribute* of tokens, distinct
    * per document. Guarded: Spark's `sequence(1, n)` with n < 1
    * generates a DESCENDING sequence, so short documents must
    * short-circuit to an empty array. */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3, array_distinct(
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup: md5 content hash → cluster size + canonical keep id.
    * Single shuffle on the hash; at scale the hash groupBy is the
    * textbook exact-dedup plan (partial agg map-side). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
      .orderBy("h")

  /** Token count per document. */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .select(col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Quality scoring: token/unique-token/stopword counts, all exact
    * integers so the oracle matches bit-for-bit. */
  def qualityScore(s: SparkSession, d: String): DataFrame =
    withToks(s, d)
      .select(col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("bigint").as("n_uniq"),
        size(filter(col("toks"), x => x.isin("the", "a", "of", "and", "is")))
          .cast("bigint").as("stop_cnt"))
      .orderBy("doc_id")

  /** Language ID: stopword-list scores + non-ASCII ratio heuristic with
    * a deterministic tie-break order (zh > de > es > fr > en). */
  def langId(s: SparkSession, d: String): DataFrame = {
    def score(words: String*): Column =
      size(filter(col("toks"), x => x.isin(words: _*))).cast("bigint")
    withToks(s, d)
      .select(col("doc_id"), col("text"),
        score("the", "a", "of", "and", "is").as("en_s"),
        score("der", "die", "das", "und", "ist").as("de_s"),
        score("el", "los", "las", "que", "una").as("es_s"),
        score("le", "les", "des", "et", "une").as("fr_s"))
      .select(col("doc_id"), col("en_s"), col("de_s"), col("es_s"), col("fr_s"),
        length(regexp_replace(col("text"), "[\\x00-\\x7F]", "")).cast("bigint")
          .as("non_ascii"),
        length(col("text")).cast("bigint").as("n_len"))
      .withColumn("pred_lang",
        when(col("non_ascii") * 5 > col("n_len"), "zh")
          .when(col("de_s") > col("en_s") && col("de_s") >= col("es_s") &&
            col("de_s") >= col("fr_s"), "de")
          .when(col("es_s") > col("en_s") && col("es_s") >= col("fr_s"), "es")
          .when(col("fr_s") > col("en_s"), "fr")
          .otherwise("en"))
      .select("doc_id", "pred_lang")
      .orderBy("doc_id")
  }

  /** Document fingerprint: md5 over the case/whitespace-normalized text —
    * catches formatting-only duplicates that exact dedup misses. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", "").cast("binary"))
          .as("fp"))
      .orderBy("doc_id")

  /** Distinct word-3-gram shingle rows (doc_id, sh), built from the
    * exploded token stream with window `lead` — NOT from the array
    * lambda in [[shingles]]: Catalyst's CollapseProject re-inlines
    * array-lambda shingling so `split` re-runs per element (O(n²) per
    * doc, measured 10-50× slower). Here the tokenizer runs once per
    * document and everything downstream is codegen'd. */
  def shingleRows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    withToks(s, d)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
      .dropDuplicates("doc_id", "sh")
  }

  /** N-gram Jaccard near-duplicate pairs: explode distinct 3-gram
    * shingles, self-join on the shingle, keep pairs with
    * jaccard ≥ 0.5 (exact integer test: 2·common ≥ union).
    *
    * Scale: per-shingle document lists are the join key; a document
    * frequency cap (maxDf) drops degenerate stop-shingles that would
    * create quadratic hot keys at 100 TB. */
  def ngramJaccardPairs(s: SparkSession, d: String, maxDf: Int = 1000): DataFrame = {
    val sh = shingleRows(s, d)
    val dfOk = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val shF = sh.join(broadcast(dfOk), "sh")
    val cnts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = shF.select(col("doc_id").as("a_id"), col("sh"))
      .join(shF.select(col("doc_id").as("b_id"), col("sh")), "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"))
    pairs
      .join(cnts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(cnts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("union_sz", col("na") + col("nb") - col("common"))
      .filter(col("common") * 2 >= col("union_sz"))
      .select("a_id", "b_id", "common", "union_sz")
      .orderBy("a_id", "b_id")
  }
}
