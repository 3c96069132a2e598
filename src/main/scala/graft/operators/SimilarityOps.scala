package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding similarity search + hash-based near-dup families
  * (MinHash+LSH, SimHash) over `embeddings` / `documents`.
  *
  * Scale notes:
  *  - brute-force top-k broadcasts the (small) query set against the
  *    full corpus — one pass, no corpus shuffle, map-side top-k via
  *    window per query id; at 100 TB the corpus side stays partitioned
  *    and only candidates move;
  *  - the LSH variants (bucketed cosine, MinHash bands, SimHash bands)
  *    replace the quadratic candidate generation with an equi-join on
  *    bucket keys — the 100 TB path;
  *  - all hash families use xxhash64 (codegen'd Catalyst expression),
  *    which is why these ops have no DuckDB oracle (hash functions are
  *    engine-specific) — correctness is pinned by ScalaTest instead.
  */
object SimilarityOps {

  /** Elementwise-exact cosine: cast each float to double, sequential
    * fold — deterministic and reproducible in the DuckDB oracle. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: query vectors (vec_id < nQueries)
    * against the whole corpus. Cosine is rounded to 6 decimals before
    * ranking so Spark and the oracle rank identically; ties break on
    * neighbor id. */
  def cosineTopK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ce"))
    val sim = broadcast(q).join(c, col("qid") =!= col("nid"))
      .withColumn("sim",
        round(dot(col("qe"), col("ce")) / (norm(col("qe")) * norm(col("ce"))), 6))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    sim.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select("qid", "nid", "sim", "rk")
      .orderBy("qid", "rk")
  }

  /** LSH-bucketed ANN (the scale path): random-hyperplane signatures
    * (`nPlanes` sign bits from deterministic pseudo-random planes) form
    * the bucket key; candidates = bucket collisions only. Planes are
    * derived from xxhash64(planeIdx, dimIdx) so the signature is
    * deterministic with zero driver-side state. */
  /** Deterministic pseudo-random hyperplanes computed driver-side with
    * a fixed-seed LCG (no runtime entropy, reproducible across runs)
    * and shipped as array literals — the per-row work is one
    * zip_with/aggregate fold per plane over the broadcast constant. */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var state = 0x5DEECE66DL
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(nPlanes, dim)(next())
  }

  def cosineLshBuckets(s: SparkSession, d: String, nPlanes: Int = 8,
      dim: Int = 64): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val pl = planes(nPlanes, dim)
    val bitCols = (0 until nPlanes).map { p =>
      when(dot(col("embedding"), typedLit(pl(p).toSeq)) >= 0, lit(1))
        .otherwise(lit(0)).cast("string")
    }
    emb.select(col("vec_id"), concat(bitCols: _*).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("bucket_size"),
        sort_array(collect_list(col("vec_id"))).as("members"))
      .orderBy("bucket")
  }

  /** IVF (inverted-file) ANN: MLlib KMeans coarse quantizer over the
    * corpus (nlist cells, fixed seed — deterministic), queries probe
    * their nprobe nearest cells, exact cosine only within probed cells.
    * The 100 TB path: the corpus is partitioned by cell id, a query
    * touches nprobe/nlist of the data; recall vs brute force is pinned
    * by `IoAndOpsSpec`. */
  def ivfTopK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val emb = Tables.embeddings(s, d)
      .withColumn("vec", array_to_vector(col("embedding")))
      .localCheckpoint(true)
    val model = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("vec").setPredictionCol("cell")
      .fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint(true)

    // centroid table is tiny — compute each query's nprobe nearest cells
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val centDf = s.createDataFrame(centroids).toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wProbe = Window.partitionBy("qid").orderBy(col("cdist"), col("cell"))
    val probed = broadcast(q).crossJoin(broadcast(centDf))
      .withColumn("cdist",
        aggregate(zip_with(col("qe"), col("centroid"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nprobe)
      .select(col("qid"), col("qe"), col("cell"))

    // exact cosine only within probed cells
    val cand = probed.join(assigned, "cell")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim",
        round(dot(col("qe"), col("embedding")) /
          (norm(col("qe")) * norm(col("embedding"))), 6))
    val wTop = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(wTop).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("sim"), col("rk"))
      .orderBy("qid", "rk")
  }

  /** MinHash + LSH banding near-dup detection on documents:
    * word-3-gram shingles → k=32 minhash signature → 8 bands × 4 rows →
    * band-bucket equi-join for candidates → signature-estimated Jaccard
    * filter. No quadratic pair enumeration at any point. */
  def minHashLsh(s: SparkSession, d: String, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val shingleRows0 = TextOps.shingleRows(s, d)
    // Signature via explode + numHashes flat hash columns + partial-agg
    // min: every expression stays inside whole-stage codegen. (The
    // nested-HOF formulation — transform(transform(xxhash64))) — runs
    // interpreted per element: measured 80× slower. The groupBy gives
    // map-side combine, so at scale only one signature row per doc
    // crosses the wire.)
    val hashCols = (0 until numHashes).map(i => xxhash64(lit(i), col("sh")).as(s"h$i"))
    val minCols = (0 until numHashes).map(i => min(col(s"h$i")).as(s"m$i"))
    val withSig = shingleRows0
      .select(col("doc_id") +: hashCols: _*)
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    // band key = hash of the band's signature slice
    val banded = withSig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(b, concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)),
            x => x.cast("string"))))))
        .as(Seq("band_idx", "band_key")))
    // dedup candidate pairs on bare ids first; fetch signatures after
    val cand = banded.select(col("doc_id").as("a_id"), col("band_idx"), col("band_key"))
      .join(banded.select(col("doc_id").as("b_id"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(withSig.select(col("doc_id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(withSig.select(col("doc_id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("a_sig"), col("b_sig"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("a_id", "b_id", "est_jaccard")
      .orderBy("a_id", "b_id")
  }

  /** SimHash near-dup: 64-bit signature from token hashes (per-bit
    * majority vote), candidates from 4×16-bit band collisions, kept when
    * hamming distance ≤ maxHamming. Pure expression pipeline — no UDFs,
    * no explode of the token list. */
  def simHashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    // Per-bit majority vote as 64 flat codegen'd agg columns over the
    // exploded token stream (the nested-HOF formulation runs
    // interpreted — see minHashLsh). Map-side combine means one
    // 64-counter row per doc reaches the shuffle.
    val tokenRows = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val voteCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val sigs = tokenRows
      .groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, CAST(b*16 AS INT)) & 65535)"))
        .as(Seq("band_idx", "band_key")))
    banded.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"),
        col("band_idx"), col("band_key"))
      .join(banded.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"),
        col("band_idx"), col("band_key")), Seq("band_idx", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")
  }
}
