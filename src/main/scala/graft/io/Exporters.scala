package graft.io

import graft.core.Materialize.GraftMaterializeOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PropertyGraph

/** JSON/CSV exporters matching the reference's export shapes
  * (SURVEY §2.1 S7-S10, gui/frontend.rs:18-156).
  *
  * Every exporter is a distributed `df.write` (scales to any size); the
  * reference writes one pretty-printed file from the GUI thread, so a
  * `singleFile` option coalesces to one part for shape parity on small
  * graphs.
  */
object Exporters {

  private def maybeOne(df: DataFrame, singleFile: Boolean): DataFrame =
    if (singleFile) df.coalesce(1) else df

  /** S7: selected nodes → JSON `[{id,label,metadata}]`
    * (frontend.rs:18-40). `ids` null = all nodes. */
  def nodesToJson(g: PropertyGraph, ids: Option[DataFrame], path: String,
      singleFile: Boolean = true): Unit = {
    val sel = ids.map(i => g.nodes.join(i.withColumnRenamed(i.columns.head, "id"), "id"))
      .getOrElse(g.nodes)
    maybeOne(sel.select(col("id"), col("label"), col("properties").as("metadata")),
      singleFile).write.mode("overwrite").json(path)
  }

  /** S8: selected nodes → CSV `id,label,metadata_json`
    * (frontend.rs:42-55). */
  def nodesToCsv(g: PropertyGraph, ids: Option[DataFrame], path: String,
      singleFile: Boolean = true): Unit = {
    val sel = ids.map(i => g.nodes.join(i.withColumnRenamed(i.columns.head, "id"), "id"))
      .getOrElse(g.nodes)
    maybeOne(sel.select(col("id"), col("label"),
      to_json(col("properties")).as("metadata_json")), singleFile)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Adjacency lists for S9/S10: per node, outgoing and incoming rel
    * summaries (frontend.rs:58-115 embeds both directions). */
  private def withAdjacency(g: PropertyGraph): DataFrame = {
    val outRels = g.edges
      .groupBy(col("src"))
      .agg(collect_list(struct(col("id").as("rel_id"), col("dst").as("to"),
        col("label"), col("properties").as("metadata"))).as("out_rels"))
      .withColumnRenamed("src", "id")
    val inRels = g.edges
      .groupBy(col("dst"))
      .agg(collect_list(struct(col("id").as("rel_id"), col("src").as("from"),
        col("label"), col("properties").as("metadata"))).as("in_rels"))
      .withColumnRenamed("dst", "id")
    g.nodes
      .join(outRels, Seq("id"), "left")
      .join(inRels, Seq("id"), "left")
  }

  /** S9: whole graph → JSON — nodes embedded with out/in adjacency plus
    * a flat relationship list (two datasets under `path`). */
  def graphToJson(g: PropertyGraph, path: String, singleFile: Boolean = true): Unit = {
    maybeOne(withAdjacency(g).select(col("id"), col("label"),
      col("properties").as("metadata"), col("out_rels"), col("in_rels")), singleFile)
      .write.mode("overwrite").json(s"$path/nodes")
    maybeOne(g.edges.select(col("id"), col("src").as("from"), col("dst").as("to"),
      col("label"), col("properties").as("metadata")), singleFile)
      .write.mode("overwrite").json(s"$path/relationships")
  }

  /** S10: whole graph → two CSVs `{stem}_nodes` / `{stem}_relationships`
    * (frontend.rs:117-156), adjacency serialized as JSON strings. */
  def graphToCsv(g: PropertyGraph, path: String, singleFile: Boolean = true): Unit = {
    maybeOne(withAdjacency(g).select(col("id"), col("label"),
      to_json(col("properties")).as("metadata_json"),
      to_json(col("out_rels")).as("out_rels_json"),
      to_json(col("in_rels")).as("in_rels_json")), singleFile)
      .write.mode("overwrite").option("header", "true").csv(s"$path/nodes")
    maybeOne(g.edges.select(col("id"), col("src").as("from"), col("dst").as("to"),
      col("label"), to_json(col("properties")).as("metadata_json")), singleFile)
      .write.mode("overwrite").option("header", "true").csv(s"$path/relationships")
  }

  /** Beyond-parity sink: the end of the training-data pipeline — gated
    * documents as SHARDED JSONL, the hand-off format a trainer's data
    * loader reads. Composes the oracle-checked stages: the q50-style
    * quality floor and q47 stratified keep (both row-pure), then the
    * q49 token-budget chunk assignment, sharded as `shard=N` partition
    * directories with `shardChunks` chunks per shard.
    *
    * Scale: partitioned write — each task writes only its shards; the
    * shard key derives from the deterministic chunk id, so re-running
    * the SAME complete corpus reproduces identical shard contents
    * (restartable full backfills). Chunk ids come from a global prefix
    * sum over the gated set, so a run over a different input subset
    * shifts downstream chunk/shard assignments — restartability means
    * re-writing shards from the same full corpus, not incremental
    * subset replay. */
  def documentsToTrainingShards(spark: SparkSession, sfDir: String,
      path: String, minTokens: Long = 10L, budget: Long = 2048L,
      shardChunks: Long = 4L,
      rates: Map[String, Int] = Map("en" -> 25), defaultRate: Int = 75): Long = {
    import graft.operators.TextOps
    val gated = graft.Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("bigint"))
      .filter(col("n_tokens") > minTokens)
      .filter(TextOps.stratifiedKeep(rates, defaultRate))
    // pack the GATED set: budget is spent only on surviving documents
    val chunks = TextOps.packChunksOf(
        gated.select(col("doc_id"), col("n_tokens")), budget)
      .select(col("doc_id"), col("chunk_id"))
    val out = gated.join(chunks, "doc_id")
      .withColumn("shard", expr(s"chunk_id div $shardChunks"))
      .select("doc_id", "lang", "source", "n_tokens", "chunk_id", "shard", "text")
      .graftCheckpoint() // compute the pipeline ONCE for write + count
    out.write.mode("overwrite").partitionBy("shard").json(path)
    val n = out.count()
    out.unpersist(blocking = false)
    n
  }

  /** FULL CURATION PIPELINE in one call — the end-to-end composition a
    * pretraining data run executes, each stage an oracle-checked
    * operator:
    *
    *  1. quality floor (q50-style token minimum, row-pure);
    *  2. near-dup dedup: keep only each q43 cluster's canonical keeper
    *     (shingle-Jaccard pairs → fixed-sweep connected components);
    *  3. mixture temperature resampling (q62): per-source √-flattening
    *     thresholds computed over the POST-dedup gated corpus, applied
    *     with the shared md5-bucket coin — deterministic, replayable;
    *  4. token-budget packing (q49) over the survivors;
    *  5. sharded JSONL write (trainer hand-off format).
    *
    * Returns (docs surviving, shards written). Deterministic: the same
    * complete corpus reproduces byte-identical shard contents (all five
    * stages are deterministic functions of the full input — see the
    * subset caveat on [[documentsToTrainingShards]]).
    *
    * Scale: stages 1-3 are map-only over the corpus once the keeper set
    * (one components run) and the tiny threshold table (broadcast) are
    * derived; packing is the q49 bucketed prefix sum; the write is
    * partitioned by shard. No collect, no global sort. */
  def curatedTrainingShards(spark: SparkSession, sfDir: String,
      path: String, minTokens: Long = 10L, budget: Long = 2048L,
      shardChunks: Long = 4L): (Long, Long) = {
    import graft.operators.TextOps
    val gated = graft.Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("bigint"))
      .filter(col("n_tokens") > minTokens)
    val keepers = TextOps.dedupClusters(spark, sfDir)
      .filter(col("keep")).select("doc_id")
    val deduped = gated.join(keepers, "doc_id")
    val thresholds = TextOps.mixtureThresholds(deduped)
      .select("source", "threshold")
    val sampled = deduped
      .join(broadcast(thresholds), "source")
      .filter(TextOps.md5Bucket(col("doc_id")) < col("threshold"))
    val chunks = TextOps.packChunksOf(
        sampled.select(col("doc_id"), col("n_tokens")), budget)
      .select(col("doc_id"), col("chunk_id"))
    val out = sampled.join(chunks, "doc_id")
      .withColumn("shard", expr(s"chunk_id div $shardChunks"))
      .select("doc_id", "lang", "source", "n_tokens", "chunk_id", "shard", "text")
      .graftCheckpoint()
    out.write.mode("overwrite").partitionBy("shard").json(path)
    val n = out.count()
    val shards = out.select("shard").distinct().count()
    out.unpersist(blocking = false)
    (n, shards)
  }

  /** Beyond-parity sink #3: the EMBEDDING-side curation pipeline — the
    * vector twin of [[curatedTrainingShards]]. Composes the
    * oracle-checked stages: cosine near-dup clustering (q44) picks one
    * keeper per duplicate cluster, the IVF coarse quantizer (q41's
    * index) assigns each keeper its cell, and the result lands as a
    * cell-partitioned parquet index — the layout an ANN serving tier
    * loads (query → probe nprobe cell directories; partition pruning
    * does the fan-out cut). Returns (keepers written, cells used).
    *
    * Scale: dedup and assignment are the q44/q41 plans unchanged; the
    * write is partitioned so each task emits only its cells. Cell
    * skew is bounded by the quantizer (k-means cells are balanced to
    * within data geometry); a hot cell can be salted at read time. */
  def curatedEmbeddingIndex(spark: SparkSession, sfDir: String,
      path: String, nlist: Int = 16): (Long, Long) = {
    import graft.operators.SimilarityOps
    val keepers = SimilarityOps.cosineDedupClusters(spark, sfDir)
      .filter(col("keep")).select("vec_id")
    val indexed = SimilarityOps.cellAssignments(spark, sfDir, nlist)
      .join(keepers, "vec_id")
      .select("vec_id", "cell", "embedding")
      .graftCheckpoint()
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
    val n = indexed.count()
    val cells = indexed.select("cell").distinct().count()
    indexed.unpersist(blocking = false) // release the checkpoint blocks
    (n, cells)
  }
}
