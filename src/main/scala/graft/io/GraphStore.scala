package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}
import org.apache.spark.sql.SparkSession

import graft.core.PropertyGraph

/** Versioned parquet snapshot persistence — capability parity with the
  * reference's RON state files (persistence/persist.rs:85-166: active
  * `state.ron` + timestamped `state_YYYYMMDD_HHMMSS.ron` versions,
  * written to a tmp file then atomically renamed).
  *
  * Layout: `<root>/v_<UTCstamp>/nodes/` + `/edges/` per snapshot;
  * `<root>/active` is a text pointer to the current version directory
  * (pointer update is the atomic commit, like the reference's rename).
  * At cluster scale each snapshot is a plain parquet dataset — readable
  * by any Spark job without the engine.
  *
  * Snapshot/pointer commits go through the HADOOP filesystem of `root`
  * (resolved against the session's Hadoop conf), NOT java.nio: the
  * parquet write already lands wherever Spark's filesystem abstraction
  * points (HDFS, S3A, local), and a driver-local nio rename against a
  * distributed store would throw after the expensive write and leave
  * an orphaned .tmp_ directory. RON import/export below stay
  * driver-local nio by design — they are a single-process handoff with
  * the reference's own on-disk format.
  */
object GraphStore {

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd_HHmmss_SSS").withZone(java.time.ZoneOffset.UTC)

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** Write a new snapshot version and atomically repoint `active`.
    * Returns the version name. */
  def save(g: PropertyGraph, root: String): String = {
    val spark = g.nodes.sparkSession
    val version = s"v_${fmt.format(java.time.Instant.now())}"
    val tmp = s"$root/.tmp_$version"
    g.nodes.write.mode("overwrite").parquet(s"$tmp/nodes")
    g.edges.write.mode("overwrite").parquet(s"$tmp/edges")
    val conf = hadoopConf(spark)
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.rename(new HPath(tmp), new HPath(rootPath, version)))
      throw new java.io.IOException(
        s"snapshot commit failed: rename $tmp -> $version")
    val ptrTmp = new HPath(rootPath, ".active_tmp")
    val out = fs.create(ptrTmp, true)
    try out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // FileContext rename supports OVERWRITE (atomic where the FS is);
    // FileSystem.rename refuses an existing destination
    FileContext.getFileContext(fs.makeQualified(rootPath).toUri, conf)
      .rename(fs.makeQualified(ptrTmp),
        fs.makeQualified(new HPath(rootPath, "active")),
        Options.Rename.OVERWRITE)
    version
  }

  /** Load the active snapshot (or a specific version). */
  def load(spark: SparkSession, root: String, version: Option[String] = None): PropertyGraph = {
    val v = version.getOrElse {
      val rootPath = new HPath(root)
      val fs = rootPath.getFileSystem(hadoopConf(spark))
      val p = new HPath(rootPath, "active")
      if (fs.exists(p)) {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      } else {
        // an interrupted save (daemon shutdown mid-autosave) can leave
        // version dirs with no pointer — the pointer write IS the
        // commit — so fall back to the newest COMPLETE version instead
        // of stranding a store that has loadable data. Completeness is
        // probed via the parquet _SUCCESS markers of both datasets: on
        // stores with non-atomic directory rename (S3A) a crashed save
        // can leave a partial v_* dir, and blindly taking the newest
        // would load a graph missing edge partitions.
        val complete = versionNames(fs, rootPath).reverse.find(v =>
          fs.exists(new HPath(rootPath, s"$v/nodes/_SUCCESS")) &&
            fs.exists(new HPath(rootPath, s"$v/edges/_SUCCESS")))
        complete.getOrElse(
          throw new IllegalStateException(s"no active snapshot under $root"))
      }
    }
    PropertyGraph(
      spark.read.schema(PropertyGraph.nodeSchema).parquet(s"$root/$v/nodes"),
      spark.read.schema(PropertyGraph.edgeSchema).parquet(s"$root/$v/edges"))
  }

  /** SNAPSHOT DIFF: what changed between two versions — per entity
    * kind (`node` / `edge`), rows `added`, `removed`, or `changed`
    * (same id, different label/type or properties). The audit query a
    * versioned store owes its operators ("what did yesterday's load
    * do"), computed as distributed full-outer joins on id — no
    * collect, each side scanned once, works on snapshots of any size.
    * Returns (kind, change, id) rows sorted for stable display. */
  def diff(spark: SparkSession, root: String, fromVersion: String,
      toVersion: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val a = load(spark, root, Some(fromVersion))
    val b = load(spark, root, Some(toVersion))
    // canonical payload rendering: map entries sorted by key, so equal
    // property maps compare equal regardless of physical entry order
    def side(df: org.apache.spark.sql.DataFrame,
        scalarCols: Seq[String], tag: String) =
      df.select(col("id"),
        to_json(struct(scalarCols.map(col) :+
          array_sort(map_entries(col("properties"))).as("props"): _*))
          .as(s"payload_$tag"))
    def diffKind(da: org.apache.spark.sql.DataFrame,
        db: org.apache.spark.sql.DataFrame, kind: String,
        scalarCols: Seq[String]) =
      side(da, scalarCols, "a")
        .join(side(db, scalarCols, "b"), Seq("id"), "full_outer")
        .withColumn("change",
          when(col("payload_a").isNull, "added")
            .when(col("payload_b").isNull, "removed")
            .when(col("payload_a") =!= col("payload_b"), "changed"))
        .filter(col("change").isNotNull)
        .select(lit(kind).as("kind"), col("change"), col("id"))
    diffKind(a.nodes, b.nodes, "node", Seq("label"))
      .unionByName(diffKind(a.edges, b.edges, "edge",
        Seq("src", "dst", "label")))
      .orderBy("kind", "change", "id")
  }

  /** MIGRATION IN: load a reference `state.ron` (or
    * `state_YYYYMMDD_HHMMSS.ron` version) into a [[PropertyGraph]].
    * GUI-only fields (node_positions, pan, zoom) are dropped. The parse
    * is driver-side — a state.ron is by construction one single-node
    * in-memory graph — and the rows land in Spark immediately, so
    * everything downstream is distributed. */
  def importRon(spark: SparkSession, path: String): PropertyGraph = {
    val st = RonState.parseState(Files.readString(Paths.get(path)))
    PropertyGraph(
      PropertyGraph.nodesDf(spark,
        st.nodes.map(n => (n.id, n.label, n.metadata))),
      PropertyGraph.edgesDf(spark,
        st.rels.map(r => (r.id, r.from, r.to, r.label, r.metadata))))
  }

  /** MIGRATION OUT: write `g` as a reference-loadable `state.ron`
    * (atomic tmp+rename like persist.rs:100-109; empty GUI layout —
    * the reference lays out unpositioned nodes itself). Collects to the
    * driver: the reference can only open graphs that fit one process
    * anyway, so the export to its native format is inherently a
    * single-node handoff. */
  def exportRon(g: PropertyGraph, path: String): Unit = {
    val nodes = g.nodes.select("id", "label", "properties").collect().toVector
      .map(r => RonState.RonNode(r.getString(0), r.getString(1),
        r.getMap[String, String](2).toMap))
    val rels = g.edges.select("id", "src", "dst", "label", "properties")
      .collect().toVector
      .map(r => RonState.RonRel(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getMap[String, String](4).toMap))
    val text = RonState.renderState(RonState.RonGraphState(
      nodes, rels, Vector.empty, (0f, 0f), 1f))
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, text)
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** List snapshot versions, newest last (persist.rs:149-166). Rides
    * the session's Hadoop conf when one is live (S3 credentials etc.);
    * a bare Configuration still resolves file:// and HDFS defaults.
    * Callers that already hold the right FileSystem (load's fallback)
    * use [[versionNames]] directly so credentials can't diverge from
    * the pointer check they just made. */
  def listVersions(root: String): Seq[String] = {
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(hadoopConf).getOrElse(new Configuration())
    val rootPath = new HPath(root)
    versionNames(rootPath.getFileSystem(conf), rootPath)
  }

  private def versionNames(fs: org.apache.hadoop.fs.FileSystem,
      rootPath: HPath): Seq[String] = {
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v_")).sorted
  }
}
