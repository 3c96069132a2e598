package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  */
object GraphStore {

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd_HHmmss_SSS").withZone(java.time.ZoneOffset.UTC)

  /** Write a new snapshot version and atomically repoint `active`.
    * Returns the version name. */
  def save(g: PropertyGraph, root: String): String = {
    val version = s"v_${fmt.format(java.time.Instant.now())}"
    val tmp = s"$root/.tmp_$version"
    g.nodes.write.mode("overwrite").parquet(s"$tmp/nodes")
    g.edges.write.mode("overwrite").parquet(s"$tmp/edges")
    val target = Paths.get(root, version)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    val ptrTmp = Paths.get(root, ".active_tmp")
    Files.writeString(ptrTmp, version)
    Files.move(ptrTmp, Paths.get(root, "active"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** Load the active snapshot (or a specific version). */
  def load(spark: SparkSession, root: String, version: Option[String] = None): PropertyGraph = {
    val v = version.getOrElse {
      val p = Paths.get(root, "active")
      if (!Files.exists(p)) throw new IllegalStateException(s"no active snapshot under $root")
      Files.readString(p).trim
    }
    PropertyGraph(
      spark.read.schema(PropertyGraph.nodeSchema).parquet(s"$root/$v/nodes"),
      spark.read.schema(PropertyGraph.edgeSchema).parquet(s"$root/$v/edges"))
  }

  /** List snapshot versions, newest last (persist.rs:149-166). */
  def listVersions(root: String): Seq[String] = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) return Seq.empty
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v_")).toSeq.sorted
    } finally s.close()
  }
}
