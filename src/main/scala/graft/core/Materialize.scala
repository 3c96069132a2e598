package graft.core

import org.apache.spark.sql.Dataset

/** Lineage-cutting materialization for iterative chains and shared
  * frames, with a durability escape hatch.
  *
  * Default behavior is `localCheckpoint(eager = true)`: blocks are
  * stored on executors — fast, no distributed filesystem needed, the
  * right call for local mode and short-lived jobs. Its known weakness
  * at cluster scale is that the blocks die with their executor, and a
  * lost executor then forces recomputing the whole chain (the lineage
  * was truncated, so there is nothing to replay from).
  *
  * Setting `spark.graft.durableCheckpoint=<dir>` swaps every call site
  * to a RELIABLE `checkpoint(eager = true)` under `<dir>` (any
  * Hadoop-visible path: HDFS, S3A, local). State then survives executor
  * loss at the cost of one write to durable storage per
  * materialization — the compute-side analog of the reference's
  * persist-to-disk durability story (persist.rs). Long-lived services
  * (`graft.Serve`) on real clusters should set it; batch runs on
  * local[n] should not.
  */
object Materialize {

  /** The checkpoint dir last applied to the SparkContext, so a conf
    * change mid-session re-points the context exactly once (Spark
    * appends a UUID subdir, so the raw conf value can't be compared
    * against `sc.getCheckpointDir`). */
  @volatile private var appliedDir: Option[String] = None

  /** Materialize `ds` eagerly and cut its lineage; durable iff
    * `spark.graft.durableCheckpoint` is set to a non-empty dir. */
  def frame[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption("spark.graft.durableCheckpoint")
      .filter(_.nonEmpty) match {
      case Some(dir) =>
        if (!appliedDir.contains(dir)) synchronized {
          if (!appliedDir.contains(dir)) {
            spark.sparkContext.setCheckpointDir(dir)
            appliedDir = Some(dir)
          }
        }
        ds.checkpoint(eager = true)
      case None => ds.localCheckpoint(eager = true)
    }
  }

  /** `.graftCheckpoint()` — call-site sugar for [[Materialize.frame]]. */
  implicit final class GraftMaterializeOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def graftCheckpoint(): Dataset[T] = Materialize.frame(ds)
  }
}
