package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Per-day append-only query/API logs — parity with the reference's
  * S11/S12 sinks (query_interface.rs:28-52 `queries_YYYYMMDD.log`,
  * api/server.rs:39-52 `api_YYYYMMDD.log` with request id + latency).
  * Driver-side by design: these log engine activity, not data.
  */
class QueryLog(dir: String, prefix: String) {
  private val dayFmt = DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(ZoneOffset.UTC)
  // best-effort like the reference (`let _ = create_dir_all`,
  // query_interface.rs:37): an unwritable log dir must not prevent the
  // engine from serving
  try Files.createDirectories(Paths.get(dir))
  catch { case scala.util.control.NonFatal(_) => () }

  private def file() =
    Paths.get(dir, s"${prefix}_${dayFmt.format(Instant.now())}.log")

  def append(line: String): Unit = synchronized {
    val stamped = s"[${tsFmt.format(Instant.now())}] $line\n"
    // reference parity (`let _ = file.write_all`, query_interface.rs:50,
    // api/server.rs:50): the logs are observability, not correctness — a
    // full disk mid-request must neither flip a SUCCEEDED query's answer
    // to error (the ok-path log call sits inside the engine-thread try)
    // nor propagate out of the error path and kill the drainer
    try Files.writeString(file(), stamped,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Reference query-log shape: status + counters + mutated flag. */
  def logQuery(query: String, ok: Boolean, affectedNodes: Long,
      affectedRels: Long, mutated: Boolean, error: Option[String] = None): Unit =
    append(s"status=${if (ok) "ok" else "error"} nodes=$affectedNodes " +
      s"rels=$affectedRels mutated=$mutated${error.map(e => s" error=$e").getOrElse("")} " +
      s"query=${query.replaceAll("\\s+", " ").take(500)}")

  /** Reference API-log shape: request id + latency ms. */
  def logApi(requestId: String, dtMs: Long, status: Int): Unit =
    append(s"rid=$requestId dt_ms=$dtMs status=$status")
}
