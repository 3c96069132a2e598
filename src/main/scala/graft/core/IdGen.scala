package graft.core

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UUIDv7-format id generation (time-ordered, like the reference's
  * `Uuid::now_v7()` at graph_utils/graph.rs:44,59).
  *
  * Canonical UUID strings are fixed-width lowercase hex, so LEXICOGRAPHIC
  * string order == numeric u128 order — `WHERE id(a) < id(b)` (reference
  * cypher_spec.rs:1081-1082 compares `as_u128()`) maps directly to a
  * string comparison on the id column; no auxiliary sort key is needed.
  *
  * Two generators:
  *  - [[next]]: driver-side, strictly monotonic (counter in the random
  *    bits) — used for statement-level node creation where the reference
  *    allocates ids sequentially on its single engine thread;
  *  - [[distributedExpr]]: a Catalyst expression deriving the random
  *    bits from `monotonically_increasing_id()` (partition << 33 |
  *    offset — unique within a statement, stable once the batch is
  *    materialized) — used for per-binding-row edge creation, where a
  *    driver loop would serialize a distributed write.
  */
object IdGen {
  private val counter = new AtomicLong(0L)

  private def fmt(ms: Long, seq: Long): String = {
    // xxxxxxxx-xxxx-7xxx-8xxx-xxxxxxxxxxxx ; 60 bits of seq
    val timeHex = f"${ms & 0xffffffffffffL}%012x"
    val randA = (seq >>> 48) & 0xfffL
    val randB1 = (seq >>> 36) & 0xfffL
    val randB2 = seq & 0xfffffffffL
    f"${timeHex.substring(0, 8)}-${timeHex.substring(8)}-7$randA%03x-8$randB1%03x-$randB2%012x"
  }

  /** Driver-side monotonic UUIDv7 string. The top sequence bit
    * discriminates driver-generated ids from [[distributedExpr]] ids
    * (whose partition bits stay below bit 59), so the two generators
    * can never collide within a millisecond. */
  def next(): String =
    fmt(System.currentTimeMillis(), counter.getAndIncrement() | (1L << 59))

  /** Last timestamp handed to a [[distributedExpr]] batch. Each batch
    * claims a STRICTLY GREATER millisecond than every previous batch
    * (`max(now, prev+1)`): `monotonically_increasing_id()` is
    * deterministic for a given partitioning, so two edge-creating
    * batches in one statement (e.g. `CREATE (a)-[:X]->(b) CREATE
    * (a)-[:Y]->(b)`, multi-hop CREATE paths, MERGE-then-CREATE) would
    * otherwise reuse identical (time, seq) pairs and emit duplicate
    * ids — corrupting DELETE-by-rel-var, MERGE's min(id) dedup, and
    * RETURN joins. The time field only drifts ahead of wall-clock under
    * a sustained >1000 batches/sec, and stays creation-ordered (the
    * UUIDv7 property `id(a) < id(b)` queries rely on). */
  private val lastBatchMs = new AtomicLong(0L)

  /** Distributed UUIDv7-format id column: per-batch unique timestamp
    * (see [[lastBatchMs]] — preserves cross-batch creation order AND
    * cross-batch uniqueness) + `monotonically_increasing_id()`
    * uniqueness bits within the batch. */
  def distributedExpr(statementMs: Long): Column = {
    val batchMs = lastBatchMs.updateAndGet(prev => math.max(statementMs, prev + 1L))
    val timeHex = f"${batchMs & 0xffffffffffffL}%012x"
    val seq = monotonically_increasing_id()
    concat(
      lit(timeHex.substring(0, 8)), lit("-"), lit(timeHex.substring(8)), lit("-7"),
      lpad(lower(hex(shiftright(seq, 48).bitwiseAND(lit(0xfffL)))), 3, "0"), lit("-8"),
      lpad(lower(hex(shiftright(seq, 36).bitwiseAND(lit(0xfffL)))), 3, "0"), lit("-"),
      lpad(lower(hex(seq.bitwiseAND(lit(0xfffffffffL)))), 12, "0"))
  }
}
