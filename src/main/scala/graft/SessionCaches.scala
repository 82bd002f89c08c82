package graft

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of graft-INTERNAL persisted frames.
  *
  * Some operators `.persist()` bounded intermediates (vocabulary /
  * posting-list / sketch sized) that only materialize when the RETURNED
  * DataFrame is consumed, so the operator cannot unpersist them itself
  * (SparkEntry's caller contract). Verify and Bench handle this with
  * `spark.catalog.clearCache()` between queries, but a long-lived REPL
  * or embedding session cannot: clearCache would also drop the USER's
  * own `CACHE TABLE` pins (VERDICT/ADVICE r9 — the accumulation was
  * documented, not fixed, precisely because of that collision).
  *
  * This registry separates the two populations. Operators route their
  * internal persists through [[TrackedPersist.persistTracked]]; a caller
  * that has CONSUMED the returned frame calls [[release]] to drop
  * exactly the graft-internal entries — user pins survive. The REPL
  * releases after every statement; `unpersist` is idempotent, so frames
  * a caller already cleared (or cleared via clearCache) are no-ops.
  *
  * Driver-memory bound: the queue holds Dataset references (logical
  * plans), drained on every release — a session that never releases
  * grows the queue by a few plans per corpus query, the same order as
  * the cached blocks it documents.
  */
object SessionCaches {

  private val reg =
    new ConcurrentHashMap[SparkSession, mutable.Queue[Dataset[_]]]()

  /** Register an internally-persisted frame for later [[release]].
    * Each track() also evicts entries of STOPPED sessions (review
    * follow-up): an embedding caller that never release()s and then
    * spark.stop()s would otherwise leave the session and every tracked
    * plan strongly reachable in this global map forever. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val it = reg.keySet.iterator
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    val q = reg.computeIfAbsent(ds.sparkSession,
      _ => mutable.Queue.empty[Dataset[_]])
    q.synchronized { q.enqueue(ds) }
    ds
  }

  /** Unpersist (non-blocking) every tracked frame of `spark` and drop
    * them from the registry. Safe to call at any statement boundary —
    * tracked frames are query-internal, never user pins. */
  def release(spark: SparkSession): Unit = {
    val q = reg.remove(spark)
    if (q != null) q.synchronized { q.foreach(_.unpersist(false)) }
  }

  /** Tracked persists outstanding for `spark` (spec observability). */
  def outstanding(spark: SparkSession): Int = {
    val q = reg.get(spark)
    if (q == null) 0 else q.synchronized { q.size }
  }

  /** `.persistTracked()` = `.persist()` + [[track]] — the form every
    * graft-internal persist whose lifetime escapes its operator uses. */
  implicit class TrackedPersist[T](private val ds: Dataset[T])
      extends AnyVal {
    def persistTracked(): Dataset[T] = track(ds.persist())
  }
}
