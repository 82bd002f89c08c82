package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** One (band, band-hash, doc) collision row from the in-row banding. */
final case class BandHit(band: Int, bh: Long, doc_id: Long)

/** A candidate near-duplicate pair, a < b. */
final case class NearDupCandidate(a: Long, b: Long)

/** Streaming near-duplicate candidate detection — the incremental twin of
  * q46's MinHash/LSH banding (the reference, being batch-only, re-reads
  * the whole corpus per sync; this is the shape that keeps up with an
  * unbounded document feed).
  *
  * Dataflow: each arriving document computes its 128-perm MinHash
  * signature and 16 band hashes IN-ROW (native expressions, no shuffle),
  * then the only stateful step is keyed by (band, band-hash): state holds
  * the doc_ids previously seen in that bucket, and a new arrival emits one
  * candidate pair per stored id. So state per bucket is bounded by
  * [[Dedup.MaxBandBucket]] ids (the same skew cap as the batch path — a
  * degenerate bucket stops ACCUMULATING instead of going quadratic; batch
  * drops such buckets wholesale, the documented semantic difference), and
  * a processing-time timeout evicts idle buckets, so an unbounded-keyspace
  * feed cannot grow state without bound.
  *
  * Output is a candidate stream with at-least-once-per-band semantics —
  * a pair colliding in k bands is emitted up to k times (batch q46
  * `distinct`s; a streaming global distinct would be a second unbounded
  * stateful op, so dedup is left to the consumer, e.g. the downstream
  * exact-verification join that re-scores candidates anyway).
  *
  * Trigger note: under ProcessingTimeTimeout the engine re-triggers a
  * batch EVERY trigger interval even with no new data (that is how
  * timeouts get evaluated — `FlatMapGroupsWithStateExec
  * .shouldRunAnotherBatch` is unconditionally true), so drive this with
  * a throttled `Trigger.ProcessingTime(...)`, never the default ASAP
  * trigger (which hot-loops empty batches), and don't wait on
  * `processAllAvailable` (noNewData never latches) — poll the sink.
  */
object NearDupStream {

  /** docs stream with (doc_id, text) → candidate near-dup pairs.
    *
    * @param idleEvictionMs how long an untouched band bucket is remembered;
    *        pairs spanning a longer gap are missed (the watermark-style
    *        contract every bounded-state streaming dedup needs). */
  def candidatePairs(
      docs: DataFrame,
      idleEvictionMs: Long = 24L * 3600 * 1000): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    val bands = Dedup.bandRows(Dedup.signatures(docs)).as[BandHit]
    bands.groupByKey(h => (h.band, h.bh))
      .flatMapGroupsWithState[List[Long], NearDupCandidate](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        case (_, it, state: GroupState[List[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[NearDupCandidate]
            // Sorted for a deterministic admission order when the cap
            // binds; the emitted pair SET below the cap is order-free.
            it.toSeq.sortBy(_.doc_id).foreach { h =>
              if (!seen.contains(h.doc_id) && seen.size < Dedup.MaxBandBucket) {
                seen.foreach { s =>
                  out += NearDupCandidate(
                    math.min(s, h.doc_id), math.max(s, h.doc_id))
                }
                seen = h.doc_id :: seen
              }
            }
            state.update(seen)
            state.setTimeoutDuration(idleEvictionMs)
            out.result().iterator
          }
      }
  }
}
