package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming uniform sampling of an unbounded document feed — the
  * streaming twin of q176's deterministic bottom-k sampler (and the
  * production replacement for one-shot `USING SAMPLE n ROWS` when the
  * population never stops arriving: a training-data pipeline samples
  * its firehose continuously, not once).
  *
  * Technique: a BOTTOM-K HASH SKETCH (the classic mergeable-sample
  * construction, e.g. Apache DataSketches' sampling family; also the
  * KMV distinct-count estimator's kept set) instead of Vitter's
  * Algorithm R. Each doc_id gets a deterministic priority —
  * `md5(CAST(doc_id AS STRING))`, the repo's cross-engine determinism
  * workhorse (q89's split assignment) — and the sample IS the n
  * smallest priorities seen so far. Uniform over the id population
  * (md5 scrambles ids uniformly), and unlike an RNG reservoir it is
  *   - ORDER-INVARIANT: micro-batch boundaries, retries, and arrival
  *     order cannot change the sample (Algorithm R's RNG stream makes
  *     every reordering a different sample — untestable and
  *     non-replayable);
  *   - MERGEABLE: union-then-bottom-n of any partition of the feed
  *     equals the bottom-n of the whole feed, which is exactly what a
  *     1000-executor ingest needs;
  *   - DUPLICATE-SAFE: a re-delivered doc_id carries the same priority,
  *     so at-least-once feeds cannot inflate the sample.
  *
  * Scale shape: the feed salts into [[Salts]] groups by a priority-hash
  * byte (uniform, deterministic), each group's state holds AT MOST n
  * (priority, id, payload) rows — per-group bottom-n is necessary
  * because the global bottom-n can land entirely in one salt group —
  * so total state is Salts × n rows regardless of feed size, and the
  * per-batch work per group is a merge of (state ∪ batch) truncated to
  * n. The final n-row sample is the bottom-n of the ≤ Salts × n rows
  * the groups emit ([[merged]] — a bounded frame, never the feed).
  */
object ReservoirSampleStream {

  /** Salt-group fan-out: state parallelism without losing exactness
    * (the union of per-group bottom-n sets is a superset of the global
    * bottom-n). */
  val Salts = 16

  final case class Doc(doc_id: Long, payload: String)
  final case class Sampled(salt: Int, priority: String, doc_id: Long,
    payload: String)
  final case class Res(rows: Seq[Sampled])

  /** md5 hex of the decimal id string — bit-identical to SQL
    * `md5(CAST(doc_id AS STRING))` on both engines. */
  def priority(docId: Long): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Deterministic salt from the priority's first byte (NOT the raw id:
    * sequential ids would stripe, md5 bytes are uniform). */
  def salt(docId: Long): Int =
    Integer.parseInt(priority(docId).substring(0, 2), 16) % Salts

  /** The streaming operator: each trigger updates every touched salt
    * group's bottom-n and emits the group's CURRENT reservoir (Update
    * mode — the sink's latest rows per group are the live sample). */
  def sample(docs: Dataset[Doc], n: Int): Dataset[Sampled] = {
    import docs.sparkSession.implicits._
    // hash ONCE per row (the md5 is the per-row hot cost): priority and
    // its salt byte come from one narrow map; groupByKey keys on the
    // precomputed salt (review follow-up — salt(id) re-hashed)
    docs.map { d =>
      val pr = priority(d.doc_id)
      Sampled(Integer.parseInt(pr.substring(0, 2), 16) % Salts,
        pr, d.doc_id, d.payload)
    }
      .groupByKey(_.salt)
      .flatMapGroupsWithState[Res, Sampled](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val fresh = it
          val merged = (state.getOption.map(_.rows).getOrElse(Seq.empty)
            ++ fresh)
            .groupBy(_.doc_id).map(_._2.head).toSeq // duplicate-safe
            .sortBy(r => (r.priority, r.doc_id))
            .take(n)
          state.update(Res(merged))
          merged.iterator
      }
  }

  /** Bounded final merge: global bottom-n over the per-group reservoirs
    * (≤ Salts × n input rows — a TakeOrdered over a sketch, never the
    * feed). Works identically on the streaming sink's latest rows and
    * on any batch frame carrying (priority, doc_id, payload). */
  def merged(reservoirs: DataFrame, n: Int): DataFrame =
    reservoirs.select("priority", "doc_id", "payload")
      .dropDuplicates("doc_id")
      .orderBy("priority", "doc_id").limit(n)

  /** The batch twin (q176's body): bottom-n of the whole population in
    * one TakeOrdered pass — what a from-scratch rebuild computes, and
    * what the stream must equal after any micro-batching. */
  def batchSample(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("priority"),
        col("payload"))
      .orderBy("priority", "doc_id").limit(n)
      .select("priority", "doc_id", "payload")
}
