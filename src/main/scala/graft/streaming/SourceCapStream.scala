package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}

/** Streaming per-source corpus cap — q110's production form (the 17th
  * streaming member): a corpus-balancing service maintains "at most K
  * documents per source, chosen by md5 order" CONTINUOUSLY as documents
  * arrive, instead of re-running the batch window over the whole corpus
  * per drop.
  *
  * Semantics (twin contract with q110, TextAnalysis.scala): the kept
  * set per source is the K smallest (md5(doc_id), doc_id) pairs seen so
  * far — a deterministic sample that is stable across runs and engines
  * (no RAND(), no first-K-by-arrival). Because top-K-by-a-total-order
  * is a SEMILATTICE merge (merge(a, b) = take-K(sort(a ∪ b))), the
  * state after ANY prefix of the stream equals batch q110 over exactly
  * the documents that have arrived, in WHATEVER order the micro-batches
  * deliver them — a stronger contract than arrival-order members like
  * [[SeqPackStream]], and the spec feeds ranges out of order to pin it.
  * Re-delivered documents (at-least-once sources) dedupe inside the
  * merge.
  *
  * Scale shape: the keyed state is at most K (md5, doc_id) pairs per
  * source — cap × |sources|, nothing data-proportional — and each
  * update is one merge of the batch's slice into it. Text never enters
  * state; only (source, doc_id, md5) move. Output mode is Update: a
  * batch re-emits the CURRENT kept set (with ranks) for every source it
  * touched, so the latest emission per source is always that source's
  * live sample.
  */
object SourceCapStream {

  final case class DocKey(source: String, doc_id: Long, k: String)
  final case class Kept(source: String, doc_id: Long, rn: Long)
  final case class CapState(kept: Seq[(String, Long)])

  /** q110's in-scan projection: (source, doc_id, md5 sort key). */
  def keyed(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("k"))

  /** Stateful per-source top-K maintenance of a (possibly streaming)
    * projected frame: state = the source's current kept set, sorted by
    * (md5, doc_id), at most `cap` entries. */
  def kept(keyedDocs: DataFrame, cap: Int = 10): Dataset[Kept] = {
    import keyedDocs.sparkSession.implicits._
    require(cap > 0, s"per-source cap must be positive: $cap")
    keyedDocs.as[DocKey]
      .groupByKey(_.source)
      .flatMapGroupsWithState[CapState, Kept](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (source, it, state) =>
          val prev = state.getOption.map(_.kept).getOrElse(Seq.empty)
          val merged = (prev ++ it.map(d => (d.k, d.doc_id)))
            .distinct.sorted.take(cap)
          state.update(CapState(merged))
          merged.iterator.zipWithIndex.map { case ((_, id), ix) =>
            Kept(source, id, ix + 1L)
          }
      }
  }

  /** Drive a streaming (source, doc_id) source through the cap. Update
    * mode: each batch re-emits the touched sources' current kept sets. */
  def start(newDocs: DataFrame, cap: Int, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    kept(keyed(newDocs), cap).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id) }
      .start()
}
