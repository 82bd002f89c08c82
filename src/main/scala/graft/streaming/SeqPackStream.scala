package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}

/** Streaming sequence packing — q99's production form (the 16th
  * streaming member): a training-ingest service packs arriving
  * documents into context-window-sized sequences CONTINUOUSLY, instead
  * of re-running the batch packer over the whole corpus per drop.
  *
  * Semantics (twin contract with q99, TextAnalysis.scala): documents
  * hash-shard by the first md5 nibble of doc_id; within a shard each
  * doc is assigned the bin its cumulative token START falls in
  * (`floor(cumBefore / budget)` — greedy contiguous fill, oversize
  * docs overflow their own bin). The stream packs in ARRIVAL order
  * across micro-batches and doc_id order within one (the only order a
  * stream can promise); when batches arrive in ascending doc_id ranges
  * — the spec's split — the per-doc assignments and the (shard, bin)
  * rollup are EXACTLY the batch q99's.
  *
  * Scale shape: the keyed state is ONE long (the shard's running token
  * count) per shard — 16 longs total, nothing data-proportional — and
  * the per-batch group sort buffers only that batch's shard slice.
  * Tokens are counted in-scan (`tokenCount`); text never enters state.
  */
object SeqPackStream {

  final case class DocTok(shard: String, doc_id: Long, tok: Long)
  final case class Packed(shard: String, doc_id: Long, tok: Long, bin: Long)

  /** q99's in-scan projection: (shard, doc_id, tok) from (doc_id, text). */
  def docToks(docs: DataFrame): DataFrame =
    docs.select(
      substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"),
      col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("tok"))

  /** Stateful per-shard packing of a (possibly streaming) projected
    * frame: state = the shard's running token count. */
  def assignments(toks: DataFrame, budget: Long = 2048L): Dataset[Packed] = {
    import toks.sparkSession.implicits._
    require(budget > 0, s"sequence budget must be positive: $budget")
    toks.as[DocTok]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Long, Packed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, it, state) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val bin = cum / budget // floor: cum and budget non-negative
            cum += d.tok
            Packed(shard, d.doc_id, d.tok, bin)
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Drive a streaming (doc_id, text) source through the packer. The
    * stateful operator needs Append output with explicit state — the
    * one-long-per-shard state the Scaladoc argues. */
  def start(newDocs: DataFrame, budget: Long, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    assignments(docToks(newDocs), budget).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id) }
      .start()
}
