package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming Count-Min heavy-terms sketch — q170's production form (the
  * 18th streaming member): a frequency-tracking service maintains
  * term-count sketches CONTINUOUSLY as documents arrive, instead of
  * re-running the corpus-wide sketch build per drop.
  *
  * Semantics (twin contract with q170, TextAnalysis.scala): terms
  * hash-shard deterministically (`(t.hashCode & MaxValue) % shards` —
  * every occurrence of a term lands in ONE shard), and each shard's
  * state is a fixed-size [[CountMinSketch]] with q170's parameters.
  * Counter-matrix ADDITION commutes, so the state after ANY prefix of
  * the stream equals a batch-built sketch over exactly the tokens that
  * have arrived, in whatever order the micro-batches deliver them —
  * the same any-order convergence contract as [[SourceCapStream]], and
  * the spec feeds ranges out of order to pin it. q170's one-sided
  * guarantees carry over per shard: estimates never undercount, and
  * the eps bound tightens (eps · N_shard ≤ eps · N).
  *
  * Scale shape: state is one fixed ~224 KB sketch per shard (eps 1e-3,
  * conf 0.9999 — `shards` × a constant, nothing data-proportional).
  * Tokens shuffle ONCE on the shard key into the stateful operator and
  * aggregate inside it (a streaming pre-aggregation before
  * flatMapGroupsWithState is not a supported combination, so the
  * map-side combine lives in the group function: one `addString` per
  * token, counters fold in place — text never enters state). Each
  * batch re-emits the touched shards' serialized sketches (Update
  * mode) — the sketch-checkpoint publish pattern: a serving layer
  * always loads a shard's latest emission.
  */
object HeavyTermsStream {

  final case class ShardTerm(shard: Int, t: String, c: Long)
  final case class ShardSketch(shard: Int, total: Long, sketch: Array[Byte])

  /** q170's tokenization, shard-keyed: lowercase, whitespace split,
    * empties dropped; every occurrence of a term lands in one shard. */
  def shardTerms(docs: DataFrame, shards: Int = 16): DataFrame =
    docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .select(pmod(hash(col("t")), lit(shards)).as("shard"), col("t"),
        lit(1L).as("c"))

  private def serialize(s: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  private[graft] def deserialize(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  /** Stateful per-shard sketch maintenance of a (possibly streaming)
    * pre-aggregated frame: state = the shard's serialized sketch. */
  def sketches(terms: DataFrame, eps: Double = 0.001,
      confidence: Double = 0.9999, seed: Int = 42): Dataset[ShardSketch] = {
    import terms.sparkSession.implicits._
    terms.as[ShardTerm]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Array[Byte], ShardSketch](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (shard, it, state) =>
          val cms = state.getOption.map(deserialize)
            .getOrElse(CountMinSketch.create(eps, confidence, seed))
          it.foreach(st => cms.addString(st.t, st.c))
          state.update(serialize(cms))
          Iterator.single(ShardSketch(shard, cms.totalCount(),
            serialize(cms)))
      }
  }

  /** Drive a streaming (doc_id, text) source through the sketcher. */
  def start(newDocs: DataFrame, shards: Int, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    sketches(shardTerms(newDocs, shards)).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id) }
      .start()
}
