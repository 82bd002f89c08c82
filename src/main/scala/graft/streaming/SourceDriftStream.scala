package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}

/** Streaming per-source distribution monitor — q133's production form
  * (the 19th streaming member): a drift watchdog maintains each
  * source's token distribution CONTINUOUSLY as documents arrive,
  * instead of re-running the corpus-wide chi² grid per drop.
  *
  * Semantics: q133's exact chi² runs over the FULL vocabulary — state
  * proportional to the corpus, exactly what a stream must not hold.
  * The serving twin HASHES tokens onto a fixed `dim`-bucket grid
  * (`pmod(hash(w), dim)` — the q189 HashedBow trick) and keeps ONE
  * count vector per source: bucket addition commutes, so the state
  * after ANY prefix of the stream equals a batch-built hashed grid
  * over exactly the arrived tokens, in whatever order the
  * micro-batches deliver them (the [[SourceCapStream]] /
  * [[HeavyTermsStream]] convergence contract — the spec feeds ranges
  * out of order and compares vectors to the batch build bucket by
  * bucket). Each batch re-emits the touched sources' vectors; the
  * consumer computes the chi²-against-pooled-distribution on the
  * K × dim panel it holds — a bounded, driver-side fold, the eval-panel
  * discipline.
  *
  * Scale shape: state is `dim` longs per source (8 KB at the default
  * 1024 — sources × a constant, nothing data-proportional); tokens
  * shuffle ONCE on the source key and fold inside the group function
  * (text never enters state).
  */
object SourceDriftStream {

  final case class SrcTok(source: String, idx: Int)
  final case class SrcVector(source: String, total: Long, counts: Seq[Long])

  /** q133's tokenization on the hashed grid: (source, bucket). */
  def hashedTokens(docs: DataFrame, dim: Int = 1024): DataFrame =
    docs.select(col("source"),
      explode(regexp_extract_all(lower(col("text")), lit("\\p{L}+"),
        lit(0))).as("w"))
      .select(col("source"), pmod(hash(col("w")), lit(dim)).as("idx"))

  /** Stateful per-source vector maintenance: state = the source's
    * bucket counts. */
  def vectors(toks: DataFrame, dim: Int = 1024): Dataset[SrcVector] = {
    import toks.sparkSession.implicits._
    require(dim > 0, s"grid dimension must be positive: $dim")
    toks.as[SrcTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Seq[Long], SrcVector](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (source, it, state) =>
          val acc = state.getOption.map(_.toArray)
            .getOrElse(Array.fill(dim)(0L))
          it.foreach(st => acc(st.idx) += 1L)
          state.update(acc.toSeq)
          Iterator.single(SrcVector(source, acc.sum, acc.toSeq))
      }
  }

  /** chi² of one source's vector against the POOLED distribution of a
    * panel of vectors — the q133 statistic on the hashed grid. Pure
    * arithmetic over the K × dim panel the consumer holds. */
  def chi2(panel: Map[String, Seq[Long]], source: String): Double = {
    val counts = panel(source)
    val st = counts.map(_.toDouble).sum
    val tt = panel.valuesIterator.map(_.map(_.toDouble).sum).sum
    val dim = counts.length
    (0 until dim).iterator.map { i =>
      val cw = panel.valuesIterator.map(_(i).toDouble).sum
      val expd = st * cw / tt
      if (expd == 0.0) 0.0
      else { val dev = counts(i) - expd; dev * dev / expd }
    }.sum
  }

  /** Drive a streaming (source, text) source through the monitor. */
  def start(newDocs: DataFrame, dim: Int, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    vectors(hashedTokens(newDocs, dim), dim).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id) }
      .start()
}
