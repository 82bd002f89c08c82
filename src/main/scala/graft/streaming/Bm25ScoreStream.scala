package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming BM25 scoring against STATIC corpus statistics — the
  * unbounded-feed twin of q126's retrieval scorer and the 15th
  * streaming member, following the model-serving shape of
  * [[BigramPerplexityStream]]/[[SurpriseScoreStream]]: the stats
  * (n_docs, sum_dl, per-term df — one row) come from a batch session
  * over the INDEXED corpus, fold into the plan as double literals
  * ([[TextAnalysis.bm25InRowScore]], r14's in-row scorer), and APPLY is
  * a map-only pass — per-document regexp_count term frequencies, no
  * tokenize-explode, no posting state, no shuffle. Every micro-batch
  * scores at O(1) executor memory beyond the row and the plan carries
  * zero stateful operators (the spec asserts this).
  *
  * This is how a retrieval pipeline actually serves lexical scores: idf
  * and avgdl are versioned statistics of the indexed corpus (refreshed
  * by reindexing, not per query), and a LIVE document stream is scored
  * against them for routing/filtering. A doc matching no query term
  * scores 0.0 — a stream filters instead of erroring (the batch q126
  * drops unmatched docs before its top-k; the spec reconciles the two
  * conventions explicitly).
  */
object Bm25ScoreStream {

  /** Corpus statistics from the batch side — the SAME aggregate q126
    * collects (one bounded row). */
  def stats(docs: DataFrame): TextAnalysis.Bm25Stats =
    TextAnalysis.bm25StatsOf(
      TextAnalysis.bm25StatsAgg(docs, TextAnalysis.QueryTerms)
        .collect().head, TextAnalysis.QueryTerms.size)

  /** (doc_id, text, …) rows — streaming OR batch (the same select works
    * on both; twin equality leans on it) → (doc_id, matched, score).
    * Unmatched docs carry matched=false, score=0.0. */
  def scored(docs: DataFrame, st: TextAnalysis.Bm25Stats): DataFrame = {
    val lowered = lower(col("text"))
    val s =
      if (st.nDocs == 0L) lit(null).cast("double")
      else TextAnalysis.bm25InRowScore(lowered, TextAnalysis.QueryTerms, st)
    docs.select(col("doc_id"), s.as("s0"))
      .select(col("doc_id"), col("s0").isNotNull.as("matched"),
        coalesce(col("s0"), lit(0.0)).as("score"))
  }
}
