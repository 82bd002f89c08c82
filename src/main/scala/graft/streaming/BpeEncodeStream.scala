package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming BPE encoding against a STATIC merge table — the
  * unbounded-feed twin of q185 and the third stateless member of the
  * streaming family (with [[DecontaminationStream]] and
  * [[SurpriseScoreStream]]): TRAIN runs once batch-side
  * ([[graft.operators.TextAnalysis.bpeMerges]] — K argmax rounds, each
  * collecting ONE row), the model embeds in the plan as K-bounded
  * string literals (a replace chain — the model-as-literal pattern),
  * and APPLY is a map-only pass: no state store, no watermark, no
  * shuffle; every micro-batch encodes at O(1) executor memory and the
  * plan carries zero stateful operators (the spec asserts this).
  *
  * This is how a tokenizer deploys in production: the merge table is
  * versioned batch output; the encoder is a pure function of
  * (document, merges). The per-row HOF stack (transform + aggregate
  * over the word array, K replaces per word) is LINEAR in the document
  * — the O(n²)-loop HOF ban does not apply (the q177 stance) — and the
  * expression tree is fixed at plan time, so it is identical across
  * micro-batches. */
object BpeEncodeStream {

  /** q185's tokenization, shared verbatim. */
  private def words(c: Column): Column =
    regexp_extract_all(lower(c), lit("\\p{L}+"), lit(0))

  /** (doc_id, text, …) rows — streaming OR batch (twin equality leans
    * on the same select working on both) → (doc_id, n_words,
    * n_bpe_tokens): the word count and the total BPE symbol count
    * after applying `merges` in learned order. Docs with no tokens
    * score (0, 0). */
  def encoded(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    def symCount(w: Column): Column =
      size(graft.operators.TextAnalysis.bpeSyms(
        graft.operators.TextAnalysis.bpeSeg(w, merges))).cast("long")
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        aggregate(transform(col("ws"), w => symCount(w)),
          lit(0L), (acc, x) => acc + x).as("n_bpe_tokens"))
  }
}
