package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming unigram-surprise quality scoring against a STATIC model —
  * the unbounded-feed twin of q179 and, with [[DecontaminationStream]],
  * the second stateless member of the streaming family: TRAIN runs once
  * batch-side (the vocabulary aggregate, Heap's-law bounded), the model
  * embeds in the plan as a binary literal
  * ([[graft.functions.VocabSurprise]]), and APPLY is a map-only pass —
  * no state store, no watermark, no shuffle; every micro-batch scores
  * at O(1) executor memory and the plan carries zero stateful
  * operators (the spec asserts this).
  *
  * This is exactly how a quality filter deploys in production: the
  * model is versioned batch output; the scorer is a pure function of
  * (document, model). Out-of-vocabulary words — impossible in q179's
  * self-trained batch, routine on a live feed — score the count-1
  * maximum, so unseen text reads as maximally surprising rather than
  * erroring (documented in the expression).
  */
object SurpriseScoreStream {

  /** q179's tokenization, shared verbatim. */
  private def words(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("\\p{L}+"), lit(0))

  /** Model bytes from the corpus a batch session trained on: the
    * (word, count) vocabulary aggregate — vocab-bounded collect, the
    * q155/q179 stance — plus the total token count. */
  def modelBytes(docs: DataFrame): Array[Byte] = {
    val vocab = docs
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.VocabSurprise.serialize(vocab, vocab.map(_._2).sum)
  }

  /** (doc_id, text, …) rows — streaming OR batch (the same select works
    * on both; twin equality leans on it) → (doc_id, n_tok, surprise,
    * mean_surprise). Docs with no tokens score (0, 0, 0.0). */
  def scored(docs: DataFrame, model: Array[Byte]): DataFrame = {
    graft.functions.VocabSurprise.register(docs.sparkSession)
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tok"),
        graft.functions.VocabSurprise
          .vocabSurprise(col("ws"), lit(model)).as("surprise"))
      .select(col("doc_id"), col("n_tok"), col("surprise"),
        when(col("n_tok") === 0L, lit(0.0))
          .otherwise(col("surprise").cast("double") /
            col("n_tok").cast("double")).as("mean_surprise"))
  }
}
