package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BigramPerplexityStream

/** The streaming bigram-perplexity scorer must reproduce q195's
  * window-based arithmetic exactly on the training corpus, stay
  * stateless, and smooth unseen words/transitions as documented. */
class BigramPerplexityStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bigram-lm-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming scores across micro-batches equal the batch operator, " +
    "which equals q195's window-based arithmetic; zero stateful operators") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val model = BigramPerplexityStream.modelBytes(docs)

    // independent truth: q195's lag-window arithmetic (no top-20 cut),
    // same capped classification and add-1 smoothing
    val (topV, rows) = graft.operators.TextAnalysis.bigramLmModel(docs)
    val cuv = rows.map { case (u, v, c) => (u, v) -> c }.toMap
    val cu = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._3).sum }
    def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val v1 = graft.operators.TextAnalysis.SurpriseVocabCap + 1
    val tok = docs.select(col("doc_id"),
      posexplode(regexp_extract_all(lower(col("text")),
        lit("\\p{L}+"), lit(0))).as(Seq("pos", "w")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val want = tok
      .select(col("doc_id"), col("pos"),
        when(col("w").isin(topV: _*), col("w")).otherwise(lit("#unk"))
          .as("v"))
      .withColumn("u", lag("v", 1).over(win))
      .filter(col("u").isNotNull)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, prs) =>
        val bits = prs.map { r =>
          // select order is (doc_id, pos, v) then withColumn(u)
          val (v, u) = (r.getString(2), r.getString(3))
          flog2(cu(u) + v1) - flog2(cuv.getOrElse((u, v), 0L) + 1L)
        }.sum
        id -> (prs.length.toLong, bits)
      }

    // the vocab cap must BIND or the '#unk' path is dead code
    assert(tok.select("w").distinct().count() >
      graft.operators.TextAnalysis.SurpriseVocabCap)

    // the operator itself, batch-applied (same select as the stream);
    // docs with < 2 tokens score (0, 0) and are absent from `want`
    val got = BigramPerplexityStream.scored(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .filter(_._2._1 > 0).toMap
    assert(got == want, "batch operator diverges from the window arithmetic")

    // stream the same corpus in two micro-batches
    val dir = Files.createTempDirectory("graft_bigram_lm_stream")
    Seq(0, 1).foreach { p =>
      val part = dir.resolve(s"part$p")
      docs.filter(pmod(col("doc_id"), lit(2)) === p)
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      Files.move(
        Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"b$p.parquet"))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = BigramPerplexityStream.scored(stream, model)
      .writeStream.outputMode("append")
      .format("memory").queryName("bigram_lm_out").start()
    q.processAllAvailable() // legal: stateless, no timeout re-triggers
    val streamed = spark.table("bigram_lm_out")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .filter(_._2._1 > 0).toMap
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val stateOps = q.recentProgress.map(_.stateOperators.length).sum
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert(stateOps == 0,
      s"bigram scoring must be stateless, saw $stateOps state operators")
    assert(streamed == want, "streaming scores diverge from batch")
  }

  test("unseen words fold to #unk, unseen transitions take the smoothing " +
    "floor, short docs score 0") {
    import spark.implicits._
    // train: 'alpha beta' x2 and 'beta alpha' — vocab {alpha, beta}
    // (cap 16 leaves both in), transitions alpha→beta 2, beta→alpha 1
    val train = Seq((1L, "alpha beta alpha beta"), (2L, "beta alpha"))
      .toDF("doc_id", "text")
    val model = BigramPerplexityStream.modelBytes(train)
    def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val v1 = graft.operators.TextAnalysis.SurpriseVocabCap + 1
    // cu: alpha context count = 2 (alpha→beta ×2), beta = 2
    // (beta→alpha ×1, beta→alpha across doc1's middle... recompute:
    // doc1 pairs: (a,b),(b,a),(a,b); doc2: (b,a) → cuv: a→b 2, b→a 2
    val scored = BigramPerplexityStream.scored(
      Seq((9L, "alpha beta"), // seen transition: bits = flog2(2+v1)-flog2(2+1)
        (10L, "beta beta"), // unseen transition: flog2(2+v1)-flog2(0+1)
        (11L, "zzz alpha"), // unseen word → #unk context, cu=0 path
        (12L, "alpha"), (13L, "")).toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val seen = flog2(2 + v1) - flog2(3)
    val unseenT = flog2(2 + v1) - flog2(1)
    val unkCtx = flog2(0 + v1) - flog2(1)
    assert(scored(9L) == ((1L, seen, seen.toDouble)))
    assert(scored(10L) == ((1L, unseenT, unseenT.toDouble)))
    assert(scored(11L) == ((1L, unkCtx, unkCtx.toDouble)))
    assert(scored(12L) == ((0L, 0L, 0.0)))
    assert(scored(13L) == ((0L, 0L, 0.0)))
  }
}
