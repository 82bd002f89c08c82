package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SurpriseScoreStream

/** The streaming surprise scorer must reproduce q179's join-based
  * arithmetic exactly on the training corpus, stay stateless, and score
  * OOV words at the documented count-1 maximum. */
class SurpriseScoreStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-surprise-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming scores across micro-batches equal the batch operator, " +
    "which equals q179's JOIN-based arithmetic; zero stateful operators") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val model = SurpriseScoreStream.modelBytes(docs)

    // independent truth: q179's join-based per-doc computation (no
    // top-20 cut), flog2 via the same bit-length identity — including
    // the r12 top-V cap: below-cap words take the OOV count-1 path
    val tok = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")),
        lit("\\p{L}+"), lit(0))).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum("c").cast("long").as("n"))
    val topV = vocab.orderBy(col("c").desc, col("w"))
      .limit(graft.operators.TextAnalysis.SurpriseVocabCap)
    def flog2(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - 1).cast("long")
    val want = tok.join(topV, Seq("w"), "left").crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (flog2(col("n")) - flog2(coalesce(col("c"), lit(1L)))).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("s").cast("long").as("surprise"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // the cap must BIND here or the OOV arithmetic below is dead code
    assert(vocab.count() > graft.operators.TextAnalysis.SurpriseVocabCap,
      "corpus vocabulary no longer exceeds SurpriseVocabCap — the OOV " +
        "path is untested")

    // the operator itself, batch-applied (same select as the stream)
    val got = SurpriseScoreStream.scored(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "batch operator diverges from the join arithmetic")

    // stream the same corpus in two micro-batches
    val dir = Files.createTempDirectory("graft_surprise_stream")
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
    val q = SurpriseScoreStream.scored(stream, model)
      .writeStream.outputMode("append")
      .format("memory").queryName("surprise_out").start()
    q.processAllAvailable() // legal: stateless, no timeout re-triggers
    val streamed = spark.table("surprise_out")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val stateOps = q.recentProgress.map(_.stateOperators.length).sum
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert(stateOps == 0,
      s"surprise scoring must be stateless, saw $stateOps state operators")
    assert(streamed == want, "streaming scores diverge from batch")
  }

  test("OOV words score the count-1 maximum flog2(N); empty docs score 0") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val model = SurpriseScoreStream.modelBytes(train)
    // N = 5 tokens → flog2(5) = 2; counts: alpha 2 (s=2-1=1),
    // beta 2 (1), gamma 1 (2); unseen word → 2
    val scored = SurpriseScoreStream.scored(
      Seq((9L, "alpha qqunseen"), (10L, "")).toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(scored(9L) == ((2L, 1L + 2L, 1.5)))
    assert(scored(10L) == ((0L, 0L, 0.0)))
  }
}
