package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.QualityScoreStream

/** The streaming quality classifier must reproduce q189's scoring
  * exactly (verified against an INDEPENDENT join-based recomputation —
  * md5()/conv() columns + a weight join instead of the compiled
  * expression), stay stateless across micro-batches, and train through
  * the same cached q188 path. */
class QualityScoreStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quality-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming scores across micro-batches equal the batch operator, " +
    "which equals an independent join-based scoring; zero stateful ops") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val w = QualityScoreStream.modelWeights(docs)
    assert(w.length == graft.functions.HashedBow.Dims)
    assert(w.exists(_ != 0L), "trained model is all-zero")

    // independent truth: tokenize with columns, bucket via md5+conv,
    // clip, join the weight table, dot by SUM — no HashedBow code
    import spark.implicits._
    val wDf = w.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("i", "wv")
    val t = coalesce(lower(col("text")), lit(""))
    val feat = docs.select(col("doc_id"),
        explode(regexp_extract_all(t, lit("\\p{L}+"), lit(0))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("long") % 64
          + 1).as("i"))
      .groupBy("doc_id", "i")
      .agg(least(count(lit(1)), lit(graft.functions.HashedBow.CountCap))
        .as("x"))
    val bias = docs.select(col("doc_id"), lit(0L).as("i"), lit(1L).as("x"))
    val want = bias.union(feat)
      .join(wDf, "i")
      .groupBy("doc_id")
      .agg(sum(col("x") * col("wv")).cast("long").as("score_grid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = QualityScoreStream.scored(docs, w)
    val got = batch.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "batch operator diverges from the join scoring")

    // pred/label/correct are internally consistent and label matches
    // the integer rule recomputed with columns
    val ruleCheck = QualityScoreStream.scored(docs, w)
      .join(docs.select(col("doc_id"),
        regexp_count(t, lit("\\p{L}+")).cast("long").as("nt"),
        regexp_count(t, lit(graft.operators.TextAnalysis.StopRe))
          .cast("long").as("ns")), "doc_id")
      .filter(
        (col("label") =!= when(col("nt") > 0 &&
          col("ns") * 16 >= col("nt"), 1L).otherwise(0L)) ||
        (col("pred") =!= (col("score_grid") >= 524288L).cast("long")) ||
        (col("correct") =!= (col("pred") === col("label")).cast("long")))
      .count()
    assert(ruleCheck == 0L)

    // stream the same corpus in two micro-batches
    val dir = Files.createTempDirectory("graft_quality_stream")
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
    val q = QualityScoreStream.scored(stream, w)
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_out").start()
    q.processAllAvailable() // legal: stateless, no timeout re-triggers
    val streamed = spark.table("quality_out")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val stateOps = q.recentProgress.map(_.stateOperators.length).sum
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert(stateOps == 0,
      s"quality scoring must be stateless, saw $stateOps state operators")
    val batchFull = batch.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed == batchFull, "streaming scores diverge from batch")
  }

  test("zero model predicts all-0 (score 0 < the 2^19 threshold); " +
    "null text scores as empty") {
    import spark.implicits._
    val rows = QualityScoreStream.scored(
      Seq((1L, Some("the the the")), (2L, None: Option[String]))
        .toDF("doc_id", "text"),
      Seq.fill(graft.functions.HashedBow.Dims)(0L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L)._1 == 0L && rows(1L)._2 == 0L) // score 0, pred 0
    assert(rows(1L)._3 == 1L) // "the the the": 3 stop / 3 tok → label 1
    assert(rows(2L) == ((0L, 0L, 0L))) // null text → '' → all zero
  }
}
