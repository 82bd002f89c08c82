package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BpeEncodeStream

/** The streaming BPE encoder must reproduce the batch encode exactly
  * across micro-batches, stay stateless, and apply merges with
  * Sennrich's greedy leftmost-non-overlapping semantics. */
class BpeEncodeStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("greedy leftmost apply: hand-computed segmentations") {
    import spark.implicits._
    // "aaa" with (a,a): leftmost pair merges, the overlap does NOT —
    // [aa, a]; "bb" untouched by (a,a) — [b, b]
    val got = BpeEncodeStream.encoded(
      Seq((1L, "aaa bb"), (2L, "")).toDF("doc_id", "text"),
      Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == ((2L, 4L)), "aaa→[aa,a]=2, bb→[b,b]=2")
    assert(got(2L) == ((0L, 0L)))
    // merge ORDER matters: (l,o) then (lo,w) builds "low" in two steps
    val got2 = BpeEncodeStream.encoded(
      Seq((1L, "low lower")).toDF("doc_id", "text"),
      Seq(("l", "o"), ("lo", "w")))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // low → [low] (1); lower → [low, e, r] (3)
    assert(got2 == ((2L, 4L)))
  }

  test("streaming encode across micro-batches equals the batch encode " +
    "with the q184-trained merges; zero stateful operators") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val merges = graft.operators.TextAnalysis
      .bpeMerges(spark, sf, graft.operators.TextAnalysis.BpeMergeRounds)
      .map(m => (m._1, m._2))
    SessionCaches.release(spark)
    assert(merges.length == graft.operators.TextAnalysis.BpeMergeRounds,
      "the synthetic corpus must sustain all merge rounds")

    val want = BpeEncodeStream.encoded(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    val dir = Files.createTempDirectory("graft_bpe_stream")
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
    val q = BpeEncodeStream.encoded(stream, merges)
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_out").start()
    q.processAllAvailable() // legal: stateless, no timeout re-triggers
    val streamed = spark.table("bpe_out")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val stateOps = q.recentProgress.map(_.stateOperators.length).sum
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert(stateOps == 0,
      s"BPE encoding must be stateless, saw $stateOps state operators")
    assert(streamed == want, "streaming encode diverges from batch")
  }
}
