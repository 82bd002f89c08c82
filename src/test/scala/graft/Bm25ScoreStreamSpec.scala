package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Bm25ScoreStream

/** The streaming BM25 scorer must reproduce q126's scoring exactly on
  * the indexed corpus (its top-20 by (score DESC, doc_id) IS q126's
  * oracled answer), stay stateless across micro-batches, and score
  * unmatched documents 0.0 instead of dropping them. */
class Bm25ScoreStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bm25-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming scores across micro-batches equal the batch operator; " +
    "their top-20 IS q126; zero stateful operators") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val st = Bm25ScoreStream.stats(docs)
    assert(st.nDocs > 0 && st.dfs.exists(_ > 0))

    // truth: the oracled corpus entry itself — the stream's top-20 by
    // (score DESC, doc_id) over matched docs must BE q126's answer
    val want126 = SparkEntry.queries("q126_bm25_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val batch = Bm25ScoreStream.scored(docs, st).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    // unmatched docs are PRESENT with score 0.0 (the stream convention)
    assert(batch.length == docs.count())
    assert(batch.filter(!_._2).forall(_._3 == 0.0))
    val top20 = batch.filter(_._2).map(t => (t._1, t._3))
      .sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    assert(top20 == want126, "batch scorer's top-20 diverges from q126")

    // stream the same corpus in two micro-batches
    val dir = Files.createTempDirectory("graft_bm25_stream")
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
    val q = Bm25ScoreStream.scored(stream, st)
      .writeStream.outputMode("append")
      .format("memory").queryName("bm25_out").start()
    q.processAllAvailable() // legal: stateless, no timeout re-triggers
    val streamed = spark.table("bm25_out").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).sorted
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val stateOps = q.recentProgress.map(_.stateOperators.length).sum
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert(stateOps == 0,
      s"bm25 scoring must be stateless, saw $stateOps state operators")
    assert(streamed.toSeq == batch.sorted.toSeq,
      "streaming scores diverge from batch")
  }

  test("empty index: every doc scores unmatched 0.0 (no division by a " +
    "zero-doc avgdl)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val st = Bm25ScoreStream.stats(empty)
    assert(st.nDocs == 0L)
    val scored = Bm25ScoreStream.scored(
      Seq((1L, "spark join window"), (2L, "nothing")).toDF("doc_id", "text"),
      st).collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    assert(scored.toSeq == Seq((1L, false, 0.0), (2L, false, 0.0)))
  }
}
