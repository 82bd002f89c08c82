package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.NearDupStream

/** The streaming LSH candidate detector must find exactly the batch
  * q46 candidate set on the same corpus, including pairs whose two
  * documents arrive in DIFFERENT micro-batches (the state-store path).
  *
  * ProcessingTimeTimeout re-triggers batches every interval forever, so
  * the spec polls the memory sink for convergence instead of
  * `processAllAvailable` (which would never return — see the operator's
  * trigger note). */
class NearDupStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-neardup-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming LSH candidates across micro-batches equal the batch set") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val want = Dedup.lshCandidates(Dedup.signatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "batch candidate set must be non-trivial")

    // Two files, split by doc_id parity, delivered one per micro-batch —
    // near-dup pairs almost never share parity, so most pairs exercise
    // the cross-batch state path.
    val dir = Files.createTempDirectory("graft_docs_stream")
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
    val q = NearDupStream.candidatePairs(stream).toDF()
      .writeStream.outputMode("update")
      .trigger(Trigger.ProcessingTime(250L))
      .format("memory").queryName("nd_out").start()

    // At-least-once per band → consumer-side distinct; poll to converge.
    def got(): Set[(Long, Long)] = spark.table("nd_out").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deadline = System.currentTimeMillis + 120000
    var g = got()
    while (g != want && System.currentTimeMillis < deadline) {
      Thread.sleep(500); g = got()
    }
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches >= 2,
      "expected the two files to arrive in separate micro-batches")
    assert((g -- want).isEmpty, s"streaming emitted non-batch pairs: ${g -- want}")
    assert((want -- g).isEmpty, s"streaming missed batch pairs: ${want -- g}")
    // The cross-batch path really ran: some pair spans the parity split.
    assert(g.exists { case (a, b) => (a + b) % 2 == 1 },
      "no candidate pair spans the two micro-batches")
  }
}
