package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalDedupStream

/** The streaming incremental-dedup twin must produce, across however
  * many micro-batches the new docs arrive in, EXACTLY the rows the
  * one-shot batch matcher produces for the same (corpus, batch) split —
  * including bit-equal Jaccard doubles. Micro-batch boundaries cannot
  * matter because the index side is static — that invariance is the
  * point of the stream-static shape. */
class IncrementalDedupStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incdedup-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batched matching across 3 batches is bit-equal to the " +
    "one-shot batch matcher") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
    val index = IncrementalDedupStream.buildIndex(corpus)
    index.inverted.persist(); index.card.persist()
    try {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val want = IncrementalDedupStream.matchBatch(index, batch)
        .collect().map(key).sorted.toSeq
      assert(want.nonEmpty, "the fixture must contain cross-slice near-dups")

      // the new docs arrive as 3 files, one per micro-batch
      val dir = Files.createTempDirectory("graft_incdedup_stream")
      (0 until 3).foreach { p =>
        val part = dir.resolve(s"part$p")
        batch.filter(pmod(col("doc_id"), lit(3)) === p)
          .coalesce(1).write.mode("overwrite").parquet(part.toString)
        Files.move(
          Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst.get,
          dir.resolve(s"b$p.parquet"))
      }
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)

      val got = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Double)]()
      val batchIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = IncrementalDedupStream.start(stream, index,
        Files.createTempDirectory("graft_incdedup_ckpt").toString,
        (df, id) => { df.collect().foreach(r => got.add(key(r))); batchIds.add(id) })
      q.awaitTermination()

      import scala.jdk.CollectionConverters._
      assert(batchIds.size >= 3, s"expected >=3 micro-batches, got $batchIds")
      assert(got.asScala.toSeq.sorted == want,
        s"streaming rows diverge from batch: ${got.size} vs ${want.size}")
    } finally { index.inverted.unpersist(); index.card.unpersist(); () }
  }
}
