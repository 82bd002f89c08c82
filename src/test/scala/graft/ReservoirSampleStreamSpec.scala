package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ReservoirSampleStream
import graft.streaming.ReservoirSampleStream.{Doc, Sampled}

/** The streaming bottom-k sampler must produce, after ANY micro-batch
  * split of the feed, EXACTLY the batch twin's sample — order
  * invariance is the construction's whole point (a priority is a pure
  * function of the id, so batch boundaries cannot matter). Plus the
  * scale contracts: per-group state never exceeds n rows, and
  * duplicate ids never inflate the sample. */
class ReservoirSampleStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-reservoir-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def runStream(parts: Seq[Seq[(Long, String)]], n: Int)
      : (Seq[(String, Long, String)], Long) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_reservoir_stream")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    // schema seed file so readStream can infer before the first move
    parts.head.take(1).toDF("doc_id", "payload")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("seed").toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir.resolve("seed").toString).schema)
      .parquet(src.toString)
      .as[Doc]
    val q = ReservoirSampleStream.sample(stream, n)
      .writeStream.format("memory").queryName("res_sample")
      .outputMode("update").start()
    try {
      parts.zipWithIndex.foreach { case (rows, i) =>
        val tmp = dir.resolve(s"stage$i")
        rows.toDF("doc_id", "payload")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        Files.list(tmp).filter(_.toString.endsWith(".parquet"))
          .forEach(f => Files.move(f, src.resolve(s"b$i.parquet")))
        q.processAllAvailable()
      }
      // the live sample = bottom-n over each group's FINAL reservoir.
      // The memory sink accumulates every update-mode emission; the
      // final reservoir is recoverable as the bottom-n of all rows the
      // group ever emitted, because each emission is the bottom-n of
      // everything seen so far (priorities only improve) — the final
      // emission's rows are therefore the n smallest emitted too.
      val perGroupFinal = spark.table("res_sample").as[Sampled]
        .groupByKey(_.salt).flatMapGroups { (_, it) =>
          it.toSeq.groupBy(_.doc_id).map(_._2.head).toSeq
            .sortBy(r => (r.priority, r.doc_id)).take(n).iterator
        }
      val merged = ReservoirSampleStream.merged(
        perGroupFinal.toDF(), n)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSeq
      // the REAL state metrics: one state row per salt group (the
      // operator's numRowsTotal), and every group's final reservoir
      // capped at n — membership may churn across batches (evicted ids
      // leave the reservoir), so counting distinct ids across ALL
      // emissions would overcount by design
      val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
      val maxGroup = perGroupFinal.groupByKey(_.salt)
        .count().collect().map(_._2).max
      (merged, math.max(stateRows, maxGroup))
    } finally q.stop()
  }

  test("3-way micro-batched sample == the batch twin, row for row " +
    "(order invariance); duplicate re-delivery cannot inflate it") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text").as("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val n = 25
    val want = ReservoirSampleStream.batchSample(
      docs.toDF("doc_id", "payload"), n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(want.length == n)
    // batches split by residue — and batch 2 RE-DELIVERS batch 0
    // (at-least-once semantics): same priorities, so no inflation
    val parts = Seq(
      docs.filter(_._1 % 3 == 0),
      docs.filter(_._1 % 3 == 1),
      docs.filter(_._1 % 3 == 2) ++ docs.filter(_._1 % 3 == 0))
    val (got, stateBound) = runStream(parts, n)
    assert(got == want, s"stream sample diverged from the batch twin")
    // scale contract: state rows = one per salt group (<= Salts) and
    // every group's final reservoir holds <= n entries
    assert(stateBound <= math.max(ReservoirSampleStream.Salts, n),
      s"state outgrew the Salts x n bound: $stateBound")
  }

  test("priority/salt helpers match the SQL md5 exactly (the q176 " +
    "oracle's cross-engine contract)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 42L, 999999L, Long.MaxValue)
    val sql = ids.toDF("doc_id")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      assert(ReservoirSampleStream.priority(id) == sql(id))
      assert(ReservoirSampleStream.salt(id) ==
        Integer.parseInt(sql(id).substring(0, 2), 16) %
          ReservoirSampleStream.Salts)
    }
  }
}
