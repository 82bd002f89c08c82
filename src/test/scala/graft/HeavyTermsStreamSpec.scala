package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.util.sketch.CountMinSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HeavyTermsStream

/** The streaming Count-Min sketcher (18th member) must converge,
  * across micro-batches delivered OUT of order, to the sketch a batch
  * build produces over the same tokens (counter addition commutes),
  * and q170's one-sided contract must hold against exact truth:
  * estimates never undercount, and stay within eps · N_shard. */
class HeavyTermsStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-heavyterms-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batched sketches over out-of-order ranges converge to " +
    "the batch-built per-shard sketches; q170's no-undercount and eps " +
    "bounds hold against exact counts") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")

    // three doc_id ranges delivered OUT of order (middle last)
    val n = docs.agg(max("doc_id")).head.getLong(0)
    val ranges = Seq((0L, n / 3), (2 * n / 3 + 1, n), (n / 3 + 1, 2 * n / 3))
    val dir = Files.createTempDirectory("graft_heavyterms_stream")
    ranges.zipWithIndex.foreach { case ((lo, hi), p) =>
      val part = dir.resolve(s"part$p")
      docs.filter(col("doc_id").between(lo, hi))
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      Files.move(
        Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"b$p.parquet"))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

    val latest = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, Array[Byte])]()
    var batches = 0
    val ck = Files.createTempDirectory("graft_heavyterms_ck").toString
    val q = HeavyTermsStream.start(stream, 16, ck, (b, _) => {
      batches += 1
      b.collect().foreach { r =>
        latest.put(r.getInt(0), (r.getLong(1), r.getAs[Array[Byte]](2)))
      }
    })
    q.awaitTermination()
    assert(batches >= 3, s"expected one trigger per file, saw $batches")

    // batch twin: same tokenization/sharding, one sketch per shard
    // built with identical (eps, conf, seed) via addString over the
    // SAME (term, count) multiset
    val termCounts = HeavyTermsStream.shardTerms(docs, 16)
      .groupBy("shard", "t").agg(sum("c").as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val batchSketch = termCounts.groupBy(_._1).map { case (shard, xs) =>
      val cms = CountMinSketch.create(0.001, 0.9999, 42)
      xs.foreach { case (_, t, c) => cms.addString(t, c) }
      shard -> cms
    }

    import scala.jdk.CollectionConverters._
    assert(latest.asScala.keySet == batchSketch.keySet)
    // per-shard totals converge exactly (addition commutes)
    batchSketch.foreach { case (shard, cms) =>
      assert(latest.asScala(shard)._1 == cms.totalCount(),
        s"shard $shard total diverged")
    }
    // per-term estimates equal the batch twin's, never undercount, and
    // respect the per-shard eps bound — checked on the global exact
    // top-20 (q170's panel)
    val top = termCounts.sortBy { case (_, t, c) => (-c, t) }.take(20)
    assert(top.nonEmpty)
    top.foreach { case (shard, t, c) =>
      val streamed = HeavyTermsStream.deserialize(latest.asScala(shard)._2)
      val se = streamed.estimateCount(t)
      val be = batchSketch(shard).estimateCount(t)
      assert(se == be, s"'$t': stream $se != batch $be")
      assert(se >= c, s"'$t': undercount $se < $c")
      val slack = math.ceil(0.001 * streamed.totalCount()).toLong
      assert(se <= c + slack, s"'$t': $se above eps bound ${c + slack}")
    }
  }
}
