package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SourceDriftStream

/** The streaming drift monitor (19th member) must converge, across
  * micro-batches delivered OUT of order, to the hashed per-source
  * count vectors a batch build produces over the same tokens (bucket
  * addition commutes), and the chi²-against-pooled statistic computed
  * from the emitted panel must match a direct batch computation on the
  * same grid. */
class SourceDriftStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private val Dim = 256

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sourcedrift-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batched vectors over out-of-order ranges converge to the " +
    "batch hashed grid; panel chi2 matches the batch statistic") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    val n = docs.agg(max("doc_id")).head.getLong(0)
    val ranges = Seq((0L, n / 3), (2 * n / 3 + 1, n), (n / 3 + 1, 2 * n / 3))
    val dir = Files.createTempDirectory("graft_sourcedrift_stream")
    ranges.zipWithIndex.foreach { case ((lo, hi), p) =>
      val part = dir.resolve(s"part$p")
      docs.filter(col("doc_id").between(lo, hi)).select("source", "text")
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      Files.move(
        Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"b$p.parquet"))
    }
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

    val latest = new java.util.concurrent.ConcurrentHashMap[
      String, (Long, Seq[Long])]()
    var batches = 0
    val ck = Files.createTempDirectory("graft_sourcedrift_ck").toString
    val q = SourceDriftStream.start(stream, Dim, ck, (b, _) => {
      batches += 1
      b.collect().foreach { r =>
        latest.put(r.getString(0), (r.getLong(1), r.getSeq[Long](2)))
      }
    })
    q.awaitTermination()
    assert(batches >= 3, s"expected one trigger per file, saw $batches")

    // batch twin on the same grid
    val batchGrid = SourceDriftStream.hashedTokens(
        docs.select("source", "text"), Dim)
      .groupBy("source", "idx").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (src, xs) =>
        val v = Array.fill(Dim)(0L)
        xs.foreach { case (_, i, c) => v(i) = c }
        src -> v.toSeq
      }

    import scala.jdk.CollectionConverters._
    assert(latest.asScala.keySet == batchGrid.keySet)
    batchGrid.foreach { case (src, want) =>
      val (tot, got) = latest.asScala(src)
      assert(got == want, s"source $src vector diverged")
      assert(tot == want.sum)
    }
    // chi2 from the emitted panel equals the batch-grid statistic
    val panelS = latest.asScala.map { case (k, v) => k -> v._2 }.toMap
    batchGrid.keys.foreach { src =>
      val a = SourceDriftStream.chi2(panelS, src)
      val b = SourceDriftStream.chi2(batchGrid, src)
      assert(a == b, s"chi2($src): $a != $b")
    }
    // the statistic does real work: sources differ from the pool
    assert(batchGrid.keys.exists(src =>
      SourceDriftStream.chi2(batchGrid, src) > 0.0))
  }
}
