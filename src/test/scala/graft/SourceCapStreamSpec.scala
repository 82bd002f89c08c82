package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SourceCapStream

/** The streaming per-source cap (17th member) must converge, across
  * however many micro-batches the documents arrive in and in WHATEVER
  * order (top-K by a total order is a semilattice merge), to EXACTLY
  * the batch q110 rows over the arrived corpus. The spec feeds doc_id
  * ranges OUT of order — the middle range last — so an
  * arrival-order-dependent implementation cannot pass, and pins that
  * early emissions are genuinely displaced by later, smaller md5 keys
  * (state merges rather than appends). */
class SourceCapStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sourcecap-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro-batched cap over out-of-order ranges converges to batch " +
    "q110; later batches displace earlier keeps through the state merge") {
    val docs = Tables.load(spark, sf, "documents").select("source", "doc_id")
    val want = SparkEntry.queries("q110_source_cap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(want.nonEmpty)

    // three doc_id ranges delivered OUT of order (low, high, middle):
    // one file per micro-batch
    val n = docs.agg(max("doc_id")).head.getLong(0)
    val ranges = Seq((0L, n / 3), (2 * n / 3 + 1, n), (n / 3 + 1, 2 * n / 3))
    val dir = Files.createTempDirectory("graft_sourcecap_stream")
    ranges.zipWithIndex.foreach { case ((lo, hi), p) =>
      val part = dir.resolve(s"part$p")
      docs.filter(col("doc_id").between(lo, hi))
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      Files.move(
        Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst.get,
        dir.resolve(s"b$p.parquet"))
    }
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

    // latest emission per source wins (Update mode re-emits a touched
    // source's whole kept set)
    val latest = new java.util.concurrent.ConcurrentHashMap[
      String, Seq[(String, Long, Long)]]()
    val firstBatchKeeps = new java.util.concurrent.ConcurrentHashMap[
      String, Set[Long]]()
    var batches = 0
    val ck = Files.createTempDirectory("graft_sourcecap_ck").toString
    val q = SourceCapStream.start(stream, 10, ck, (b, id) => {
      batches += 1
      val rows = b.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
      rows.groupBy(_._1).foreach { case (src, xs) =>
        latest.put(src, xs.toSeq.sortBy(_._3))
        if (id == 0) firstBatchKeeps.put(src, xs.map(_._2).toSet)
      }
    })
    q.awaitTermination()
    assert(batches >= 3, s"expected one trigger per file, saw $batches")

    import scala.jdk.CollectionConverters._
    val got = latest.asScala.values.flatten.toSeq.sorted
    assert(got == want, "converged stream state diverged from batch q110")
    // displacement witness: at least one source's FINAL kept set must
    // drop a doc it kept after batch 0 (a later range supplied a
    // smaller md5 key) — with 20 sources and 10 keeps over thirds of
    // the corpus this is overwhelmingly certain; if state appended
    // instead of merging, the rollup equality above would also fail
    val displaced = firstBatchKeeps.asScala.exists { case (src, keeps) =>
      val fin = latest.asScala(src).map(_._2).toSet
      (keeps -- fin).nonEmpty
    }
    assert(displaced, "no early keep was ever displaced — merge untested")
  }
}
