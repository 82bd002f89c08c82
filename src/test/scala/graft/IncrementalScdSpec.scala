package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalScd

/** The streaming SCD sync must reach the same state as batch syncs of the
  * same snapshots, with one version per micro-batch. */
class IncrementalScdSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incscd-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("mission_id", IntegerType),
    StructField("status", StringType)))

  test("incremental SCD over arriving files matches batch semantics") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_scd_src").toString
    val tgtDir = Files.createTempDirectory("graft_scd_tgt").toString

    // Batch 1 arrives; stream drains it (AvailableNow stops when caught up).
    Seq((1, "open"), (2, "open")).toDF("mission_id", "status")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val clock = (id: Long) => Timestamp.valueOf(f"2024-01-${id + 1}%02d 00:00:00")
    val q1 = IncrementalScd.start(
      spark.readStream.schema(schema).parquet(srcDir),
      tgtDir, Seq("mission_id"), clock)
    q1.awaitTermination(60000)

    val s1 = IncrementalScd.readCurrent(spark, tgtDir).get
    assert(s1.count() == 2 && s1.filter(col("is_current")).count() == 2)

    // Batch 2 arrives with a change + a new key; a fresh AvailableNow run
    // picks up only the new file (checkpoint-free: new stream instance
    // reads everything; idempotent merge makes re-sync of batch1 a no-op).
    Seq((1, "closed"), (2, "open"), (3, "open")).toDF("mission_id", "status")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = IncrementalScd.start(
      spark.readStream.schema(schema).parquet(srcDir),
      tgtDir, Seq("mission_id"), clock)
    q2.awaitTermination(60000)

    val s2 = IncrementalScd.readCurrent(spark, tgtDir).get.cache()
    // key 1 has two versions (closed old + current 'closed'), 2 unchanged,
    // 3 inserted => 4 rows, 3 current.
    assert(s2.count() == 4)
    assert(s2.filter(col("is_current")).count() == 3)
    assert(s2.filter(col("mission_id") === 1 && col("is_current"))
      .head.getAs[String]("status") == "closed")
    // one current row per key — invariant held across streamed merges
    assert(s2.filter(col("is_current")).groupBy("mission_id").count()
      .filter(col("count") =!= 1).count() == 0)
  }
}
