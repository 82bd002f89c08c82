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

  test("Delta-backed incremental SCD: atomic commits + time-travelable " +
    "sync points") {
    import spark.implicits._
    import graft.sources.DeltaLog
    val srcDir = Files.createTempDirectory("graft_scd_dsrc").toString
    val tbl = Files.createTempDirectory("graft_scd_dtbl").resolve("t").toString
    val clock = (id: Long) => Timestamp.valueOf(f"2024-01-${id + 1}%02d 00:00:00")

    Seq((1, "open"), (2, "open")).toDF("mission_id", "status")
      .coalesce(1).write.mode("append").parquet(srcDir)
    IncrementalScd.startDelta(
      spark.readStream.schema(schema).parquet(srcDir),
      tbl, Seq("mission_id"), clock).awaitTermination(60000)
    val v0 = DeltaLog.latestVersion(spark, tbl)

    Seq((1, "closed"), (3, "open")).toDF("mission_id", "status")
      .coalesce(1).write.mode("append").parquet(srcDir)
    IncrementalScd.startDelta(
      spark.readStream.schema(schema).parquet(srcDir),
      tbl, Seq("mission_id"), clock).awaitTermination(60000)

    val cur = DeltaLog.read(spark, tbl).cache()
    // key 1: closed old + new current; key 2 unchanged; key 3 new
    assert(cur.count() == 4)
    assert(cur.filter(col("is_current")).count() == 3)
    assert(cur.filter(col("mission_id") === 1 && col("is_current"))
      .head.getAs[String]("status") == "closed")
    // the first sync point is still readable as of its commit version
    val asOf = DeltaLog.read(spark, tbl, Some(v0))
    assert(asOf.count() == 2)
    assert(asOf.filter(col("is_current")).count() == 2)
    assert(asOf.filter(col("mission_id") === 1)
      .head.getAs[String]("status") == "open")
  }
}
