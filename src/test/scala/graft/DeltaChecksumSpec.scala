package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaChecksum, DeltaDml, DeltaDv, DeltaLog, DeltaMaintenance, DeltaWrite}
import org.apache.spark.sql.functions.col

/** Version checksum files (`<version>.crc`): written per commit,
  * verified on replay, trimmed with their commits. */
class DeltaChecksumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-checksum-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-crc").resolve("t").toString

  private def fs(t: String) =
    DeltaLog.logDir(t).getFileSystem(spark.sessionState.newHadoopConf())

  test("every commit writes a crc whose totals match the snapshot; DVs " +
    "are counted when present") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"), t)
    DeltaWrite.write(Seq((4, "d")).toDF("id", "s"), t, SaveMode.Append)
    (0L to 1L).foreach { v =>
      val c = DeltaChecksum.read(spark, t, v)
        .getOrElse(fail(s"no crc for version $v"))
      val snap = DeltaLog.snapshot(spark, t, Some(v))
      assert(c.get("numFiles").asLong() == snap.files.size)
      assert(c.get("tableSizeBytes").asLong() == snap.files.map(_.size).sum)
      assert(c.get("numMetadata").asLong() == 1L)
      assert(c.get("numProtocol").asLong() == 1L)
    }
    // merge-on-read DELETE attaches a DV; its commit's crc records it
    DeltaMaintenance.setTblProperties(spark, t,
      Map(DeltaDv.Property -> "true"))
    DeltaDml.delete(spark, t, col("id") === 1)
    val v2 = DeltaLog.latestVersion(spark, t)
    val c2 = DeltaChecksum.read(spark, t, v2).getOrElse(fail("no DV crc"))
    assert(c2.get("numDeletionVectorsOpt").asLong() == 1L)
  }

  test("tampered crc trips the replay verifier; snapshots of OTHER " +
    "versions stay readable") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, SaveMode.Append)
    val v = DeltaLog.latestVersion(spark, t)
    val p = new Path(DeltaLog.logDir(t), f"$v%020d.crc")
    val out = fs(t).create(p, true)
    out.write("""{"tableSizeBytes":1,"numFiles":999,"numMetadata":1,"numProtocol":1}"""
      .getBytes("UTF-8")); out.close()
    val e = intercept[IllegalStateException](DeltaLog.snapshot(spark, t))
    assert(e.getMessage.contains("checksum mismatch"))
    assert(e.getMessage.contains("numFiles"))
    // time travel to the un-tampered version still works
    assert(DeltaLog.read(spark, t, versionAsOf = Some(v - 1)).count() == 1)
    // and a garbage (unparseable) crc is ignored, not fatal
    val out2 = fs(t).create(p, true)
    out2.write("not json".getBytes("UTF-8")); out2.close()
    assert(DeltaLog.read(spark, t).count() == 2)
  }

  test("spark.graft.delta.writeChecksum=false disables the write; " +
    "re-enabling resumes") {
    val t = tmpTable()
    try {
      spark.conf.set("spark.graft.delta.writeChecksum", "false")
      DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
      assert(DeltaChecksum.read(spark, t, 0L).isEmpty)
    } finally spark.conf.unset("spark.graft.delta.writeChecksum")
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, SaveMode.Append)
    assert(DeltaChecksum.read(spark, t, 1L).nonEmpty)
    // verify tolerates the gap (v0 has no crc to check)
    assert(DeltaLog.read(spark, t, versionAsOf = Some(0L)).count() == 1)
  }

  test("cleanupLog trims crcs behind the checkpoint horizon, keeps the " +
    "horizon's own (its state is still replayable)") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, SaveMode.Append)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, SaveMode.Append)
    val horizon = DeltaLog.latestVersion(spark, t)
    DeltaWrite.checkpoint(spark, t)
    assert(DeltaMaintenance.cleanupLog(spark, t) > 0)
    (0L until horizon).foreach(v =>
      assert(DeltaChecksum.read(spark, t, v).isEmpty, s"crc $v must be gone"))
    assert(DeltaChecksum.read(spark, t, horizon).nonEmpty)
    // the checkpoint-backed snapshot still verifies against it
    assert(DeltaLog.read(spark, t).count() == 3)
    // DML after cleanup keeps the chain going
    DeltaDml.delete(spark, t, col("id") === 2)
    val v = DeltaLog.latestVersion(spark, t)
    assert(DeltaChecksum.read(spark, t, v).nonEmpty)
    assert(DeltaLog.read(spark, t).count() == 2)
  }
}
