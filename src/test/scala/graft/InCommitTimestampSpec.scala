package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaLog, DeltaMaintenance, DeltaWrite}

/** In-commit timestamps (writer feature `inCommitTimestamp`): commitInfo
  * carries a strictly monotonic timestamp that TIMESTAMP AS OF trusts
  * over log-file mtimes — the protocol's fix for time travel surviving
  * log copies/migrations whose mtimes lie. */
class InCommitTimestampSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ict-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-ict").resolve("t").toString

  private def commitJson(t: String, v: Long): String =
    Files.readString(Paths.get(s"$t/_delta_log/" + f"$v%020d.json"))

  private def ictOf(t: String, v: Long): Option[Long] = {
    val line = commitJson(t, v).linesIterator
      .find(_.contains("commitInfo")).get
    "\"inCommitTimestamp\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(line).map(_.group(1).toLong)
  }

  test("enablement commit stamps ict, upgrades protocol, pins anchors") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    assert(ictOf(t, 0).isEmpty, "pre-enablement commit must not carry ict")

    val v = DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true"))
    assert(v == 1L)
    val raw = commitJson(t, 1)
    assert(raw.contains("\"minWriterVersion\":7"))
    assert(raw.contains("inCommitTimestamp"),
      "enablement commit must carry the first ict and the writer feature")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol.writerFeatures.contains("inCommitTimestamp"))
    assert(snap.configuration("delta.inCommitTimestampEnablementVersion") == "1")
    assert(snap.configuration("delta.inCommitTimestampEnablementTimestamp")
      == ictOf(t, 1).get.toString,
      "the enablement-timestamp property must equal the enablement ict")
  }

  test("subsequent commits inherit strictly increasing icts") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, mode = SaveMode.Append)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, mode = SaveMode.Append)
    val icts = (1L to 3L).map(v => ictOf(t, v).get)
    assert(icts == icts.sorted && icts.distinct == icts,
      s"icts must be strictly increasing, got $icts")
    // DESCRIBE HISTORY reports the same time axis TIMESTAMP AS OF uses.
    val hist = DeltaMaintenance.history(spark, t)
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert((1L to 3L).forall(v => hist(v) == ictOf(t, v).get),
      "history timestamps must equal the in-commit timestamps")
  }

  test("TIMESTAMP AS OF trusts ict over log-file mtimes") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, mode = SaveMode.Append) // v2
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, mode = SaveMode.Append) // v3

    // Corrupt every log mtime to one far-past instant: an mtime-based
    // resolution now calls EVERY version "old" and returns the latest.
    Files.list(Paths.get(s"$t/_delta_log")).forEach(p =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(1000L)))

    val at = new java.sql.Timestamp(ictOf(t, 2).get)
    assert(DeltaLog.versionAt(spark, t, at) == 2L,
      "ict must resolve the travel target when mtimes lie")
    val rows = DeltaLog.read(spark, t, timestampAsOf = Some(at))
    assert(rows.count() == 2L, "v2 snapshot has exactly rows 1 and 2")
  }

  test("checkpoint + log cleanup keep the feature record and ict monotonicity") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, mode = SaveMode.Append)
    val lastIct = ictOf(t, 2).get
    DeltaWrite.checkpoint(spark, t)
    DeltaMaintenance.cleanupLog(spark, t)
    // the checkpoint now carries the protocol FEATURE LISTS
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol.writerFeatures.contains("inCommitTimestamp"),
      "cleaned log must not forget the feature record")
    // and the first post-cleanup commit re-seeds monotonic stamping from
    // the enablement anchor (its predecessor commit JSON is gone)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, mode = SaveMode.Append)
    val v3 = DeltaLog.snapshot(spark, t).version
    assert(ictOf(t, v3).exists(_ > 0),
      "post-cleanup commit must still stamp an ict")
    assert(DeltaLog.read(spark, t).count() == 3L)
    assert(ictOf(t, v3).get >= lastIct,
      "post-cleanup ict must not regress behind the enablement anchor")
  }

  test("non-ict tables keep mtime-based travel and clean commitInfo") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, mode = SaveMode.Append)
    assert(ictOf(t, 0).isEmpty && ictOf(t, 1).isEmpty)
    val mtime = Files.getLastModifiedTime(
      Paths.get(s"$t/_delta_log/" + f"${1L}%020d.json")).toMillis
    assert(DeltaLog.versionAt(spark, t,
      new java.sql.Timestamp(mtime)) == 1L)
  }
}
