package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDml, DeltaDv, DeltaLog, DeltaMaintenance, DeltaWrite, RowTracking}

/** Row-tracking specs (writer feature `rowTracking` + carrier
  * `domainMetadata`): enable-time backfill, fresh-id continuation across
  * appends / DML / OPTIMIZE, verbatim id preservation on RESTORE and
  * merge-on-read DELETE, and high-water-mark survival through classic and
  * V2 checkpoints after log cleanup. */
class RowTrackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rowtracking-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-rowtrack").resolve("t").toString

  /** (business id → fresh row id) map via the readWithRowIds surface. */
  private def idMap(t: String): Map[Int, Long] =
    RowTracking.readWithRowIds(spark, t)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("enable backfills every live file; appends continue above the mark") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2, 3).toDF("id").repartition(2), t)
    DeltaWrite.write(Seq(4, 5).toDF("id"), t, mode = SaveMode.Append)

    val v = RowTracking.enable(spark, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(RowTracking.supported(snap))
    assert(snap.protocol.writerFeatures.contains("domainMetadata"))
    assert(snap.files.forall(_.baseRowId.isDefined), "backfill missed a file")
    // backfill stamps defaultRowCommitVersion with the version that landed
    assert(snap.files.forall(_.defaultRowCommitVersion.contains(v)))
    assert(RowTracking.highWaterMark(snap) == 4L) // 5 rows -> ids 0..4
    val ids0 = idMap(t)
    assert(ids0.values.toSeq.sorted == Seq(0L, 1L, 2L, 3L, 4L))

    DeltaWrite.write(Seq(6, 7).toDF("id"), t, mode = SaveMode.Append)
    val snap1 = DeltaLog.snapshot(spark, t)
    assert(RowTracking.highWaterMark(snap1) == 6L)
    val ids1 = idMap(t)
    assert(ids1.values.toSet.size == 7, "fresh row ids must be unique")
    // prior assignments are untouched by the append
    assert(ids0.forall { case (k, rid) => ids1(k) == rid })
    assert(Seq(6, 7).map(ids1).forall(_ > 4L), "new ids must clear the mark")
  }

  test("OPTIMIZE mints fresh ids above the mark; uniqueness holds") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2).toDF("id"), t)
    RowTracking.enable(spark, t)
    DeltaWrite.write(Seq(3, 4).toDF("id"), t, mode = SaveMode.Append)
    val before = DeltaLog.snapshot(spark, t)
    val hwmBefore = RowTracking.highWaterMark(before)

    val (n, _) = DeltaMaintenance.compact(spark, t)
    assert(n >= 2, "compaction should have run")
    val after = DeltaLog.snapshot(spark, t)
    assert(after.files.forall(_.baseRowId.isDefined))
    // rewritten files are NEW adds: their ids are fresh, above the old mark
    assert(after.files.forall(_.baseRowId.get > hwmBefore))
    assert(RowTracking.highWaterMark(after) > hwmBefore)
    val ids = idMap(t)
    assert(ids.keySet == Set(1, 2, 3, 4))
    assert(ids.values.toSet.size == 4)
  }

  test("RESTORE re-adds keep their recorded ids verbatim") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2, 3).toDF("id"), t)
    RowTracking.enable(spark, t)
    val vBase = DeltaLog.snapshot(spark, t).version
    val idsBase = idMap(t)

    DeltaWrite.write(Seq(4, 5).toDF("id"), t, mode = SaveMode.Append)
    val hwmAfterAppend =
      RowTracking.highWaterMark(DeltaLog.snapshot(spark, t))
    DeltaMaintenance.restore(spark, t, vBase)

    val restored = idMap(t)
    assert(restored == idsBase, "restore must not restamp surviving files")
    // the mark is NOT rolled back: a post-restore append must not re-mint
    // the ids the restored-away rows consumed
    DeltaWrite.write(Seq(6).toDF("id"), t, mode = SaveMode.Append)
    val ids1 = idMap(t)
    assert(ids1(6) > hwmAfterAppend)
  }

  test("merge-on-read DELETE keeps survivors' ids (DV composes with ids)") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write((1 to 10).toDF("id"), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    RowTracking.enable(spark, t)
    val before = idMap(t)

    val r = DeltaDml.delete(spark, t, col("id") % 2 === 0)
    assert(r.affectedRows == 5L)
    val after = idMap(t)
    assert(after.keySet == Set(1, 3, 5, 7, 9))
    assert(after.forall { case (k, rid) => before(k) == rid },
      "surviving rows must keep their fresh row ids through a DV delete")
  }

  test("mark and ids survive a classic checkpoint + log cleanup") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2, 3).toDF("id"), t)
    RowTracking.enable(spark, t)
    val idsBefore = idMap(t)

    DeltaWrite.checkpoint(spark, t)
    DeltaMaintenance.cleanupLog(spark, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(RowTracking.highWaterMark(snap) == 2L,
      "the domain must ride in the checkpoint")
    assert(idMap(t) == idsBefore)
    DeltaWrite.write(Seq(4).toDF("id"), t, mode = SaveMode.Append)
    assert(idMap(t)(4) == 3L, "post-bootstrap append continues the sequence")
  }

  test("mark and ids survive a V2 checkpoint + log cleanup") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2, 3).toDF("id"), t)
    RowTracking.enable(spark, t)
    val idsBefore = idMap(t)

    DeltaWrite.checkpointV2(spark, t, sidecars = 2)
    DeltaMaintenance.cleanupLog(spark, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(RowTracking.highWaterMark(snap) == 2L,
      "the domain must ride in the V2 manifest")
    assert(snap.files.forall(_.baseRowId.isDefined),
      "baseRowId must round-trip through sidecars")
    assert(idMap(t) == idsBefore)
    DeltaWrite.write(Seq(4).toDF("id"), t, mode = SaveMode.Append)
    assert(idMap(t)(4) == 3L)
  }

  test("user domain metadata round-trips; delta.* namespace is reserved") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1).toDF("id"), t)
    RowTracking.setDomainMetadata(spark, t, "app.graft.test", """{"k":1}""")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.domainMetadata("app.graft.test") == """{"k":1}""")
    RowTracking.removeDomainMetadata(spark, t, "app.graft.test")
    assert(!DeltaLog.snapshot(spark, t).domainMetadata.contains("app.graft.test"))
    intercept[IllegalArgumentException] {
      RowTracking.setDomainMetadata(spark, t, "delta.rowTracking", "{}")
    }
  }

  test("delta.enableRowTracking=true via SET TBLPROPERTIES enables and " +
    "backfills (the user-facing switch)") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2, 3).toDF("id"), t)
    DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.enableRowTracking" -> "true"))
    val snap = DeltaLog.snapshot(spark, t)
    assert(RowTracking.supported(snap))
    assert(snap.configuration("delta.enableRowTracking") == "true")
    assert(snap.files.forall(_.baseRowId.isDefined))
    assert(idMap(t).values.toSeq.sorted == Seq(0L, 1L, 2L))
    // the REPL statement form routes through the same switch
    val t2 = tmpTable()
    DeltaWrite.write(Seq(7).toDF("id"), t2)
    assert(DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE `$t2` SET TBLPROPERTIES (delta.enableRowTracking = true)")
      .isDefined)
    assert(RowTracking.supported(DeltaLog.snapshot(spark, t2)))
  }

  test("streaming sink batches mint monotone fresh ids (the last " +
    "add-producing path, stamped by the same commit hook)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = tmpTable()
    DeltaWrite.write(Seq(0).toDF("id"), t)
    RowTracking.enable(spark, t)
    val ckpt = Files.createTempDirectory("graft-rt-ckpt").toString
    val ms = MemoryStream[Int]
    val q = ms.toDF().toDF("id").writeStream
      .format("graft-delta").option("path", t)
      .option("checkpointLocation", ckpt).start()
    ms.addData(1, 2)
    q.processAllAvailable()
    ms.addData(3)
    q.processAllAvailable()
    q.stop()
    val ids = idMap(t)
    assert(ids.keySet == Set(0, 1, 2, 3))
    assert(ids.values.toSet.size == 4, "streamed batches must not collide")
    assert(ids(3) > ids(0), "later batches mint above the mark")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.forall(_.baseRowId.isDefined))
  }

  test("files written before enable read back null ids, not a failure") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2).toDF("id"), t)
    val df = RowTracking.readWithRowIds(spark, t)
    assert(df.count() == 2)
    assert(df.filter(col("_row_id").isNotNull).count() == 0)
  }

  test("setTblProperties is atomic wrt validation: an invalid feature " +
    "key rejects BEFORE the row-tracking enablement commits; and a " +
    "feature-only props map issues no spurious metaData commit") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq(1, 2).toDF("id"), t)
    val v0 = DeltaLog.latestVersion(spark, t)
    intercept[UnsupportedOperationException] {
      DeltaMaintenance.setTblProperties(spark, t, Map(
        "delta.enableRowTracking" -> "true",
        "delta.feature.bogus" -> "supported"))
    }
    assert(DeltaLog.latestVersion(spark, t) == v0,
      "no commit may land when part of the property set is invalid")
    val snap0 = DeltaLog.snapshot(spark, t)
    assert(!snap0.protocol.writerFeatures.contains("rowTracking"))

    // feature-only set: exactly ONE commit (the protocol upgrade), no
    // unchanged-metaData commit behind it
    DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.feature.appendOnly" -> "supported"))
    assert(DeltaLog.latestVersion(spark, t) == v0 + 1)
    assert(DeltaLog.snapshot(spark, t)
      .protocol.writerFeatures.contains("appendOnly"))
  }
}
