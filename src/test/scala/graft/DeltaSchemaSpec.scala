package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaConstraints, DeltaDml, DeltaLog, DeltaSchema, DeltaWrite}

/** ALTER TABLE ADD / RENAME / DROP COLUMN — metadata-only schema
  * evolution. RENAME/DROP ride on name-mode column mapping (auto
  * upgrade, protocol reader 2 / writer 5); appends and DML keep working
  * afterwards (files written with PHYSICAL names), while overwrite /
  * mergeSchema widening stay rejected. */
class DeltaSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-schema-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-schema").resolve("t").toString

  import spark.implicits._

  test("ADD COLUMNS is metadata-only: old files read NULL, appends can " +
    "then fill the column, data files untouched") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    val filesBefore = DeltaLog.snapshot(spark, t).files.map(_.path).toSet

    DeltaSchema.addColumns(spark, t, "score DOUBLE, tag STRING")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "s", "score", "tag"))
    assert(snap.files.map(_.path).toSet == filesBefore)
    val back = DeltaLog.read(spark, t).orderBy("id")
    assert(back.collect().map(r => (r.getInt(0), r.isNullAt(2), r.isNullAt(3)))
      .toSeq == Seq((1, true, true), (2, true, true)))

    // appends now carry the widened schema
    DeltaWrite.write(Seq((3, "c", 0.5, "x")).toDF("id", "s", "score", "tag"),
      t, SaveMode.Append)
    val rows = DeltaLog.read(spark, t).orderBy("id").collect()
    assert(rows.length == 3 && rows(2).getDouble(2) == 0.5)
    // duplicate name rejected (case-insensitive)
    intercept[IllegalArgumentException](
      DeltaSchema.addColumns(spark, t, "ID BIGINT"))
  }

  test("RENAME COLUMN upgrades to name-mode mapping, keeps data, keeps " +
    "physical names; appends keep working, overwrite is rejected") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    DeltaSchema.renameColumn(spark, t, "s", "label")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.columnMappingMode == "name")
    assert(snap.schema.fieldNames.toSeq == Seq("id", "label"))
    val f = snap.schema.fields(1)
    assert(f.metadata.getString("delta.columnMapping.physicalName") == "s")
    val back = DeltaLog.read(spark, t).orderBy("id")
    assert(back.columns.toSeq == Seq("id", "label"))
    assert(back.collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    // time travel: the pre-rename snapshot still shows the old name
    assert(DeltaLog.read(spark, t, Some(0L)).columns.toSeq == Seq("id", "s"))
    // appends write PHYSICAL names (new files must read back through
    // the mapping, alongside the pre-rename files)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "label"), t, SaveMode.Append)
    assert(DeltaLog.read(spark, t).orderBy("id").collect()
      .map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    // overwrite would replace the mapped schema — still rejected
    intercept[UnsupportedOperationException](
      DeltaWrite.write(Seq((9, "z")).toDF("id", "label"), t, SaveMode.Overwrite))
    // rename collision rejected
    intercept[IllegalArgumentException](
      DeltaSchema.renameColumn(spark, t, "label", "ID"))
  }

  test("DROP COLUMN hides the column going forward; time travel still " +
    "serves it; ADD on a mapped table assigns fresh physical names") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a", 9.5), (2, "b", 7.0)).toDF("id", "s", "score"), t)
    val vDrop = DeltaSchema.dropColumn(spark, t, "score")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(DeltaLog.read(spark, t).columns.toSeq == Seq("id", "s"))
    assert(DeltaLog.read(spark, t, Some(vDrop - 1))
      .select("score").collect().map(_.getDouble(0)).sorted.toSeq == Seq(7.0, 9.5))

    // re-adding a column with the dropped NAME must not resurrect the
    // old bytes: the fresh physical name reads NULL from old files
    DeltaSchema.addColumns(spark, t, "score DOUBLE")
    val snap2 = DeltaLog.snapshot(spark, t)
    val re = snap2.schema.fields.find(_.name == "score").get
    assert(re.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"))
    assert(DeltaLog.read(spark, t).select("score").collect()
      .forall(_.isNullAt(0)))
    // cannot drop down to zero columns
    DeltaSchema.dropColumn(spark, t, "score")
    DeltaSchema.dropColumn(spark, t, "s")
    intercept[IllegalArgumentException](DeltaSchema.dropColumn(spark, t, "id"))
  }

  test("guards: partition columns and constraint-referenced columns are " +
    "immovable; missing column errors") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "eu", "a"), (2, "us", "b")).toDF("id", "region", "s"),
      t, partitionBy = Seq("region"))
    DeltaConstraints.addCheck(spark, t, "pos_id", "id > 0")
    intercept[IllegalArgumentException](
      DeltaSchema.renameColumn(spark, t, "region", "r"))
    intercept[IllegalArgumentException](
      DeltaSchema.dropColumn(spark, t, "region"))
    intercept[IllegalStateException](
      DeltaSchema.renameColumn(spark, t, "id", "key"))
    intercept[IllegalStateException](DeltaSchema.dropColumn(spark, t, "id"))
    intercept[IllegalArgumentException](
      DeltaSchema.dropColumn(spark, t, "nope"))
    // dropping the constraint unblocks the rename
    DeltaConstraints.dropCheck(spark, t, "pos_id")
    DeltaSchema.renameColumn(spark, t, "id", "key")
    assert(DeltaLog.read(spark, t).columns.contains("key"))
  }

  test("mapped snapshot survives a checkpoint roundtrip (protocol 2/5 " +
    "and physical names intact)") {
    val t = tmpTable()
    DeltaWrite.write((1 to 10).map(i => (i, s"r$i")).toDF("id", "s"), t)
    DeltaSchema.renameColumn(spark, t, "s", "txt")
    DeltaWrite.checkpoint(spark, t)
    assert(graft.sources.DeltaMaintenance.cleanupLog(spark, t) > 0)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.columnMappingMode == "name")
    assert(snap.schema.fields(1).metadata
      .getString("delta.columnMapping.physicalName") == "s")
    assert(DeltaLog.read(spark, t).select("txt").count() == 10)
  }

  test("REPL dispatch: ADD/RENAME/DROP COLUMN statements route to the " +
    "schema engine") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    assert(DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE `$t` ADD COLUMNS (score DOUBLE)").exists(_.contains("added")))
    assert(DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE `$t` RENAME COLUMN s TO label").exists(_.contains("renamed")))
    assert(DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE `$t` DROP COLUMN score").exists(_.contains("dropped")))
    assert(DeltaLog.read(spark, t).columns.toSeq == Seq("id", "label"))
  }

  test("TIMESTAMP_NTZ schemas declare the timestampNtz table feature: " +
    "create records reader 3 / writer 7 with the feature, ADD COLUMNS " +
    "and mergeSchema upgrade in the same commit, values round-trip") {
    // fresh table with an NTZ column
    val t = tmpTable()
    val df = spark.sql(
      "SELECT 1 AS id, TIMESTAMP_NTZ'2024-03-01 10:30:00' AS ts")
    DeltaWrite.write(df, t)
    val p = DeltaLog.snapshot(spark, t).protocol
    assert(p.minReader == 3 && p.minWriter == 7 &&
      p.readerFeatures.contains("timestampNtz") &&
      p.writerFeatures.contains("timestampNtz"),
      s"fresh NTZ table must declare the feature, got $p")
    val back = DeltaLog.read(spark, t).collect().head
    assert(back.getAs[java.time.LocalDateTime]("ts") ==
      java.time.LocalDateTime.of(2024, 3, 1, 10, 30),
      "NTZ semantics: no timezone shift on round-trip")

    // ADD COLUMNS introducing NTZ upgrades a legacy-protocol table
    val t2 = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t2)
    assert(DeltaLog.snapshot(spark, t2).protocol.minReader == 1)
    DeltaSchema.addColumns(spark, t2, "seen TIMESTAMP_NTZ")
    val p2 = DeltaLog.snapshot(spark, t2).protocol
    assert(p2.minReader == 3 && p2.readerFeatures.contains("timestampNtz") &&
      p2.writerFeatures.contains("timestampNtz"), s"ADD COLUMNS upgrade: $p2")

    // mergeSchema widening introducing NTZ upgrades too
    val t3 = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t3)
    DeltaWrite.write(
      spark.sql("SELECT 2 AS id, 'b' AS s, TIMESTAMP_NTZ'2024-01-01 00:00:00' AS ts"),
      t3, SaveMode.Append, mergeSchema = true)
    val p3 = DeltaLog.snapshot(spark, t3).protocol
    assert(p3.readerFeatures.contains("timestampNtz"), s"mergeSchema upgrade: $p3")
    // a plain table stays on the legacy base protocol
    val t4 = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t4)
    val p4 = DeltaLog.snapshot(spark, t4).protocol
    assert(p4.minReader == 1 && p4.readerFeatures.isEmpty)
  }

  test("mapped-table writes stamp parquet field_ids from " +
    "delta.columnMapping.id, so files resolve under BOTH mapping modes") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    DeltaSchema.renameColumn(spark, t, "s", "label") // upgrades to mapping
    DeltaWrite.write(Seq((2, "b")).toDF("id", "label"), t, SaveMode.Append)
    val snap = DeltaLog.snapshot(spark, t)
    val idOf = snap.schema.fields.map(f =>
      f.name -> f.metadata.getLong("delta.columnMapping.id")).toMap
    // every live file written AFTER the upgrade carries the field ids
    val conf = spark.sessionState.newHadoopConf()
    val withIds = snap.files.filter { a =>
      val p = new org.apache.hadoop.fs.Path(t, a.path)
      val footer = org.apache.parquet.hadoop.ParquetFileReader
        .open(org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val msg = footer.getFileMetaData.getSchema
        (0 until msg.getFieldCount).forall { i =>
          Option(msg.getType(i).getId).exists(id =>
            idOf.values.toSet.contains(id.intValue().toLong))
        }
      } finally footer.close()
    }
    assert(withIds.nonEmpty, "the post-upgrade append must carry field ids")
    // and the table still reads correctly through name-mode resolution
    assert(DeltaLog.read(spark, t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("ALTER COLUMN TYPE widens metadata-only: narrow files promote on " +
    "read, appends write wide, typeChanges + feature recorded") {
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    val filesBefore = DeltaLog.snapshot(spark, t).files.map(_.path).toSet

    val v = DeltaSchema.widenColumnType(spark, t, "id", "BIGINT")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.version == v)
    // metadata-only: not one data file was touched
    assert(snap.files.map(_.path).toSet == filesBefore)
    assert(snap.protocol.readerFeatures.contains("typeWidening"))
    assert(snap.protocol.writerFeatures.contains("typeWidening"))
    val f = snap.schema("id")
    assert(f.dataType == org.apache.spark.sql.types.LongType)
    val changes = f.metadata.getMetadataArray("delta.typeChanges")
    assert(changes.length == 1 &&
      changes(0).getString("fromType") == "integer" &&
      changes(0).getString("toType") == "long")

    // the narrow physical file promotes on read; a wide append coexists
    DeltaWrite.write(Seq((3L, "c")).toDF("id", "s"), t, SaveMode.Append)
    assert(DeltaLog.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // a second widening on another column appends to the record
    val t2 = tmpTable()
    DeltaWrite.write(Seq((1.5f, java.sql.Date.valueOf("2024-01-02")))
      .toDF("x", "d"), t2)
    DeltaSchema.widenColumnType(spark, t2, "x", "DOUBLE")
    DeltaSchema.widenColumnType(spark, t2, "d", "TIMESTAMP_NTZ")
    val snap2 = DeltaLog.snapshot(spark, t2)
    assert(snap2.schema("x").dataType == org.apache.spark.sql.types.DoubleType)
    assert(snap2.protocol.readerFeatures.contains("timestampNtz"),
      "date->ntz widening must declare the ntz feature too")
    val row = DeltaLog.read(spark, t2).collect().head
    assert(row.getDouble(0) == 1.5d)
    assert(row.getAs[java.time.LocalDateTime](1) ==
      java.time.LocalDate.of(2024, 1, 2).atStartOfDay())
  }

  test("widening guards: narrowing, non-lattice changes, and partition " +
    "columns are refused; DDL dispatch routes") {
    val t = tmpTable()
    Tables.invalidate()
    DeltaWrite.write(
      Seq((1L, 1, "a")).toDF("big", "part", "s"), t, partitionBy = Seq("part"))
    intercept[IllegalArgumentException](
      DeltaSchema.widenColumnType(spark, t, "big", "INT")) // narrowing
    intercept[IllegalArgumentException](
      DeltaSchema.widenColumnType(spark, t, "s", "BIGINT")) // not in lattice
    intercept[IllegalArgumentException](
      DeltaSchema.widenColumnType(spark, t, "part", "BIGINT")) // partition
    // decimal: capacity may only grow
    val t2 = tmpTable()
    DeltaWrite.write(Seq(BigDecimal("1.25")).toDF("m")
      .select(col("m").cast("decimal(5,2)")), t2)
    intercept[IllegalArgumentException](
      DeltaSchema.widenColumnType(spark, t2, "m", "DECIMAL(5,3)"))
    DeltaSchema.widenColumnType(spark, t2, "m", "DECIMAL(12,4)")
    assert(DeltaLog.read(spark, t2).collect().head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("1.25")) == 0)
    // DDL surface routes, and carries the same guards
    intercept[IllegalArgumentException](DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE `$t` ALTER COLUMN big TYPE INT"))
    assert(DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE `$t2` ALTER COLUMN m SET DATA TYPE DECIMAL(14,4)")
      .exists(_.contains("widened")))
  }
}
