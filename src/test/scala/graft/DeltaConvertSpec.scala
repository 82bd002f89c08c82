package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDml, DeltaLog, DeltaMaintenance, DeltaWrite}

/** CONVERT TO DELTA: in-place `_delta_log` creation over an existing
  * parquet directory (no data rewrite) — the operation that turns the
  * reference's parquet lake into `delta_scan`-able tables
  * (delta-unity-duckdb.js:330). Covers unpartitioned + hive-partitioned
  * layouts, stats harvest (data skipping from the first read), the full
  * write lifecycle after conversion, and the REPL dispatch. */
class DeltaConvertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-convert-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-convert").resolve("t").toString

  test("convert an unpartitioned parquet dir: version 0, same rows, " +
    "stats harvested, no data files touched") {
    val t = tmpDir()
    import spark.implicits._
    val df = (1 to 500).map(i => (i, s"row$i")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
    df.write.parquet(t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val before = fs.listStatus(new org.apache.hadoop.fs.Path(t))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap

    val v = DeltaMaintenance.convertToDelta(spark, t)
    assert(v == 0L)
    val back = DeltaLog.read(spark, t)
    assert(back.count() == 500)
    assert(back.orderBy("id").collect().map(_.getInt(0)).toSeq == (1 to 500))
    // in-place: the original part files are the table's files, untouched
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(t))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    assert(after == before)
    // stats harvested -> skipping prunes a point predicate to one file
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.size == 4)
    assert(snap.files.forall(_.stats.isDefined))
    val point = DeltaLog.readWhere(spark, t, col("id") === 42)
    assert(point.inputFiles.length == 1)
    assert(point.collect().map(_.getInt(0)).toSeq == Seq(42))
    // history records the conversion
    val ops = DeltaMaintenance.history(spark, t)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops == Seq("CONVERT"))
  }

  test("convert a hive-partitioned dir: partition columns recovered with " +
    "inferred types and partition pruning works") {
    val t = tmpDir()
    import spark.implicits._
    val df = Seq((1, "eu", "a"), (2, "eu", "b"), (3, "us", "c"), (4, "ap", "d"))
      .toDF("id", "region", "s")
    df.write.partitionBy("region").parquet(t)

    DeltaMaintenance.convertToDelta(spark, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.partitionColumns == Seq("region"))
    assert(snap.schema.fieldNames.contains("region"))
    val back = DeltaLog.read(spark, t)
    assert(back.count() == 4)
    assert(back.where(col("region") === "eu").count() == 2)
    // partition-value point ranges prune files
    val pruned = DeltaLog.readWhere(spark, t, col("region") === "us")
    assert(pruned.inputFiles.length == 1)
    assert(pruned.collect().map(_.getAs[String]("s")).toSeq == Seq("c"))
  }

  test("converted table supports the full write lifecycle: append, " +
    "DELETE, time travel back to the converted snapshot") {
    val t = tmpDir()
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.parquet(t)
    DeltaMaintenance.convertToDelta(spark, t)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, SaveMode.Append)
    assert(DeltaLog.read(spark, t).count() == 3)
    DeltaDml.delete(spark, t, col("id") === 1)
    assert(DeltaLog.read(spark, t).orderBy("id").collect()
      .map(_.getInt(0)).toSeq == Seq(2, 3))
    // version 0 is the converted snapshot
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 2)
  }

  test("refuses an existing Delta table, an empty dir, and a mixed " +
    "partition layout") {
    import spark.implicits._
    val t1 = tmpDir()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t1)
    intercept[IllegalStateException](DeltaMaintenance.convertToDelta(spark, t1))

    val t2 = tmpDir()
    new java.io.File(t2).mkdirs()
    intercept[IllegalArgumentException](DeltaMaintenance.convertToDelta(spark, t2))

    val t3 = tmpDir()
    Seq((1, "eu", "a")).toDF("id", "region", "s")
      .write.partitionBy("region").parquet(t3)
    // drop a stray unpartitioned parquet next to the hive dirs
    Seq((9, "zz")).toDF("id", "s").coalesce(1).write
      .parquet(t3 + "/.stray-staging")
    val fs = new org.apache.hadoop.fs.Path(t3)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(t3 + "/.stray-staging"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(stray, new org.apache.hadoop.fs.Path(t3 + "/stray.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(t3 + "/.stray-staging"), true)
    intercept[IllegalArgumentException](DeltaMaintenance.convertToDelta(spark, t3))
  }

  test("REPL dispatch: CONVERT TO DELTA parquet.`<path>`") {
    val t = tmpDir()
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.parquet(t)
    val msg = DeltaDml.dispatchMaintenance(spark, s"CONVERT TO DELTA parquet.`$t`")
    assert(msg.exists(_.contains("version 0")))
    assert(DeltaLog.read(spark, t).count() == 2)
  }
}
