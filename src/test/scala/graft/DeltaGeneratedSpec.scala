package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDml, DeltaGenerated, DeltaLog, DeltaWrite}

/** Generated columns (`delta.generationExpression`, writer version 4):
  * omitted columns are computed, supplied values are validated over the
  * staged files, UPDATE recomputes unassigned generated columns, and
  * partitioning by a generated column prunes like any partition. */
class DeltaGeneratedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-generated-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-generated").resolve("t").toString

  import spark.implicits._

  test("create computes an omitted generated column and records the " +
    "expression + writer version 4") {
    val t = tmpTable()
    val df = Seq((1, "2024-03-05 10:00:00"), (2, "2024-03-06 11:30:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    DeltaGenerated.create(df, t, Map("d" -> "to_date(ts)"))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "ts", "d"))
    assert(snap.schema.fields(2).metadata
      .getString("delta.generationExpression") == "to_date(ts)")
    assert(DeltaLog.read(spark, t).orderBy("id")
      .select(col("d").cast("string")).collect().map(_.getString(0)).toSeq ==
      Seq("2024-03-05", "2024-03-06"))
    // protocol floor: writer 4 (generated columns)
    val commit0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_delta_log",
        "00000000000000000000.json")), "UTF-8")
    assert(commit0.contains("\"minWriterVersion\":4"))
    // self-referencing expression rejected
    intercept[IllegalArgumentException](DeltaGenerated.create(
      df, tmpTable(), Map("ts" -> "ts + interval 1 day")))
  }

  test("append: omitted generated column is computed; wrong supplied " +
    "values veto the commit; correct supplied values pass") {
    val t = tmpTable()
    val base = Seq((1, 10)).toDF("id", "n")
    DeltaGenerated.create(base, t, Map("n2" -> "n * 2"))

    DeltaWrite.write(Seq((2, 20)).toDF("id", "n"), t, SaveMode.Append)
    assert(DeltaLog.read(spark, t).orderBy("id").select("n2")
      .collect().map(_.getInt(0)).toSeq == Seq(20, 40))

    val bad = Seq((3, 30, 99)).toDF("id", "n", "n2")
    val e = intercept[IllegalStateException](
      DeltaWrite.write(bad, t, SaveMode.Append))
    assert(e.getMessage.contains("generation of n2"))
    assert(DeltaLog.read(spark, t).count() == 2) // nothing committed

    DeltaWrite.write(Seq((3, 30, 60)).toDF("id", "n", "n2"), t, SaveMode.Append)
    assert(DeltaLog.read(spark, t).count() == 3)
  }

  test("UPDATE recomputes unassigned generated columns after the " +
    "assignments; explicit consistent assignment also passes") {
    val t = tmpTable()
    DeltaGenerated.create(Seq((1, 10), (2, 20)).toDF("id", "n"), t,
      Map("n2" -> "n * 2"))
    // update the base column: n2 must follow, unprompted
    DeltaDml.update(spark, t, col("id") === 1, Seq("n" -> lit(15)))
    val rows = DeltaLog.read(spark, t).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, 15, 30), (2, 20, 40)))
    // explicitly assigning BOTH consistently passes too
    DeltaDml.update(spark, t, col("id") === 2,
      Seq("n" -> lit(21), "n2" -> lit(42)))
    assert(DeltaLog.read(spark, t).where(col("id") === 2)
      .select("n2").head.getInt(0) == 42)
    // explicitly assigning an INCONSISTENT generated value is vetoed
    intercept[IllegalStateException](DeltaDml.update(spark, t,
      col("id") === 2, Seq("n2" -> lit(7))))
  }

  test("partition by a generated column: hive layout + pruning work " +
    "and appends land in the right partition") {
    val t = tmpTable()
    val df = Seq((1, "2024-03-05 10:00:00"), (2, "2024-03-06 11:30:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    DeltaGenerated.create(df, t, Map("d" -> "CAST(to_date(ts) AS STRING)"),
      partitionBy = Seq("d"))
    DeltaWrite.write(
      Seq((3, "2024-03-05 23:00:00")).toDF("id", "ts")
        .withColumn("ts", col("ts").cast("timestamp")),
      t, SaveMode.Append)
    val pruned = DeltaLog.readWhere(spark, t, col("d") === "2024-03-05")
    assert(pruned.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(pruned.inputFiles.forall(_.contains("d=2024-03-05")))
  }
}
