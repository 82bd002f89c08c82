package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaCdf, DeltaDml, DeltaLog, DeltaMaintenance, DeltaWrite}

/** Change Data Feed specs: `delta.enableChangeDataFeed` property, cdc
  * change files with true pre/post images from every DML path, the
  * protocol's cdc-over-file-actions reader preference, the file-action
  * fallback for commits without change files, and retention behavior
  * under VACUUM. */
class DeltaCdfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cdf-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-cdf").resolve("t").toString

  /** (id, s, v) rows of the feed for a version, sorted. */
  private def changes(t: String, v: Long): Seq[(Int, String, Int, String)] =
    DeltaCdf.tableChanges(spark, t, v, Some(v))
      .orderBy("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSeq

  private def newCdfTable(): String = {
    val t = tmpTable()
    import spark.implicits._
    DeltaWrite.write(
      Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("id", "s", "v"), t)
    DeltaMaintenance.setTblProperties(spark, t,
      Map(DeltaCdf.Property -> "true"))
    t
  }

  test("UPDATE writes update_preimage/update_postimage change files") {
    val t = newCdfTable()
    val r = DeltaDml.update(spark, t, col("v") >= 20,
      Seq("v" -> (col("v") + 1)))
    // "update_postimage" sorts before "update_preimage" (o < r)
    assert(changes(t, r.version) == Seq(
      (2, "b", 21, "update_postimage"), (2, "b", 20, "update_preimage"),
      (3, "c", 31, "update_postimage"), (3, "c", 30, "update_preimage")))
    // cdc actions present -> the commit's add/remove are NOT diffed:
    // the carried-over untouched row (id=1 shares a file) must not
    // surface as a phantom insert/delete pair
    assert(!changes(t, r.version).exists(_._1 == 1))
  }

  test("DELETE writes delete change rows; MERGE covers all three kinds") {
    val t = newCdfTable()
    val d = DeltaDml.delete(spark, t, col("id") === 1)
    assert(changes(t, d.version) == Seq((1, "a", 10, "delete")))

    import spark.implicits._
    val source = Seq((2, "B", 5), (9, "z", 90)).toDF("id", "s", "v")
    val m = DeltaDml.merge(spark, t, source,
      condition = col("t.id") === col("s.id"),
      matchedUpdate = Seq("s" -> col("s.s"), "v" -> (col("t.v") + col("s.v"))),
      insert = true)
    assert(changes(t, m.version) == Seq(
      (2, "B", 25, "update_postimage"), (2, "b", 20, "update_preimage"),
      (9, "z", 90, "insert")))
  }

  test("appends read as inserts; range feed spans versions in order") {
    val t = newCdfTable()
    import spark.implicits._
    DeltaWrite.write(Seq((4, "d", 40)).toDF("id", "s", "v"), t, SaveMode.Append)
    DeltaDml.delete(spark, t, col("id") === 2)
    val feed = DeltaCdf.tableChanges(spark, t, 2)
      .orderBy("_commit_version", "id").collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(feed == Seq((4, "insert", 2L), (2, "delete", 3L)))
    // version 0 (creation, before CDF) still resolves via the fallback
    val v0 = DeltaCdf.tableChanges(spark, t, 0, Some(0))
    assert(v0.collect().map(_.getString(3)).toSet == Set("insert"))
    assert(v0.count() == 3)
  }

  test("DML before CDF enablement falls back to the multiset diff") {
    val t = tmpTable()
    import spark.implicits._
    DeltaWrite.write(Seq((1, "a", 10), (2, "b", 20)).toDF("id", "s", "v"), t)
    DeltaDml.update(spark, t, col("id") === 1, Seq("v" -> lit(11)))
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaCdf.Property -> "true"))
    // the pre-enablement UPDATE has no change files: honest insert/delete
    assert(changes(t, 1L) == Seq((1, "a", 10, "delete"), (1, "a", 11, "insert")))
  }

  test("vacuumed change files fail the feed read explicitly; feed " +
    "requires the property") {
    val t = newCdfTable()
    val r = DeltaDml.delete(spark, t, col("id") === 3)
    DeltaMaintenance.vacuum(spark, t, retainMs = 0L)
    val e = intercept[IllegalStateException](changes(t, r.version))
    assert(e.getMessage.contains("vacuumed"))

    val plain = tmpTable()
    import spark.implicits._
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), plain)
    val e2 = intercept[IllegalArgumentException](
      DeltaCdf.tableChanges(spark, plain, 0))
    assert(e2.getMessage.contains("enableChangeDataFeed"))
  }

  test("table_changes SQL surface rewrites onto the feed") {
    val t = newCdfTable()
    DeltaDml.delete(spark, t, col("id") === 1) // v2
    val df = DeltaCdf.dispatchSql(spark,
      s"SELECT id, _change_type FROM table_changes('$t', 2) ORDER BY id").get
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "delete")))
    // bounded range + aggregation through ordinary SQL over the view
    val counts = DeltaCdf.dispatchSql(spark,
      s"SELECT _change_type, COUNT(*) AS n FROM table_changes('$t', 0, 2) " +
        "GROUP BY 1 ORDER BY 1").get
    assert(counts.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 1L), ("insert", 3L)))
    assert(DeltaCdf.dispatchSql(spark, "SELECT 1").isEmpty)
  }

  test("streaming readChangeFeed: snapshot bootstraps as inserts, then " +
    "DML arrives as pre/post images across a restart") {
    val t = newCdfTable()
    val out = Files.createTempDirectory("graft-cdf-out").toString
    val ckpt = Files.createTempDirectory("graft-cdf-ckpt").toString
    def start() = spark.readStream.format("graft-delta")
      .option("path", t).option("readChangeFeed", "true")
      .load().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()

    val q = start()
    q.processAllAvailable()
    val boot = spark.read.parquet(out)
    assert(boot.count() == 3)
    assert(boot.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))

    val r = DeltaDml.update(spark, t, col("id") === 2, Seq("v" -> lit(99)))
    q.processAllAvailable()
    q.stop()
    val afterUpd = spark.read.parquet(out)
      .filter(col("_commit_version") === r.version)
      .select("id", "v", "_change_type").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getString(2))).toSet
    assert(afterUpd == Set((2, 20, "update_preimage"), (2, 99, "update_postimage")))

    // a DELETE landing while the query is down arrives exactly once
    val d = DeltaDml.delete(spark, t, col("id") === 3)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val del = spark.read.parquet(out)
      .filter(col("_commit_version") === d.version).collect()
    assert(del.length == 1 && del.head.getAs[String]("_change_type") == "delete")
    assert(spark.read.parquet(out).count() == 6) // 3 boot + 2 update + 1 delete
  }

  test("incremental view maintenance consumes cdc pre/post images and " +
    "matches full recompute") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    val t = tmpTable()
    DeltaWrite.write((1 to 20).map(i => (i, i % 4, (i * 2).toDouble))
      .toDF("id", "k", "v"), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaCdf.Property -> "true"))
    def recompute(): Map[Int, (Double, Long)] =
      IncrementalAgg.compute(graft.sources.DeltaLog.read(spark, t), "k", "v")
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    var view = IncrementalAgg.compute(graft.sources.DeltaLog.read(spark, t), "k", "v")
    var last = DeltaLog.latestVersion(spark, t)
    def step(op: => Any): Unit = {
      op
      val now = DeltaLog.latestVersion(spark, t)
      view = IncrementalAgg.refresh(spark, view, t, last, now, "k", "v")
      last = now
      assert(view.collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap == recompute(), s"view diverged after v$now")
    }
    // the UPDATE refresh reads the cdc images (2 rows), not the rewritten
    // file (20 rows): exercised by the preimage/postimage sign handling
    step(DeltaDml.update(spark, t, col("k") === 1, Seq("v" -> (col("v") + 5))))
    step(DeltaDml.delete(spark, t, col("k") === 2))
    step(DeltaDml.merge(spark, t, Seq((3, 3, 77.0), (50, 9, 10.0)).toDF("id", "k", "v"),
      condition = col("t.id") === col("s.id"),
      matchedUpdate = Seq("v" -> col("s.v")), insert = true))
  }

  test("REPL ALTER TABLE SET TBLPROPERTIES enables the feed") {
    val t = tmpTable()
    import spark.implicits._
    DeltaWrite.write(Seq((1, "a", 10)).toDF("id", "s", "v"), t)
    val msg = DeltaDml.dispatchMaintenance(spark,
      s"ALTER TABLE $t SET TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
    assert(msg.exists(_.contains("1 property set")))
    assert(DeltaCdf.enabled(DeltaLog.snapshot(spark, t).configuration))
    // constraints must go through ADD CONSTRAINT (existing-row validation)
    intercept[IllegalArgumentException] {
      DeltaMaintenance.setTblProperties(spark, t,
        Map("delta.constraints.c" -> "v > 0"))
    }
  }
}
