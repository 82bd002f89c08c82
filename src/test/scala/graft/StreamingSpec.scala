package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, EventsStreaming}

/** Structured Streaming specs: the incremental windowed aggregation must
  * agree with its batch twin (EventOps.q54) on the same input. */
class StreamingSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def stagedEventsDir: String = {
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming windowed counts equal the batch tumbling-window result") {
    val streamed = EventsStreaming.windowedCounts(
      EventsStreaming.readEvents(spark, stagedEventsDir))
    val got = EventsStreaming.runToMemory(spark, streamed, "win_out")
      .select("ws", "event_type", "n")

    val batch = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.except(batch).count() == 0)
    assert(batch.except(got).count() == 0)
  }

  test("append mode + watermark: windows finalize only once the watermark passes") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = Files.createTempDirectory("graft_events_wm")
    // stage first half / second half by time, keeping ts in its RAW
    // physical form (int64 nanos or NTZ — readEvents detects either); a
    // Spark rewrite of the converted timestamp would change the type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet").orderBy("ts").cache()
    val n = ev.count()
    val cut = lit(ev.select("ts").collect()(n.toInt / 2).get(0))
    ev.filter(col("ts") <= cut).coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("batch1").toString)
    Files.move(
      Files.list(dir.resolve("batch1")).filter(_.toString.endsWith(".parquet")).findFirst.get,
      dir.resolve("b1.parquet"))
    val streamed = EventsStreaming.windowedCounts(
      EventsStreaming.readEvents(spark, dir.toString))
    val q = streamed.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_out").start()
    q.processAllAvailable()
    val afterB1 = spark.table("wm_out").count() // watermark still at batch1 max
    ev.filter(col("ts") > cut).coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("batch2").toString)
    Files.move(
      Files.list(dir.resolve("batch2")).filter(_.toString.endsWith(".parquet")).findFirst.get,
      dir.resolve("b2.parquet"))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("wm_out")
    // batch2 advanced the watermark: finalized (early) windows are out, and
    // every emitted window agrees with the batch result for that window.
    assert(emitted.count() > afterB1)
    val batch = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(emitted.select("ws", "event_type", "n").except(batch).count() == 0)
  }

  test("sessionize across batches: late events merge, never fabricate " +
    "sessions; timeout does not re-emit") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String): Event =
      Event(id, Timestamp.valueOf(t), 1L, "click", 0.0)

    val in = MemoryStream[Event]
    val q = EventsStreaming.sessionize(in.toDS())
      .toDF("user_id", "n_sessions", "n_events")
      .writeStream.outputMode("update").format("memory")
      .queryName("sess_multi").start()
    // processAllAvailable does not return under ProcessingTimeTimeout's
    // recurring trigger — poll the sink for the expected emission instead.
    def awaitRow(want: (Long, Long)): Set[(Long, Long)] = {
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      var rows = Set.empty[(Long, Long)]
      while (System.nanoTime < deadline && !rows.contains(want)) {
        Thread.sleep(200)
        rows = spark.table("sess_multi")
          .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
        q.exception.foreach(throw _)
      }
      rows
    }
    try {
      // batch 1: two events > 30 min apart -> 2 sessions
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:00:00"))
      assert(awaitRow((2L, 2L)).contains((2L, 2L)))
      // batch 2: one LATE event (ts before state.lastTs) + one fresh
      // event past the gap. Contract: the late event merges into the
      // current session (events+1, no new session); the fresh one opens
      // session 3.
      in.addData(ev(3, "2024-01-01 10:05:00"), ev(4, "2024-01-01 12:00:00"))
      val rows = awaitRow((3L, 4L))
      assert(rows == Set((2L, 2L), (3L, 4L)), s"got $rows")
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch self-join twin") {
    import org.apache.spark.sql.streaming.OutputMode
    val streamed = EventsStreaming.purchasesWithRecentSignup(
      EventsStreaming.readEvents(spark, stagedEventsDir))
    val got = EventsStreaming.runToMemory(spark, streamed, "ssj_out",
      OutputMode.Append())
    val ev = Tables.load(spark, sf, "events")
    val batch = EventsStreaming.purchasesWithRecentSignup(ev)
    assert(got.count() > 0)
    assert(got.except(batch).count() == 0)
    assert(batch.except(got).count() == 0)
  }

  test("streaming dedup emits first arrivals only; duplicates within " +
    "the watermark are dropped") {
    import org.apache.spark.sql.streaming.OutputMode
    // stage the events file TWICE -> every event_id arrives twice
    val dir = Files.createTempDirectory("graft_events_dup")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val deduped = EventsStreaming.dedupStream(
      EventsStreaming.readEvents(spark, dir.toString), "event_id")
    val got = EventsStreaming.runToMemory(spark, deduped, "dedup_out",
      OutputMode.Append())
    val expected = Tables.load(spark, sf, "events").count()
    assert(got.count() == expected, s"${got.count()} vs $expected")
    assert(got.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("anomalyStats moments equal the batch hourly rollup exactly; " +
    "z-scores are prefix-consistent") {
    import spark.implicits._
    import java.sql.Timestamp
    val events = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    // one sentinel per type, 2h past the corpus, flushes the last real
    // bucket through close(); its own (open) bucket never emits
    val maxTs = events.agg(max(col("ts"))).as[Timestamp].head()
    val sentinels = events.select("event_type").distinct().as[String]
      .collect().toSeq.map(t =>
        Event(Long.MaxValue, new Timestamp(maxTs.getTime + 2 * 3600000L),
          0L, t, 0.0))
    val got = EventsStreaming
      .anomalyStats(events.union(sentinels.toDS())).collect()

    // final moments per type == exact batch rollup over ALL real hours
    val last = got.groupBy(_.event_type).map { case (t, rows) =>
      val r = rows.maxBy(_.h.getTime); (t, r.hours, r.sn, r.sn2)
    }.toSet
    val batch = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("hours"), sum("n").as("sn"),
        sum(col("n") * col("n")).as("sn2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(last == batch)

    // each bucket's z matches recomputation from the PRIOR moments
    got.groupBy(_.event_type).foreach { case (_, rows) =>
      rows.sortBy(_.h.getTime).foreach { r =>
        val (ph, psn, psn2) = (r.hours - 1, r.sn - r.n, r.sn2 - r.n * r.n)
        if (ph >= 2) {
          val mean = psn.toDouble / ph
          val v = psn2.toDouble / ph - mean * mean
          if (v > 0)
            assert(r.z == (r.n.toDouble - mean) / math.sqrt(v))
          else assert(r.z.isNaN)
        } else assert(r.z.isNaN)
      }
    }
  }

  test("stateful sessionization agrees with the batch window form") {
    import spark.implicits._
    val events = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val got = EventsStreaming.sessionize(events)

    val batch = SparkEntry.queries("q52_sessionize")(spark, sf)
    val diff = got.toDF("user_id", "n_sessions", "n_events")
      .except(batch).count()
    assert(diff == 0)
  }

  test("graft-delta streaming source: appends arrive exactly once across " +
    "restarts; rewrites fail the query without opt-in") {
    import graft.sources.{DeltaDml, DeltaWrite}
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val t = Files.createTempDirectory("graft_ds_t").resolve("t").toString
    val out = Files.createTempDirectory("graft_ds_out").toString
    val ckpt = Files.createTempDirectory("graft_ds_ckpt").toString
    // coalesce(1): both rows in ONE data file, so the later UPDATE's
    // rewrite re-emits exactly these two rows under ignoreChanges
    DeltaWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)

    def start(opts: Map[String, String] = Map.empty) = {
      val reader = spark.readStream.format("graft-delta").option("path", t)
      opts.foreach { case (k, v) => reader.option(k, v) }
      reader.load().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    }

    val q = start()
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() == 2)
    // live append: next micro-batch carries exactly the new commit
    DeltaWrite.write(Seq((3L, "c")).toDF("id", "s"), t, SaveMode.Append)
    q.processAllAvailable()
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    q.stop()
    // an append landing while the query is DOWN arrives exactly once on
    // restart (offset = Delta version, recovered from the checkpoint)
    DeltaWrite.write(Seq((4L, "d")).toDF("id", "s"), t, SaveMode.Append)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(out).count() == 4, "no loss, no re-emission")
    // a DML rewrite breaks the append contract -> the query fails...
    DeltaDml.update(spark, t, col("id") === 1L,
      Seq("s" -> org.apache.spark.sql.functions.lit("A")))
    val q3 = start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    def causes(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(ex).exists(_.isInstanceOf[UnsupportedOperationException]))
    // ...and ignoreChanges opts into at-least-once re-emission of the
    // rewritten file (ids 1,2 re-emitted alongside the 4 originals)
    val q4 = start(Map("ignoreChanges" -> "true"))
    q4.processAllAvailable()
    q4.stop()
    assert(spark.read.parquet(out).count() == 6)
  }

  test("graft-delta sink: micro-batches append exactly once; replayed " +
    "(appId, batch) pairs are skipped via the logged txn — even after " +
    "checkpoint + log cleanup") {
    import graft.sources.{DeltaLog, DeltaMaintenance, DeltaWrite}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val t = Files.createTempDirectory("graft_dsink_t").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft_dsink_ckpt").toString
    val ms = MemoryStream[(Long, String)]
    def start() = ms.toDF().toDF("id", "s").writeStream
      .format("graft-delta").option("path", t)
      .option("checkpointLocation", ckpt).start()

    val q = start()
    ms.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    assert(DeltaLog.read(spark, t).count() == 2)
    val snap1 = DeltaLog.snapshot(spark, t)
    assert(snap1.txns.nonEmpty, "commit must record a txn action")
    val appId = snap1.txns.keys.head
    ms.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(DeltaLog.read(spark, t).count() == 3)

    // restart from the same engine checkpoint: nothing re-applies
    val q2 = start()
    ms.addData((4L, "d"))
    q2.processAllAvailable()
    q2.stop()
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // direct replay of an already-committed batch is a skip, not a dup
    val lastTxn = DeltaLog.snapshot(spark, t).txns(appId)
    val replay = DeltaWrite.transactionalAppend(
      Seq((99L, "dup")).toDF("id", "s"), t, appId, lastTxn)
    assert(replay.isEmpty)
    assert(DeltaLog.read(spark, t).count() == 4)
    // ...and a NEW batch commits
    val fresh = DeltaWrite.transactionalAppend(
      Seq((5L, "e")).toDF("id", "s"), t, appId, lastTxn + 1)
    assert(fresh.nonEmpty)
    assert(DeltaLog.read(spark, t).count() == 5)

    // txn state survives checkpoint + log cleanup (it rides in the
    // checkpoint parquet): the replay is STILL detected
    DeltaWrite.checkpoint(spark, t)
    assert(DeltaMaintenance.cleanupLog(spark, t) > 0)
    assert(DeltaLog.snapshot(spark, t).txns(appId) == lastTxn + 1)
    val replay2 = DeltaWrite.transactionalAppend(
      Seq((99L, "dup")).toDF("id", "s"), t, appId, lastTxn + 1)
    assert(replay2.isEmpty)
    assert(DeltaLog.read(spark, t).count() == 5)
  }

  test("graft-delta source rate limiting: maxVersionsPerTrigger splits a " +
    "backlog into bounded micro-batches without losing commits") {
    import graft.sources.DeltaWrite
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val t = Files.createTempDirectory("graft_ds_rate").resolve("t").toString
    DeltaWrite.write(Seq((0L, "v0")).toDF("id", "s"), t)
    (1 to 6).foreach(i =>
      DeltaWrite.write(Seq((i.toLong, s"v$i")).toDF("id", "s"), t, SaveMode.Append))
    val out = Files.createTempDirectory("graft_ds_rate_out").toString
    val q = spark.readStream.format("graft-delta").option("path", t)
      .option("maxVersionsPerTrigger", "2").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ds_rate_ckpt").toString).start()
    q.processAllAvailable()
    // first batch = whole current snapshot (one consistent bootstrap);
    // then new commits arrive at most 2 versions per batch
    (7 to 11).foreach(i =>
      DeltaWrite.write(Seq((i.toLong, s"v$i")).toDF("id", "s"), t, SaveMode.Append))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() == 12, "no commit lost or duplicated")
    // the 5-commit backlog took ceil(5/2) = 3 batches after the bootstrap
    val progress = q.recentProgress.map(p =>
      (p.batchId, p.numInputRows)).filter(_._2 > 0)
    assert(progress.length >= 4, // bootstrap + >= 3 capped batches
      s"expected the backlog split across batches, saw ${progress.mkString(", ")}")
  }

  test("graft-delta source rate limiting: maxFilesPerTrigger bounds the " +
    "batch in files, never splits a version, and restart replay stays " +
    "exactly-once") {
    import graft.sources.DeltaWrite
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val t = Files.createTempDirectory("graft_ds_frate").resolve("t").toString
    DeltaWrite.write(Seq((0L, "v0")).toDF("id", "s"), t)
    val out = Files.createTempDirectory("graft_ds_frate_out").toString
    val ckpt = Files.createTempDirectory("graft_ds_frate_ckpt").toString
    def start() = spark.readStream.format("graft-delta").option("path", t)
      .option("maxFilesPerTrigger", "3").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q = start()
    q.processAllAvailable()
    // backlog: 4 commits x 2 files x 2 rows — a 3-file cap fits exactly
    // one 2-file version per batch (two would be 4 > 3), so the cap can
    // only be honored by NOT splitting versions: every non-empty batch
    // after bootstrap must carry a whole version's 2 rows.
    (1 to 4).foreach(i => DeltaWrite.write(
      Seq((i * 10L, "a"), (i * 10L + 1, "b")).toDF("id", "s").repartition(2),
      t, SaveMode.Append))
    q.processAllAvailable()
    q.stop()
    val afterBootstrap = q.recentProgress.map(_.numInputRows)
      .filter(_ > 0).drop(1)
    assert(afterBootstrap.length == 4 && afterBootstrap.forall(_ == 2),
      s"each capped batch must be one whole version: ${afterBootstrap.toSeq}")
    // restart from the checkpoint: new commits only, no re-serve
    (5 to 6).foreach(i => DeltaWrite.write(
      Seq((i * 10L, "a"), (i * 10L + 1, "b")).toDF("id", "s").repartition(2),
      t, SaveMode.Append))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(out).count() == 1 + 4 * 2 + 2 * 2,
      "rate-limited restart must neither lose nor duplicate rows")
  }

  test("graft-delta source rate limiting: maxBytesPerTrigger=1 degrades " +
    "to one-version-per-batch (progress guarantee past an oversized " +
    "version)") {
    import graft.sources.DeltaWrite
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val t = Files.createTempDirectory("graft_ds_brate").resolve("t").toString
    DeltaWrite.write(Seq((0L, "v0")).toDF("id", "s"), t)
    val out = Files.createTempDirectory("graft_ds_brate_out").toString
    val q = spark.readStream.format("graft-delta").option("path", t)
      .option("maxBytesPerTrigger", "1").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ds_brate_ckpt").toString).start()
    q.processAllAvailable()
    (1 to 3).foreach(i => DeltaWrite.write(
      Seq((i.toLong, s"v$i")).toDF("id", "s"), t, SaveMode.Append))
    q.processAllAvailable()
    q.stop()
    // every version's parquet exceeds 1 byte, so the progress guarantee
    // must advance exactly one version per batch — never zero (stall),
    // never a partial version
    val afterBootstrap = q.recentProgress.map(_.numInputRows)
      .filter(_ > 0).drop(1)
    assert(afterBootstrap.length == 3 && afterBootstrap.forall(_ == 1),
      s"one whole version per batch expected: ${afterBootstrap.toSeq}")
    assert(spark.read.parquet(out).count() == 4)
  }

  test("Delta-to-Delta streaming pipeline: source -> transform -> txn " +
    "sink survives a restart with exactly-once end to end") {
    import graft.sources.{DeltaLog, DeltaWrite}
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val src = Files.createTempDirectory("graft_d2d_src").resolve("t").toString
    val dst = Files.createTempDirectory("graft_d2d_dst").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft_d2d_ckpt").toString
    DeltaWrite.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), src)

    def start() = spark.readStream.format("graft-delta").option("path", src)
      .load()
      .select(col("id"), (col("v") * 2).as("v2")) // the incremental ETL
      .writeStream.format("graft-delta").option("path", dst)
      .option("checkpointLocation", ckpt).start()

    val q = start()
    q.processAllAvailable()
    assert(DeltaLog.read(spark, dst).as[(Long, Double)].collect().toSet ==
      Set((1L, 20.0), (2L, 40.0)))
    DeltaWrite.write(Seq((3L, 30.0)).toDF("id", "v"), src, SaveMode.Append)
    q.processAllAvailable()
    q.stop()
    // an append lands while the pipeline is DOWN; the restart must carry
    // it through exactly once (source offset from the engine checkpoint,
    // sink dedupe from the destination table's txn ledger)
    DeltaWrite.write(Seq((4L, 40.0)).toDF("id", "v"), src, SaveMode.Append)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(DeltaLog.read(spark, dst).as[(Long, Double)].collect().toSet ==
      Set((1L, 20.0), (2L, 40.0), (3L, 60.0), (4L, 80.0)))
    // destination history is itself a Delta log: one commit per batch,
    // each carrying its txn action
    assert(DeltaLog.snapshot(spark, dst).txns.nonEmpty)
  }

  test("graft-delta fresh stream bootstraps from the snapshot: works on a " +
    "cleaned log and does not resurrect pre-stream deletes") {
    import graft.sources.{DeltaDml, DeltaMaintenance, DeltaWrite}
    import org.apache.spark.sql.SaveMode
    import spark.implicits._

    // Case 1: table whose early commits were cleaned away. A fresh
    // stream used to replay from version -1 and die on the missing
    // commit 0 (ADVICE r03); it must instead serve the current snapshot.
    val t1 = Files.createTempDirectory("graft_ds_boot1").resolve("t").toString
    DeltaWrite.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t1)
    DeltaWrite.write(Seq((3L, "c")).toDF("id", "s"), t1, SaveMode.Append)
    DeltaWrite.checkpoint(spark, t1)
    assert(DeltaMaintenance.cleanupLog(spark, t1) == 2)
    val out1 = Files.createTempDirectory("graft_ds_boot1_out").toString
    val q1 = spark.readStream.format("graft-delta").option("path", t1).load()
      .writeStream.format("parquet").option("path", out1)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ds_boot1_ckpt").toString).start()
    q1.processAllAvailable()
    // appends after the bootstrap still flow incrementally
    DeltaWrite.write(Seq((4L, "d")).toDF("id", "s"), t1, SaveMode.Append)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out1).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // Case 2: DML before the stream ever started. Under ignoreChanges a
    // from-scratch replay would emit the original file AND its rewrite —
    // resurrecting rows deleted before the stream existed. The snapshot
    // bootstrap emits only the live rows.
    val t2 = Files.createTempDirectory("graft_ds_boot2").resolve("t").toString
    DeltaWrite.write((1L to 4L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1), t2)
    DeltaDml.delete(spark, t2, col("id") <= 2L)
    val out2 = Files.createTempDirectory("graft_ds_boot2_out").toString
    val q2 = spark.readStream.format("graft-delta").option("path", t2)
      .option("ignoreChanges", "true").load()
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ds_boot2_ckpt").toString).start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(out2).as[(Long, String)].collect().toSet ==
      Set((3L, "r3"), (4L, "r4")))
  }

  test("graft-delta source applies deletion vectors and column mapping: " +
    "bootstrap excludes vectored rows; mid-stream MOR deletes under " +
    "ignoreChanges re-emit live rows only; renamed tables stream " +
    "logical columns") {
    import graft.sources.{DeltaDml, DeltaDv, DeltaMaintenance, DeltaSchema, DeltaWrite}
    import spark.implicits._

    // DV table: delete BEFORE the stream → bootstrap must not serve the
    // deleted row (the raw-parquet fast path would)
    val t = Files.createTempDirectory("graft_ds_dv").resolve("t").toString
    DeltaWrite.write((1L to 4L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    DeltaDml.delete(spark, t, col("id") === 2L) // merge-on-read: no rewrite
    val out = Files.createTempDirectory("graft_ds_dv_out").toString
    val ckpt = Files.createTempDirectory("graft_ds_dv_ckpt").toString
    val q = spark.readStream.format("graft-delta").option("path", t)
      .option("ignoreChanges", "true").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "r1"), (3L, "r3"), (4L, "r4")),
      "bootstrap must apply the deletion vector")
    // mid-stream MOR delete: the re-added file carries a merged DV —
    // under ignoreChanges only its LIVE rows re-emit (id=2 stays dead)
    DeltaDml.delete(spark, t, col("id") === 3L)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "r1"), (3L, "r3"), (4L, "r4")),
      "re-emission must not resurrect vectored-out rows")

    // name-mapped table: physical parquet names resolve to LOGICAL
    // stream columns (raw read would yield nulls for the renamed column)
    val t2 = Files.createTempDirectory("graft_ds_map").resolve("t").toString
    DeltaWrite.write(Seq((1L, "x"), (2L, "y")).toDF("id", "s"), t2)
    DeltaSchema.renameColumn(spark, t2, "s", "label")
    val out2 = Files.createTempDirectory("graft_ds_map_out").toString
    val q2 = spark.readStream.format("graft-delta").option("path", t2).load()
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ds_map_ckpt").toString).start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out2)
    assert(got.columns.toSeq == Seq("id", "label"))
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "y")),
      "mapped physical column must not read as null")
  }
}
