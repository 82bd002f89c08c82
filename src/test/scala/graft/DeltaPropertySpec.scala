package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDml, DeltaDv, DeltaLog, DeltaMaintenance, DeltaSchema, DeltaWrite}

/** Model-based property test: a random interleaving of every Delta
  * operation (append / overwrite / UPDATE / DELETE / MERGE / RESTORE /
  * transactional streaming appends with replay / OPTIMIZE / checkpoint /
  * VACUUM / time-travel reads) must keep the log-replayed table equal to
  * a trivial in-memory model after every step. This is the strongest
  * correctness statement the source can make: no operation order
  * corrupts the snapshot, maintenance operations are invisible to
  * readers, and a replayed (appId, batch) is a no-op wherever it lands
  * in the interleaving. */
class DeltaPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-delta-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("random op sequences never diverge from the model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L) // fixed seed: deterministic
    val t = Files.createTempDirectory("graft-delta-prop").resolve("t").toString

    var model = Map.empty[Int, Double] // id -> v (ids unique by invariant)
    var nextId = 0
    def freshBatch(n: Int): Seq[(Int, Double)] = {
      val b = (0 until n).map(i => (nextId + i, (nextId + i) * 1.5))
      nextId += n
      b
    }
    // version -> model at that version (for time-travel checks)
    var history = Map.empty[Long, Map[Int, Double]]

    DeltaWrite.write(freshBatch(3).toDF("id", "v"), t)
    model = Map(0 -> 0.0, 1 -> 1.5, 2 -> 3.0)
    history += (0L -> model)

    def check(): Unit = {
      val got = DeltaLog.read(spark, t).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == model, s"divergence: got=$got model=$model")
    }
    check()

    var txnBatch = 0L // monotone batch counter for the streaming-sink path
    (1 to 40).foreach { step =>
      rnd.nextInt(11) match {
        case 0 => // append
          val b = freshBatch(1 + rnd.nextInt(3))
          val v = DeltaWrite.write(b.toDF("id", "v"), t, SaveMode.Append)
          model ++= b.toMap
          history += (v -> model)
        case 1 => // overwrite
          val b = freshBatch(2)
          val v = DeltaWrite.write(b.toDF("id", "v"), t, SaveMode.Overwrite)
          model = b.toMap
          history += (v -> model)
        case 2 => // delete a random residue class
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          val res = DeltaDml.delete(spark, t, pmod(col("id"), lit(k)) === r)
          val expect = model.filter { case (id, _) => ((id % k) + k) % k == r }
          assert(res.affectedRows == expect.size)
          model --= expect.keys
          if (res.rewrittenFiles > 0)
            history += (DeltaLog.latestVersion(spark, t) -> model)
        case 3 => // update a random residue class
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          DeltaDml.update(spark, t, pmod(col("id"), lit(k)) === r,
            Seq("v" -> (col("v") + 100)))
          model = model.map { case (id, v) =>
            id -> (if (((id % k) + k) % k == r) v + 100 else v)
          }
          history += (DeltaLog.latestVersion(spark, t) -> model)
        case 4 => // compact everything (tiny files)
          DeltaMaintenance.compact(spark, t, smallFileBytes = 32 * 1024 * 1024)
        case 5 => // checkpoint — sometimes through the table's
          // delta.checkpointPolicy=v2 property (once set it sticks, so
          // later checkpoints in this run take the V2 manifest path)
          if (rnd.nextBoolean() && !DeltaLog.snapshot(spark, t)
              .configuration.get("delta.checkpointPolicy").contains("v2"))
            DeltaMaintenance.setTblProperties(spark, t,
              Map("delta.checkpointPolicy" -> "v2"))
          DeltaWrite.checkpoint(spark, t)
          if (DeltaLog.snapshot(spark, t).configuration
              .get("delta.checkpointPolicy").contains("v2")) {
            val names = new java.io.File(s"$t/_delta_log").listFiles()
              .map(_.getName)
            assert(names.exists(_.matches(
              """\d{20}\.checkpoint\.[0-9a-fA-F-]{36}\.(parquet|json)""")),
              "v2 policy must produce the V2 checkpoint form")
          }
        case 6 => // vacuum: kills time travel for pre-vacuum versions.
          // Sometimes under a declared vacuumProtocolCheck writer gate —
          // vacuum must run the protocol check and still proceed (the
          // feature is in the supported set; an UNKNOWN writer feature
          // refusing vacuum is covered by the foreign-protocol test).
          if (rnd.nextBoolean() && !DeltaLog.snapshot(spark, t)
              .protocol.writerFeatures.contains("vacuumProtocolCheck")) {
            DeltaMaintenance.setTblProperties(spark, t,
              Map("delta.feature.vacuumProtocolCheck" -> "supported"))
            val p = DeltaLog.snapshot(spark, t).protocol
            assert(p.writerFeatures.contains("vacuumProtocolCheck") &&
              p.readerFeatures.contains("vacuumProtocolCheck"),
              "delta.feature enablement must land in the protocol")
          }
          DeltaMaintenance.vacuum(spark, t, retainMs = 0L)
          history = Map.empty
        case 7 => // MERGE: update a residue class + insert fresh rows
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          val updates = model.collect {
            case (id, _) if ((id % k) + k) % k == r => (id, id * -2.0)
          }.toSeq
          val fresh = freshBatch(1 + rnd.nextInt(2))
          val src = (updates ++ fresh).toDF("id", "v")
          val res = DeltaDml.merge(spark, t, src,
            condition = col("t.id") === col("s.id"),
            matchedUpdate = Seq("v" -> col("s.v")), insert = true)
          assert(res.updatedRows == updates.size &&
            res.insertedRows == fresh.size)
          model = model ++ updates.toMap ++ fresh.toMap
          history += (DeltaLog.latestVersion(spark, t) -> model)
        case 8 => // RESTORE to a random retained version (post-vacuum
          // history only, so the historical files still exist)
          if (history.nonEmpty) {
            val (hv, hm) = history.toSeq(rnd.nextInt(history.size))
            val nv = DeltaMaintenance.restore(spark, t, hv)
            model = hm
            history += (nv -> model)
          }
        case 9 => // transactional (streaming-sink) append, then REPLAY
          // the same (appId, batch) — the replay must be a no-op
          val b = freshBatch(1 + rnd.nextInt(2))
          txnBatch += 1
          val v = DeltaWrite.transactionalAppend(
            b.toDF("id", "v"), t, "prop-app", txnBatch)
          assert(v.nonEmpty)
          model ++= b.toMap
          history += (v.get -> model)
          val replay = DeltaWrite.transactionalAppend(
            Seq((-1, -1.0)).toDF("id", "v"), t, "prop-app", txnBatch)
          assert(replay.isEmpty, "replayed txn batch must not commit")
        case 10 => // log compaction over a random range: replay must be
          // byte-for-byte indistinguishable to every subsequent check()
          // and time-travel spot-check (cleanupLog is not in this op
          // mix, so every commit JSON in the range exists)
          val latest = DeltaLog.latestVersion(spark, t)
          val a = rnd.nextLong(latest + 1)
          val b = a + rnd.nextLong(latest - a + 1)
          DeltaMaintenance.compactLog(spark, t, a, b)
      }
      check()
      // spot-check one retained historical version per step
      if (history.nonEmpty) {
        val (hv, hm) = history.toSeq(rnd.nextInt(history.size))
        val got = DeltaLog.read(spark, t, Some(hv)).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        assert(got == hm, s"time travel v$hv diverged: got=$got model=$hm")
      }
    }
  }

  /** The same model-based interleaving on the HARD table shape: deletion
    * vectors enabled (DELETE/UPDATE go merge-on-read — descriptors land
    * inline for small deletes and as uuid-relative 'u' files for big
    * ones) on a column-mapped table whose logical column name differs
    * from the physical parquet name. Mixes MoR DML with copy-on-write
    * MERGE, compaction (which must materialize the DVs it compacts
    * away), both checkpoint formats, RESTORE and VACUUM. At the end the
    * run must have exercised BOTH descriptor storage forms — a fixed
    * seed makes that witness deterministic. */
  test("random MoR sequences on a DV + column-mapped table never diverge") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val t = Files.createTempDirectory("graft-delta-prop-mor").resolve("t").toString

    var nextId = 0
    def freshBatch(n: Int): Seq[(Int, Double)] = {
      val b = (0 until n).map(i => (nextId + i, (nextId + i) * 1.5))
      nextId += n
      b
    }

    // 2000 rows in ONE file: residue-class deletes hit hundreds of
    // positions there, overflowing the 512-byte inline bound into the
    // 'u' sidecar form; later small appends + deletes stay inline.
    val seedRows = freshBatch(2000)
    DeltaWrite.write(seedRows.toDF("id", "v").coalesce(1), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    DeltaSchema.enableColumnMapping(spark, t)
    DeltaSchema.renameColumn(spark, t, "v", "w") // logical != physical

    var model: Map[Int, Double] = seedRows.toMap
    var history = Map.empty[Long, Map[Int, Double]]
    history += (DeltaLog.latestVersion(spark, t) -> model)

    def check(): Unit = {
      val got = DeltaLog.read(spark, t).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == model, s"divergence: ${got.size} vs ${model.size} rows; " +
        s"extra=${(got.keySet -- model.keySet).take(5)} " +
        s"missing=${(model.keySet -- got.keySet).take(5)}")
    }
    check()

    var sawInline = false
    var sawFileDv = false
    def noteDvForms(): Unit =
      DeltaLog.snapshot(spark, t).files.flatMap(_.dv).foreach { d =>
        if (d.inline) sawInline = true else sawFileDv = true
      }

    (1 to 40).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 => // append (small files: later deletes inline)
          val b = freshBatch(1 + rnd.nextInt(3))
          val v = DeltaWrite.write(b.toDF("id", "w"), t, SaveMode.Append)
          model ++= b.toMap
          history += (v -> model)
        case 2 | 3 => // MoR DELETE of a residue class
          val k = 2 + rnd.nextInt(4); val r = rnd.nextInt(k)
          val res = DeltaDml.delete(spark, t, pmod(col("id"), lit(k)) === r)
          val expect = model.filter { case (id, _) => ((id % k) + k) % k == r }
          assert(res.affectedRows == expect.size,
            s"DELETE id%$k==$r: got ${res.affectedRows}, expect ${expect.size}")
          assert(res.rewrittenFiles == 0, "MoR DELETE must not rewrite files")
          model --= expect.keys
          history += (DeltaLog.latestVersion(spark, t) -> model)
        case 4 => // MoR UPDATE of a residue class (condition + SET on
          // the RENAMED logical column)
          val k = 2 + rnd.nextInt(4); val r = rnd.nextInt(k)
          DeltaDml.update(spark, t, pmod(col("id"), lit(k)) === r,
            Seq("w" -> (col("w") + 1000)))
          model = model.map { case (id, v) =>
            id -> (if (((id % k) + k) % k == r) v + 1000 else v)
          }
          history += (DeltaLog.latestVersion(spark, t) -> model)
        case 5 => // CoW MERGE into the MoR table
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          val updates = model.collect {
            case (id, _) if ((id % k) + k) % k == r => (id, id * -2.0)
          }.toSeq
          val fresh = freshBatch(1 + rnd.nextInt(2))
          val res = DeltaDml.merge(spark, t, (updates ++ fresh).toDF("id", "w"),
            condition = col("t.id") === col("s.id"),
            matchedUpdate = Seq("w" -> col("s.w")), insert = true)
          assert(res.updatedRows == updates.size &&
            res.insertedRows == fresh.size)
          model = model ++ updates.toMap ++ fresh.toMap
          history += (DeltaLog.latestVersion(spark, t) -> model)
        case 6 => // compact: materializes DVs into clean files
          DeltaMaintenance.compact(spark, t, smallFileBytes = 32 * 1024 * 1024)
        case 7 => // either checkpoint format
          if (rnd.nextBoolean()) DeltaWrite.checkpoint(spark, t)
          else DeltaWrite.checkpointV2(spark, t, sidecars = 1 + rnd.nextInt(2))
        case 8 => // RESTORE to a retained version (files + DV files of
          // retained versions still exist pre-vacuum)
          if (history.nonEmpty) {
            val (hv, hm) = history.toSeq(rnd.nextInt(history.size))
            val nv = DeltaMaintenance.restore(spark, t, hv)
            model = hm
            history += (nv -> model)
          }
        case 9 => // vacuum: unreferenced data AND DV files go; history dies
          DeltaMaintenance.vacuum(spark, t, retainMs = 0L)
          history = Map.empty
      }
      noteDvForms()
      check()
      if (history.nonEmpty) {
        val (hv, hm) = history.toSeq(rnd.nextInt(history.size))
        val got = DeltaLog.read(spark, t, Some(hv)).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        assert(got == hm, s"time travel v$hv diverged")
      }
    }

    assert(sawInline && sawFileDv,
      s"run must exercise both DV storage forms: inline=$sawInline file=$sawFileDv")
    // the mapped-table protocol still carries both features at the end
    val p = DeltaLog.snapshot(spark, t).protocol
    assert(p.readerFeatures.contains("deletionVectors") &&
      p.readerFeatures.contains("columnMapping"))
  }

  test("delta.appendOnly=true: appends + OPTIMIZE keep working, every " +
    "row-removing operation is refused") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-ao").resolve("t").toString
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    DeltaMaintenance.setTblProperties(spark, t,
      Map("delta.appendOnly" -> "true"))
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, SaveMode.Append)
    intercept[UnsupportedOperationException](
      DeltaDml.delete(spark, t, col("id") === 1))
    intercept[UnsupportedOperationException](
      DeltaDml.update(spark, t, col("id") === 1, Seq("s" -> lit("x"))))
    intercept[UnsupportedOperationException](
      DeltaDml.merge(spark, t, Seq((1, "z")).toDF("id", "s"),
        col("t.id") === col("s.id"), matchedDelete = Some(lit(true))))
    intercept[UnsupportedOperationException](
      DeltaWrite.write(Seq((9, "z")).toDF("id", "s"), t, SaveMode.Overwrite))
    intercept[UnsupportedOperationException](
      DeltaMaintenance.restore(spark, t, 0L))
    // insert-only MERGE is an append — allowed
    DeltaDml.merge(spark, t, Seq((4, "d")).toDF("id", "s"),
      col("t.id") === col("s.id"), insert = true)
    // compaction removes FILES, not rows (dataChange=false) — allowed
    DeltaMaintenance.compact(spark, t)
    assert(DeltaLog.read(spark, t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
  }

  test("unsupported writerFeatures refuse writes but not reads; a " +
    "defined column invariant refuses writes") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-wf").resolve("t").toString
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t)
    // rewrite the protocol into a foreign shape listing a writer
    // feature this engine does NOT implement (rowTracking moved to the
    // supported set in r5, so icebergCompatV2 is the unknown probe now)
    val log = java.nio.file.Paths.get(s"$t/_delta_log")
    val v1 = log.resolve(f"${1L}%020d.json")
    java.nio.file.Files.writeString(v1,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV2","invariants"]}}""")
    assert(DeltaLog.read(spark, t).count() == 1, "reads stay open")
    val e = intercept[UnsupportedOperationException](
      DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t, SaveMode.Append))
    assert(e.getMessage.contains("[icebergCompatV2]"),
      s"refusal names the unknown feature only: ${e.getMessage}")
    intercept[UnsupportedOperationException](
      DeltaDml.delete(spark, t, col("id") === 1))

    // invariants: the FEATURE alone is fine; a DEFINED invariant refuses
    val t2 = Files.createTempDirectory("graft-inv").resolve("t").toString
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s"), t2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.invariants",
            """{"expression":{"expression":"id > 0"}}""").build()),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val schemaJson = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$t2/_delta_log").resolve(f"${1L}%020d.json"),
      s"""{"metaData":{"id":"inv","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""")
    assert(DeltaLog.read(spark, t2).count() == 1)
    val e2 = intercept[UnsupportedOperationException](
      DeltaWrite.write(Seq((2, "b")).toDF("id", "s"), t2, SaveMode.Append))
    assert(e2.getMessage.contains("invariant"), e2.getMessage)
  }
}
