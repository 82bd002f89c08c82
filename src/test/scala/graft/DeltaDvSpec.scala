package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaCdf, DeltaChanges, DeltaDml, DeltaDv, DeltaLog, DeltaMaintenance, DeltaWrite}

/** Deletion-vector (merge-on-read DELETE) specs: no-rewrite deletes,
  * vector merging, time travel and RESTORE across DV-only changes,
  * copy-on-write interplay (UPDATE/OPTIMIZE purge vectors), checkpoint
  * round-trip, vacuum safety, CDF and multiset-diff change feeds, and
  * the protocol/feature gates. */
class DeltaDvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dv-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-dv").resolve("t").toString

  /** (id, s) rows of a table, sorted. */
  private def rows(t: String): Seq[(Int, String)] = {
    import spark.implicits._
    DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq
  }

  private def dataFilePaths(t: String): Set[String] =
    DeltaLog.snapshot(spark, t).files.map(_.path).toSet

  private def newDvTable(): String = {
    val t = tmpTable()
    import spark.implicits._
    DeltaWrite.write(
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "s").coalesce(1), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    t
  }

  /** Surviving ids of a big table, as (count, sum) — a content check a
    * wrong-positions DV bug cannot pass, unlike a bare count. */
  private def idStats(t: String): (Long, Long) = {
    val r = DeltaLog.read(spark, t)
      .agg(count(lit(1)), sum(col("id"))).head
    (r.getLong(0), r.getLong(1))
  }

  /** A 2000-row one-file table: deleting every other row serializes
    * well past the inline threshold, forcing the file-backed 'u' form. */
  private def newBigDvTable(): String = {
    val t = tmpTable()
    import spark.implicits._
    DeltaWrite.write(
      (1 to 2000).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    t
  }

  test("our own DV commits use the protocol's relocatable 'u' form past " +
    "the inline threshold; a foreign PREFIX-LESS 'u' (uuid file at the " +
    "table root) reads too; the table survives a plain directory move") {
    import graft.sources.RoaringDv
    val t = newBigDvTable()
    DeltaDml.delete(spark, t, col("id") % 2 === 0) // 1000 positions >> inline
    val d = DeltaLog.snapshot(spark, t).files.flatMap(_.dv).head
    assert(d.storageType == "u", "writer must emit the relocatable form")
    assert(d.raw.startsWith(DeltaDv.DvDir) && d.raw.length ==
      DeltaDv.DvDir.length + 20, s"prefix + 20-char z85 uuid, got ${d.raw}")
    assert(d.path == RoaringDv.relativeDvPath(d.raw) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(t, d.path)),
      "descriptor derives to the file the writer produced")
    assert(idStats(t) == ((1000L, 1000000L)), "exactly the odd ids survive")

    // relocatable for real: MOVE the whole table directory — every
    // reference (data + DV) must survive with no rewrite
    val t2 = tmpTable()
    java.nio.file.Files.move(java.nio.file.Paths.get(t),
      java.nio.file.Paths.get(t2))
    graft.Tables.invalidate()
    assert(idStats(t2) == ((1000L, 1000000L)),
      "an absolute 'p' reference would dangle after the move")

    // foreign prefix-less variant: uuid file directly at the table root
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = RoaringDv.z85Encode(bb.array())
    java.nio.file.Files.copy(java.nio.file.Paths.get(t2, d.path),
      java.nio.file.Paths.get(t2, s"deletion_vector_$uuid.bin"))
    val commit = java.nio.file.Paths.get(s"$t2/_delta_log/" + f"${2L}%020d.json")
    java.nio.file.Files.writeString(commit,
      java.nio.file.Files.readString(commit)
        .replace(s""""pathOrInlineDv":"${d.raw}"""",
          s""""pathOrInlineDv":"$enc""""))
    val d2 = DeltaLog.snapshot(spark, t2).files.flatMap(_.dv).head
    assert(d2.path == s"deletion_vector_$uuid.bin",
      "prefix-less 'u' derives to the root-level file")
    assert(idStats(t2) == ((1000L, 1000000L)))
  }

  test("MOR delete removes rows WITHOUT rewriting data files; history " +
    "time-travels; a second delete merges positions") {
    val t = newDvTable()
    val before = dataFilePaths(t)
    val r = DeltaDml.delete(spark, t, col("id") === 2)
    assert(r.affectedRows == 1L && r.rewrittenFiles == 0)
    assert(rows(t) == Seq((1, "a"), (3, "c"), (4, "d")))
    assert(dataFilePaths(t) == before, "data files must be untouched")
    val dv = DeltaLog.snapshot(spark, t).files.flatMap(_.dv)
    assert(dv.map(_.cardinality) == Seq(1L))

    // second delete on the SAME file: positions union, cardinality grows
    val r2 = DeltaDml.delete(spark, t, col("id") >= 3)
    assert(r2.affectedRows == 2L)
    assert(rows(t) == Seq((1, "a")))
    val dv2 = DeltaLog.snapshot(spark, t).files.flatMap(_.dv)
    assert(dv2.map(_.cardinality) == Seq(3L))

    // time travel sees every pre-delete state
    import spark.implicits._
    assert(DeltaLog.read(spark, t, Some(r.version)).as[(Int, String)]
      .collect().sorted.toSeq == Seq((1, "a"), (3, "c"), (4, "d")))
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 4)

    // deleting nothing commits nothing
    val r3 = DeltaDml.delete(spark, t, col("id") === 99)
    assert(r3.version == r2.version && r3.affectedRows == 0L)
  }

  test("MOR UPDATE vectors old versions and appends only updated rows; " +
    "OPTIMIZE purges vectors physically") {
    val t = newDvTable()
    DeltaDml.delete(spark, t, col("id") === 2)
    val before = dataFilePaths(t)
    val r = DeltaDml.update(spark, t, col("id") === 1, Seq("s" -> lit("A")))
    assert(r.affectedRows == 1L && r.rewrittenFiles == 0)
    assert(rows(t) == Seq((1, "A"), (3, "c"), (4, "d")))
    val snap = DeltaLog.snapshot(spark, t)
    // original file survives with BOTH positions vectored (delete + old
    // version of the updated row); ONE new file holds the updated row
    assert(snap.files.map(_.path).toSet.intersect(before) == before)
    assert(snap.files.flatMap(_.dv).map(_.cardinality) == Seq(2L))
    assert(snap.files.size == before.size + 1)
    // time travel: pre-update still shows the old value
    import spark.implicits._
    assert(DeltaLog.read(spark, t, Some(r.version - 1)).as[(Int, String)]
      .collect().toSet.contains((1, "a")))

    // OPTIMIZE rewrites through the DV filter and retires descriptors
    DeltaMaintenance.compact(spark, t, smallFileBytes = 1L << 30)
    assert(rows(t) == Seq((1, "A"), (3, "c"), (4, "d")))
    assert(DeltaLog.snapshot(spark, t).files.flatMap(_.dv).isEmpty)
  }

  test("MOR MERGE vectors acted rows and appends updates+inserts; " +
    "kept rows never rewrite") {
    val t = newDvTable()
    import spark.implicits._
    val before = dataFilePaths(t)
    val source = Seq((2, "B", 0), (3, "x", 1), (9, "z", 0)).toDF("id", "s", "del")
    val m = DeltaDml.merge(spark, t, source,
      condition = col("t.id") === col("s.id"),
      matchedUpdate = Seq("s" -> col("s.s")),
      matchedDelete = Some(col("s.del") === 1),
      insert = true)
    assert(m.updatedRows == 1L && m.deletedRows == 1L && m.insertedRows == 1L)
    assert(m.rewrittenFiles == 0)
    assert(rows(t) == Seq((1, "a"), (2, "B"), (4, "d"), (9, "z")))
    val snap = DeltaLog.snapshot(spark, t)
    // original file survives vectored (old id=2 version + deleted id=3)
    assert(before.subsetOf(snap.files.map(_.path).toSet))
    assert(snap.files.flatMap(_.dv).map(_.cardinality) == Seq(2L))
    // time travel sees the pre-merge state
    assert(DeltaLog.read(spark, t, Some(m.version - 1)).count() == 4)
    // ambiguity still rejected under the (file, pos) identity
    intercept[IllegalStateException] {
      DeltaDml.merge(spark, t, Seq((2, "y", 0), (2, "w", 0)).toDF("id", "s", "del"),
        condition = col("t.id") === col("s.id"),
        matchedUpdate = Seq("s" -> col("s.s")))
    }
  }

  test("RESTORE reinstates the pre-delete DV state even though file " +
    "paths never changed") {
    val t = newDvTable()
    val v0 = DeltaLog.latestVersion(spark, t)
    DeltaDml.delete(spark, t, col("id") === 2)
    DeltaMaintenance.restore(spark, t, v0)
    assert(rows(t) == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
  }

  test("checkpoint round-trips descriptors; vacuum never deletes a live " +
    "sidecar but collects superseded ones") {
    val t = newBigDvTable()
    DeltaDml.delete(spark, t, col("id") % 2 === 0) // sidecar 1 (file-backed)
    DeltaWrite.checkpoint(spark, t)
    DeltaMaintenance.cleanupLog(spark, t)
    graft.Tables.invalidate()
    assert(idStats(t) == ((1000L, 1000000L)),
      "descriptor must survive checkpoint bootstrap")

    DeltaDml.delete(spark, t, col("id") % 3 === 0) // sidecar 2 supersedes 1
    val deleted = DeltaMaintenance.vacuum(spark, t, retainMs = 0L)
    assert(deleted >= 1, "superseded sidecar should be vacuumable")
    // survivors: odd, non-multiples of 3 — sum is the content witness
    val expect = (1 to 2000).filter(i => i % 2 == 1 && i % 3 != 0)
    assert(idStats(t) == ((expect.size.toLong, expect.map(_.toLong).sum)),
      "live sidecar must survive")
  }

  test("change feeds see MOR deletes: cdc images when CDF is on, the " +
    "multiset diff when not") {
    // without CDF: rowChanges diffs old-DV vs new-DV states
    val t = newDvTable()
    val r = DeltaDml.delete(spark, t, col("id") === 2)
    val diff = DeltaChanges.rowChanges(spark, t, r.version)
      .select("id", "_change_type").collect()
      .map(x => (x.getInt(0), x.getString(1))).toSeq
    assert(diff == Seq((2, "delete")))

    // with CDF: exact delete images in cdc files; MOR update writes
    // true pre/post images
    val t2 = newDvTable()
    DeltaMaintenance.setTblProperties(spark, t2, Map(DeltaCdf.Property -> "true"))
    val r2 = DeltaDml.delete(spark, t2, col("id") >= 3)
    val feed = DeltaCdf.tableChanges(spark, t2, r2.version, Some(r2.version))
      .select("id", "_change_type").collect()
      .map(x => (x.getInt(0), x.getString(1))).toSeq.sorted
    assert(feed == Seq((3, "delete"), (4, "delete")))
    val r3 = DeltaDml.update(spark, t2, col("id") === 1, Seq("s" -> lit("A")))
    val upd = DeltaCdf.tableChanges(spark, t2, r3.version, Some(r3.version))
      .select("id", "s", "_change_type").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSet
    assert(upd == Set((1, "a", "update_preimage"), (1, "A", "update_postimage")))
  }

  test("shallow clone of a vectored table keeps deletes; protocol gates: " +
    "reader v3 accepted, v4 rejected, foreign DV encodings rejected") {
    val t = newDvTable()
    DeltaDml.delete(spark, t, col("id") === 2)
    val c = tmpTable()
    DeltaMaintenance.shallowClone(spark, t, c)
    assert(rows(c) == Seq((1, "a"), (3, "c"), (4, "d")))

    // protocol v4 unreadable; a 'u'-typed (roaring bitmap) DV rejected
    val fs = DeltaLog.logDir(t).getFileSystem(spark.sessionState.newHadoopConf())
    def writeTable(lines: Seq[String]): String = {
      val p = tmpTable()
      val dir = DeltaLog.logDir(p)
      fs.mkdirs(dir)
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, f"${0L}%020d.json"), true)
      try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
      p
    }
    val schemaJson = DeltaLog.snapshot(spark, t).schema.json
      .replace("\"", "\\\"")
    val v4 = writeTable(Seq(
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}"""))
    intercept[UnsupportedOperationException] { DeltaLog.snapshot(spark, v4) }
    // all three protocol forms ('p'/'u'/'i') read now; an UNKNOWN
    // storage form still fails loudly, never as zero deletions
    val xDv = writeTable(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      """{"add":{"path":"f.parquet","size":1,"dataChange":true,"partitionValues":{},"deletionVector":{"storageType":"x","pathOrInlineDv":"ab^-aqEH.-EGao","sizeInBytes":40,"cardinality":6}}}"""))
    intercept[UnsupportedOperationException] { DeltaLog.snapshot(spark, xDv) }

    // reader-3 TABLE FEATURE gate: an unimplemented reader feature must
    // refuse the table (version gating alone passes every feature table);
    // no-read-behavior features (vacuumProtocolCheck) must NOT refuse it
    val unknownFeature = writeTable(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations"],"writerFeatures":["collations"]}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}"""))
    val e = intercept[UnsupportedOperationException] {
      DeltaLog.snapshot(spark, unknownFeature)
    }
    assert(e.getMessage.contains("collations"), e.getMessage)
    val vacuumOk = writeTable(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck","timestampNtz"],"writerFeatures":["vacuumProtocolCheck","timestampNtz"]}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}"""))
    assert(DeltaLog.snapshot(spark, vacuumOk).files.isEmpty)
    // unknown WRITER-only features never block reads
    val writerOnly = writeTable(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors","rowTracking","icebergCompatV2"]}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}"""))
    assert(DeltaLog.snapshot(spark, writerOnly).files.isEmpty)
  }

  test("small deletes INLINE their vector ('i'): no sidecar file at all, " +
    "commit JSON omits offset, a second MOR delete merges the inline " +
    "positions") {
    val t = newDvTable()
    DeltaDml.delete(spark, t, col("id") === 2)
    val d = DeltaLog.snapshot(spark, t).files.flatMap(_.dv).head
    assert(d.storageType == "i", "a 1-position vector must inline")
    assert(d.cardinality == 1L && d.raw.nonEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, DeltaDv.DvDir)),
      "no DV directory should exist for inline-only commits")
    val commit = java.nio.file.Paths.get(s"$t/_delta_log/" + f"${2L}%020d.json")
    val json = java.nio.file.Files.readString(commit)
    assert(json.contains("\"storageType\":\"i\"") && !json.contains("\"offset\""),
      "protocol: inline descriptors carry no offset")
    assert(rows(t) == Seq((1, "a"), (3, "c"), (4, "d")),
      "inline vector applies without any DV file")
    // merging on top of an inline vector: existing positions decode
    // from the payload and union with the new delete
    DeltaDml.delete(spark, t, col("id") === 3)
    assert(rows(t) == Seq((1, "a"), (4, "d")))
    assert(DeltaLog.snapshot(spark, t).files.flatMap(_.dv)
      .head.cardinality == 2L)
  }

  test("'u' descriptors round-trip checkpoints unchanged; shallow clone " +
    "rewrites them to absolute 'p' (source-relative 'u' would dangle); " +
    "inline descriptors clone as-is") {
    val t = newBigDvTable()
    DeltaDml.delete(spark, t, col("id") % 2 === 0)
    val d = DeltaLog.snapshot(spark, t).files.flatMap(_.dv).head
    assert(d.storageType == "u")

    // checkpoint re-serializes the add — the descriptor must stay 'u'
    // with the ORIGINAL payload (a relative path under 'p' would
    // mis-resolve in foreign readers)
    DeltaWrite.checkpoint(spark, t)
    val d1 = DeltaLog.snapshot(spark, t).files.flatMap(_.dv).head
    assert(d1.storageType == "u" && d1.rawOrPath == d.raw,
      s"checkpoint must preserve the 'u' form, got ${d1.storageType}/${d1.rawOrPath}")
    assert(idStats(t) == ((1000L, 1000000L)))

    val c = tmpTable()
    DeltaMaintenance.shallowClone(spark, t, c)
    val dc = DeltaLog.snapshot(spark, c).files.flatMap(_.dv).head
    assert(dc.storageType == "p" && new org.apache.hadoop.fs.Path(dc.rawOrPath).isAbsolute,
      s"clone must absolutize to 'p', got ${dc.storageType}/${dc.rawOrPath}")
    assert(idStats(c) == ((1000L, 1000000L)))

    // an inline-vectored table clones without any rewrite
    val t2 = newDvTable()
    DeltaDml.delete(spark, t2, col("id") === 2)
    val c2 = tmpTable()
    DeltaMaintenance.shallowClone(spark, t2, c2)
    assert(DeltaLog.snapshot(spark, c2).files.flatMap(_.dv).head.inline)
    assert(rows(c2) == Seq((1, "a"), (3, "c"), (4, "d")))
  }

  test("DV + column mapping combine: MOR DELETE/UPDATE on a renamed " +
    "(name-mapped) table match copy-on-write results") {
    import graft.sources.DeltaSchema
    val t = newDvTable()
    DeltaDml.delete(spark, t, col("id") === 2) // live DV BEFORE mapping
    DeltaSchema.enableColumnMapping(spark, t)
    DeltaSchema.renameColumn(spark, t, "s", "label")
    assert(rows(t) == Seq((1, "a"), (3, "c"), (4, "d")),
      "physical-name scan and the DV anti-join are orthogonal")
    DeltaDml.delete(spark, t, col("label") === "c") // MOR on mapped table
    assert(rows(t) == Seq((1, "a"), (4, "d")))
    DeltaDml.update(spark, t, col("id") === 4, Seq("label" -> lit("D")))
    assert(rows(t) == Seq((1, "a"), (4, "D")))
    // protocol carries BOTH features after the mapping upgrade
    val p = DeltaLog.snapshot(spark, t).protocol
    assert(p.minReader == 3 && p.minWriter == 7)
    assert(p.readerFeatures.contains("deletionVectors") &&
      p.readerFeatures.contains("columnMapping"),
      s"feature lists must merge, got ${p.readerFeatures}")
  }

  test("DV commit on a LEGACY (2,5) mapped table re-lists the implied " +
    "columnMapping feature at reader 3 (mapping-first order)") {
    import graft.sources.DeltaSchema
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")
      .coalesce(1), t)
    DeltaSchema.renameColumn(spark, t, "s", "label") // legacy (2,5), no lists
    val p0 = DeltaLog.snapshot(spark, t).protocol
    assert(p0.minReader == 2 && p0.readerFeatures.isEmpty, "legacy fixture")
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    DeltaDml.delete(spark, t, col("id") === 2)
    val p = DeltaLog.snapshot(spark, t).protocol
    assert(p.minReader == 3 &&
      p.readerFeatures.contains("columnMapping") &&
      p.readerFeatures.contains("deletionVectors"),
      s"reader 3 honors ONLY listed features — dropping columnMapping " +
        s"makes foreign readers misread the mapping, got ${p.readerFeatures}")
    assert(p.writerFeatures.contains("columnMapping"))
    assert(rows(t) == Seq((1, "a"), (3, "c")))
  }

  test("MOR UPDATE recomputes unassigned generated columns (no spurious " +
    "constraint veto)") {
    import graft.sources.DeltaGenerated
    import spark.implicits._
    val t = tmpTable()
    DeltaGenerated.create(Seq((1, 10), (2, 20)).toDF("id", "n").coalesce(1), t,
      Map("n2" -> "n * 2"))
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    DeltaDml.update(spark, t, col("id") === 1, Seq("n" -> lit(15)))
    val got = DeltaLog.read(spark, t).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((1, 15, 30), (2, 20, 40)),
      "n2 must follow the n update, unprompted")
    // the old row version is vectored out, not rewritten
    assert(DeltaLog.snapshot(spark, t).files.exists(_.dv.nonEmpty),
      "update went merge-on-read")
  }

  test("current-spec feature gates by NAME (r15, VERDICT r14 item 7): " +
    "catalogOwned refuses reads; checkpointProtection is writer-only — " +
    "reads pass through, writes refuse") {
    val schemaJson = ("""{"type":"struct","fields":[{"name":"id",""" +
      """"type":"long","nullable":true,"metadata":{}}]}""")
      .replace("\"", "\\\"")
    def writeTable(lines: Seq[String]): String = {
      val p = tmpTable()
      val dir = java.nio.file.Paths.get(p, "_delta_log")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(f"${0L}%020d.json"),
        lines.mkString("\n").getBytes("UTF-8"))
      p
    }
    // catalogOwned (catalog-managed commits) is a READER-WRITER feature
    // in the current Delta spec: commits may live in the catalog, not
    // the _delta_log — filesystem replay would silently read a stale
    // table, so the generic reader gate must refuse it by name
    val catOwned = writeTable(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["catalogOwned-preview"],"writerFeatures":["catalogOwned-preview"]}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}"""))
    val e1 = intercept[UnsupportedOperationException] {
      DeltaLog.snapshot(spark, catOwned)
    }
    assert(e1.getMessage.contains("catalogOwned-preview"), e1.getMessage)
    // checkpointProtection is WRITER-ONLY (it constrains checkpoint
    // creation and log cleanup): a reader needs no behavior, so reads
    // pass through the gate; this engine's checkpoint writer does not
    // honor the protected-version rule, so WRITES must refuse by name
    val ckptProt = writeTable(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":[],"writerFeatures":["checkpointProtection"]}}""",
      s"""{"metaData":{"id":"x","schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}"""))
    assert(DeltaLog.snapshot(spark, ckptProt).files.isEmpty,
      "a writer-only feature must never block reads")
    import spark.implicits._
    val e2 = intercept[UnsupportedOperationException] {
      DeltaWrite.write(Seq(1L).toDF("id").coalesce(1), ckptProt,
        SaveMode.Append)
    }
    assert(e2.getMessage.contains("checkpointProtection"), e2.getMessage)
  }
}
