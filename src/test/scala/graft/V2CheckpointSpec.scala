package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaDml, DeltaDv, DeltaLog, DeltaMaintenance, DeltaWrite}

/** V2 checkpoint specs: manifest + sidecar layout, protocol feature
  * upgrade, bootstrap after log cleanup, deletion-vector round-trip
  * through sidecars, and the refuse-partial-manifest guard. */
class V2CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-v2ckpt-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    Files.createTempDirectory("graft-v2ckpt").resolve("t").toString

  private def logNames(t: String): Seq[String] = {
    val d = new java.io.File(s"$t/_delta_log")
    d.listFiles().map(_.getName).toSeq.sorted
  }

  test("v2 checkpoint: manifest + sidecars bootstrap a cleaned log") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s"), t, mode = SaveMode.Append)
    DeltaWrite.write(Seq((4, "d")).toDF("id", "s"), t, mode = SaveMode.Append)

    val v = DeltaWrite.checkpointV2(spark, t, sidecars = 2)
    // the protocol upgrade commit bumped the version before checkpointing
    assert(v == 3L)
    val names = logNames(t)
    assert(names.exists(n => n.matches("\\d{20}\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet")),
      s"expected a v2 manifest, got $names")
    assert(new java.io.File(s"$t/_delta_log/_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)

    val removed = DeltaMaintenance.cleanupLog(spark, t)
    assert(removed == 4, "create + 2 appends + upgrade commits cleaned")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol.readerFeatures.contains("v2Checkpoint"))
    assert(snap.protocol.writerFeatures.contains("v2Checkpoint"))
    assert(DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))

    // the table stays writable and replayable past the v2 bootstrap
    DeltaWrite.write(Seq((5, "e")).toDF("id", "s"), t, mode = SaveMode.Append)
    assert(DeltaLog.read(spark, t).count() == 5L)
  }

  test("v2 checkpoint round-trips deletion vectors through sidecars") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "s").coalesce(1), t)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    val r = DeltaDml.delete(spark, t, col("id") === 2)
    assert(r.rewrittenFiles == 0, "merge-on-read delete expected")

    DeltaWrite.checkpointV2(spark, t)
    DeltaMaintenance.cleanupLog(spark, t)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.flatMap(_.dv).map(_.cardinality) == Seq(1L),
      "dv descriptor must survive the sidecar round-trip")
    assert(snap.protocol.readerFeatures.toSet ==
      Set("deletionVectors", "v2Checkpoint"),
      "the upgrade must PRESERVE the dv feature")
    assert(DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (3, "c"), (4, "d")))
  }

  test("incremental v2 checkpoints REUSE unchanged sidecars") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s").coalesce(1), t)
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaWrite.checkpointV2(spark, t, sidecars = 3)
    val scDir = new java.io.File(s"$t/_delta_log/_sidecars")
    def sidecarNames(): Set[String] =
      scDir.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val after1 = sidecarNames()

    DeltaWrite.write(Seq((4, "d")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaWrite.checkpointV2(spark, t, sidecars = 3)
    val fresh = sidecarNames() -- after1
    // one new data file lands in exactly one bucket: at most one sidecar
    // is rewritten, the rest are REFERENCED from the prior checkpoint
    assert(fresh.size <= 1, s"expected at most one rewritten sidecar, got $fresh")
    val manifests = logNames(t)
      .filter(_.matches("""\d{20}\.checkpoint\.[0-9a-fA-F-]{36}\.parquet"""))
      .sorted
    assert(manifests.size == 2)
    val refs = spark.read.parquet(s"$t/_delta_log/${manifests.last}")
      .select("sidecar").collect()
      .filter(!_.isNullAt(0)).map(_.getStruct(0).getAs[String]("path")).toSet
    assert((refs -- fresh).subsetOf(after1) && (refs & after1).nonEmpty,
      "the new manifest must reference prior sidecars")
    // and the reused layout still reads correctly after cleanup
    DeltaMaintenance.cleanupLog(spark, t)
    assert(DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
  }

  test("incremental v2 checkpoints reuse sidecars holding 'u' and " +
    "inline DV descriptors (serialized-form content keys)") {
    import graft.sources.{DeltaDml, DeltaDv, DeltaMaintenance}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write((1 to 2000).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1), t)
    DeltaWrite.write(Seq((9001, "x"), (9002, "y")).toDF("id", "s")
      .coalesce(1), t, mode = SaveMode.Append)
    DeltaMaintenance.setTblProperties(spark, t, Map(DeltaDv.Property -> "true"))
    DeltaDml.delete(spark, t, col("id") % 2 === 0) // big file -> 'u' vector
    DeltaDml.delete(spark, t, col("id") === 9001)  // small file -> inline
    val dvs = DeltaLog.snapshot(spark, t).files.flatMap(_.dv)
    assert(dvs.map(_.storageType).sorted == Seq("i", "u"), "both forms live")

    DeltaWrite.checkpointV2(spark, t, sidecars = 3)
    val scDir = new java.io.File(s"$t/_delta_log/_sidecars")
    def sidecarNames(): Set[String] =
      scDir.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val after1 = sidecarNames()

    // an unrelated append must not rewrite the DV'd entries' buckets —
    // before the serialized-form key fix, EVERY bucket holding a 'u' or
    // 'i' descriptor failed its content match and was rewritten
    DeltaWrite.write(Seq((9100, "z")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaWrite.checkpointV2(spark, t, sidecars = 3)
    val fresh = sidecarNames() -- after1
    assert(fresh.size <= 1,
      s"DV'd buckets must match their prior sidecars, got rewrites: $fresh")
    // the layout still reads right after cleanup: 1000 odd survivors +
    // the appended z (9002 fell to the even-delete, 9001 to the second)
    DeltaMaintenance.cleanupLog(spark, t)
    assert(DeltaLog.read(spark, t).count() == 1001)
  }

  test("REPL dispatch: CHECKPOINT ... V2 SIDECARS n and CLEANUP LOG") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    val msg = DeltaDml.dispatchMaintenance(spark, s"CHECKPOINT `$t` V2 SIDECARS 2")
    assert(msg.exists(_.contains("(v2)")), s"got $msg")
    assert(new java.io.File(s"$t/_delta_log/_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    val cl = DeltaDml.dispatchMaintenance(spark, s"CLEANUP LOG `$t`")
    assert(cl.exists(_.startsWith("cleaned ")), s"got $cl")
    assert(DeltaLog.read(spark, t).count() == 2L)
    // classic form still routes
    val m2 = DeltaDml.dispatchMaintenance(spark, s"CHECKPOINT `$t`")
    assert(m2.exists(m => m.contains("checkpointed") && !m.contains("(v2)")))
  }

  test("JSON-manifest v2 checkpoints bootstrap, reuse sidecars across " +
    "forms, and interoperate with DML + cleaned logs") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a")).toDF("id", "s").coalesce(1), t)
    DeltaWrite.write(Seq((2, "b")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaWrite.write(Seq((3, "c")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaDml.delete(spark, t, col("id") === 2)

    DeltaWrite.checkpointV2(spark, t, sidecars = 3, manifestFormat = "json")
    assert(logNames(t).exists(
      _.matches("""\d{20}\.checkpoint\.[0-9a-fA-F-]{36}\.json""")),
      s"expected a JSON v2 manifest, got ${logNames(t)}")
    val scDir = new java.io.File(s"$t/_delta_log/_sidecars")
    def sidecarNames(): Set[String] =
      scDir.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val after1 = sidecarNames()

    // a cleaned log bootstraps purely from the JSON manifest + sidecars
    DeltaMaintenance.cleanupLog(spark, t)
    assert(DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (3, "c")))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocol.readerFeatures.contains("v2Checkpoint"))

    // the table stays writable; the NEXT checkpoint (parquet form this
    // time) reuses the JSON manifest's unchanged sidecars
    DeltaWrite.write(Seq((4, "d")).toDF("id", "s").coalesce(1), t,
      mode = SaveMode.Append)
    DeltaWrite.checkpointV2(spark, t, sidecars = 3)
    val fresh = sidecarNames() -- after1
    assert(fresh.size <= 1,
      s"cross-form sidecar reuse failed, rewrote $fresh")
    DeltaMaintenance.cleanupLog(spark, t)
    assert(DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (3, "c"), (4, "d")))
  }

  test("foreign non-reconciled manifests: JSON and parquet forms yield " +
    "the SAME live set (checkpoint removes are vacuum tombstones, not " +
    "pending deletes — ADVICE r6 interop hole)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    def freshTable(): (String, Seq[(String, Long)], String, String) = {
      import spark.implicits._
      val t = tmpTable()
      DeltaWrite.write(Seq((1, "a")).toDF("id", "s").coalesce(1), t)
      DeltaWrite.write(Seq((2, "b")).toDF("id", "s").coalesce(1), t,
        mode = SaveMode.Append)
      val files = DeltaLog.snapshot(spark, t).files.map(f => (f.path, f.size))
        .sortBy(_._1)
      val v0 = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        t, "_delta_log", "00000000000000000000.json")).asScala
      val md = v0.find(_.contains("\"metaData\"")).get
      val proto = v0.find(_.contains("\"protocol\"")).get
      (t, files, md, proto)
    }
    def wipeLog(t: String): java.io.File = {
      val d = new java.io.File(s"$t/_delta_log")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      d.listFiles().foreach(rm)
      d
    }
    def liveAndRows(t: String): (Set[String], Set[(Int, String)]) = {
      import spark.implicits._
      val snap = DeltaLog.snapshot(spark, t)
      (snap.files.map(_.path).toSet,
        DeltaLog.read(spark, t).as[(Int, String)].collect().toSet)
    }

    // ---- JSON-manifest form: add A, add B, remove B (a foreign writer
    // that kept B's tombstone without reconciling it against B's add)
    val (tj, filesJ, mdJ, protoJ) = freshTable()
    val Seq((fa, sa), (fb, sb)) = filesJ
    val dirJ = wipeLog(tj)
    val manifestJ = new java.io.File(dirJ,
      f"${1L}%020d.checkpoint.${java.util.UUID.randomUUID()}.json")
    val linesJ = Seq(protoJ, mdJ,
      s"""{"add":{"path":"$fa","size":$sa,"dataChange":false}}""",
      s"""{"add":{"path":"$fb","size":$sb,"dataChange":false}}""",
      s"""{"remove":{"path":"$fb","dataChange":false,"deletionTimestamp":0}}""")
    java.nio.file.Files.write(manifestJ.toPath,
      linesJ.mkString("", "\n", "\n").getBytes("UTF-8"))
    val (liveJson, rowsJson) = liveAndRows(tj)

    // ---- parquet-manifest form: the SAME action set
    val (tp, filesP, mdP, protoP) = freshTable()
    val Seq((pa, psa), (pb, psb)) = filesP
    val dirP = wipeLog(tp)
    val mdNode = mapper.readTree(mdP).get("metaData")
    val protoNode = mapper.readTree(protoP).get("protocol")
    val addT = StructType(Seq(StructField("path", StringType),
      StructField("size", LongType), StructField("stats", StringType)))
    val rmT = StructType(Seq(StructField("path", StringType)))
    val mdT = StructType(Seq(StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoT = StructType(Seq(StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val ckptT = StructType(Seq(StructField("add", addT),
      StructField("remove", rmT), StructField("metaData", mdT),
      StructField("protocol", protoT)))
    val rows = Seq(
      Row(null, null, null, Row(protoNode.get("minReaderVersion").asInt(),
        protoNode.get("minWriterVersion").asInt())),
      Row(null, null, Row(mdNode.get("id").asText(),
        mdNode.get("schemaString").asText(), Seq.empty[String],
        Map.empty[String, String]), null),
      Row(Row(pa, psa, null), null, null, null),
      Row(Row(pb, psb, null), null, null, null),
      Row(null, Row(pb), null, null))
    val stage = Files.createTempDirectory("graft-foreign-ckpt").toString
    spark.createDataFrame(rows.asJava, ckptT).repartition(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(dirP,
      f"${1L}%020d.checkpoint.${java.util.UUID.randomUUID()}.parquet").toPath)
    val (liveParq, rowsParq) = liveAndRows(tp)

    // both forms: the remove tombstone must NOT shrink the live set
    assert(liveJson == Set(fa, fb),
      s"JSON manifest applied the tombstone: $liveJson")
    assert(liveParq == Set(pa, pb),
      s"parquet manifest applied the tombstone: $liveParq")
    assert(rowsJson == Set((1, "a"), (2, "b")) && rowsParq == rowsJson,
      s"divergent data: json=$rowsJson parquet=$rowsParq")
  }

  test("a FOREIGN table declaring delta.checkpointPolicy=v2 gets the V2 " +
    "manifest form from the CLASSIC checkpoint entry point — our " +
    "maintenance on another writer's v2-policy table writes the form " +
    "its other readers expect (VERDICT r13 item 9)") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s").coalesce(1), t)
    // hand-rebuild version 0 as a foreign commit: protocol already
    // carrying v2Checkpoint features, metaData configuration already
    // carrying the policy — OUR writer never set either
    val v0 = java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.json")
    val lines = java.nio.file.Files.readAllLines(v0).asScala.toSeq
    val md = lines.find(_.contains("\"metaData\"")).get
    assert(md.contains("\"configuration\":{}"),
      "fixture drift: expected an empty configuration to inject into")
    val md2 = md.replace("\"configuration\":{}",
      "\"configuration\":{\"delta.checkpointPolicy\":\"v2\"}")
    val proto2 = """{"protocol":{"minReaderVersion":3,""" +
      """"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],""" +
      """"writerFeatures":["v2Checkpoint"]}}"""
    val rest = lines.filterNot(l =>
      l.contains("\"metaData\"") || l.contains("\"protocol\""))
    java.nio.file.Files.write(v0,
      (proto2 +: md2 +: rest).mkString("", "\n", "\n").getBytes("UTF-8"))

    DeltaWrite.checkpoint(spark, t) // the CLASSIC entry point
    val names = logNames(t)
    assert(names.exists(_.matches(
      """\d{20}\.checkpoint\.[0-9a-fA-F-]{36}\.(parquet|json)""")),
      s"v2 policy must route the classic entry point to the V2 form: $names")
    assert(!names.exists(_.matches("""\d{20}\.checkpoint\.parquet""")),
      s"a classic one-shot checkpoint would surprise the table's " +
        s"other V2 readers: $names")
    // and the checkpointed table still reads through the V2 path
    DeltaMaintenance.cleanupLog(spark, t)
    assert(DeltaLog.read(spark, t).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("a manifest referencing a missing sidecar is refused loudly") {
    import spark.implicits._
    val t = tmpTable()
    DeltaWrite.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    DeltaWrite.checkpointV2(spark, t)
    DeltaMaintenance.cleanupLog(spark, t)
    new java.io.File(s"$t/_delta_log/_sidecars").listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val e = intercept[IllegalStateException](DeltaLog.snapshot(spark, t))
    assert(e.getMessage.contains("missing sidecar"),
      s"wrong failure: ${e.getMessage}")
  }
}
