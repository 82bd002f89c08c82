package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Minimal Delta Lake transaction-log reader, from the PUBLIC Delta
  * protocol only (delta.io PROTOCOL.md): a table directory's
  * `_delta_log/` holds ordered JSON commits (`<version % 020d>.json`,
  * one action per line — `add` / `remove` / `metaData` / `protocol` /
  * `commitInfo`) and optional parquet checkpoints
  * (`<v>.checkpoint.parquet` + `_last_checkpoint` pointer). The current
  * snapshot is the log replay: last `metaData` wins, `add` puts a file
  * into the live set, `remove` tombstones it.
  *
  * This is the reference's core abstraction — every read there goes
  * through DuckDB's `delta_scan`
  * (delta-unity-duckdb.js:330,425,496) — re-expressed directly on
  * Spark: replay the log (driver-side METADATA work, bounded by log
  * size, exactly how any Delta client bootstraps), then hand the
  * surviving parquet file list to the distributed scan. Filters and
  * column pruning push into that scan as with any parquet read.
  *
  * Scope (checked, not assumed): reader versions 1-3 — version 2's
  * column mapping in `name` mode, version 3's deletion vectors in the
  * roaring portable format ([[RoaringDv]], [[DvDescriptor]]); anything else is
  * rejected rather than misread. Partitioned tables are supported via
  * hive-style file layout (`col=val/part-….parquet`), which is what
  * [[DeltaWrite]] and Spark's own `partitionBy` produce.
  */
object DeltaLog {

  /** A deletion vector attached to a live file (merge-on-read deletes):
    * `path` is the DV file as recorded (`pathOrInlineDv`, table-relative
    * or absolute), `offset`/`sizeInBytes` locate this file's vector
    * inside it, `cardinality` the number of deleted positions. The
    * physical encoding is the protocol's roaring portable format framed
    * per [[RoaringDv]] (format-version byte, big-endian size, CRC-32);
    * one DV FILE per commit holds every hit file's vector at its own
    * offset — the same multi-vector-per-file shape Delta writes. */
  final case class DvDescriptor(path: String, cardinality: Long,
      offset: Long = 1L, sizeInBytes: Long = 0L,
      storageType: String = "p", raw: String = "") {
    /** The descriptor's ORIGINAL `pathOrInlineDv`, for lossless
      * re-serialization (addAction / checkpoints / clones): a 'u'
      * descriptor must round-trip as 'u' — rewriting it as 'p' with the
      * table-relative resolved path would violate the protocol ('p' is
      * absolute) and mis-resolve in foreign readers. */
    def rawOrPath: String = if (raw.nonEmpty) raw else path
    def inline: Boolean = storageType == "i"
  }

  /** One live data file in a snapshot. `path` is as recorded in the log
    * (relative, percent-encoded per protocol); `stats` is the raw
    * `add.stats` JSON when the writer recorded one (see DataSkipping);
    * `dv` is the file's deletion vector, if any; `baseRowId` /
    * `defaultRowCommitVersion` are the row-tracking fields (fresh row id
    * of row i in the file = baseRowId + i). */
  final case class AddEntry(path: String, size: Long,
      stats: Option[String] = None, dv: Option[DvDescriptor] = None,
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  final case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddEntry],
      tablePath: String,
      /** Last recorded `txn` version per appId (the protocol's streaming
        * transaction identifiers — what makes a replayed micro-batch
        * detectable after a sink restart). */
      txns: Map[String, Long] = Map.empty,
      /** `metaData.configuration` — table properties, notably the
        * `delta.constraints.<name>` CHECK constraints every writer must
        * enforce. */
      configuration: Map[String, String] = Map.empty,
      /** `metaData.id` — the table's STABLE unique identifier (protocol:
        * assigned at creation, preserved by every later metaData commit;
        * external clients treat an id change as "different table"). */
      metaDataId: Option[String] = None,
      /** The table's latest `protocol` action (versions + feature
        * lists) — what a feature-enabling writer must PRESERVE when it
        * upgrades (e.g. adding `inCommitTimestamp` to a deletion-vector
        * table must not drop `deletionVectors`). */
      protocol: TableProtocol = TableProtocol(),
      /** LIVE `domainMetadata` domains (domain → configuration JSON);
        * a replayed `removed: true` tombstone deletes its domain. The
        * row-tracking high-water mark lives in `delta.rowTracking`. */
      domainMetadata: Map[String, String] = Map.empty) {
    /** Absolute (decoded) URIs of the live files. */
    def filePaths: Seq[String] = files.map { a =>
      val decoded = java.net.URLDecoder.decode(a.path, "UTF-8")
      new Path(tablePath, decoded).toString
    }
    /** Column-mapping mode ("none" unless the table opted in). */
    def columnMappingMode: String =
      configuration.getOrElse("delta.columnMapping.mode", "none")
  }

  /** `protocol` action contents: reader/writer versions plus the
    * feature lists the table-features form (reader 3 / writer 7)
    * carries. Defaults are the legacy base protocol. */
  final case class TableProtocol(
      minReader: Int = 1, minWriter: Int = 2,
      readerFeatures: Seq[String] = Nil, writerFeatures: Seq[String] = Nil)

  /** A file's table root: parent directory with trailing hive
    * `col=value` partition segments stripped. For the table's own files
    * this IS the table path; for a shallow clone's entries it is the
    * SOURCE table's root — grouping by it gives each origin its own
    * `basePath`, so hive partition columns resolve per origin instead of
    * failing Spark's "file not under basePath" check. */
  private def fileTableRoot(p: String): String = {
    val segs = p.split("/").dropRight(1)
    segs.reverse.dropWhile(_.contains("=")).reverse.mkString("/")
  }

  /** Scan explicit data files of a snapshot, column-mapping aware: under
    * `name` mode the parquet holds PHYSICAL column names (from each
    * field's `delta.columnMapping.physicalName` metadata) and the result
    * is projected back to logical names; other mapped modes are rejected
    * rather than silently read as all-NULL columns. Every path that
    * reads a mapped table's files (read / readWhere / the change feeds /
    * DML hit reads) must go through here. Files may live OUTSIDE the
    * table directory (shallow clones) — they are read in per-origin
    * groups, each with its own basePath. */
  /** [[scanFiles]] for callers outside this package (the streaming
    * source): explicit files of `snap` read DV- and mapping-aware. */
  private[graft] def readFiles(spark: SparkSession, snap: Snapshot,
      paths: Seq[String]): DataFrame = scanFiles(spark, snap, paths)

  private[sources] def scanFiles(spark: SparkSession, snap: Snapshot,
      paths: Seq[String]): DataFrame =
    if (paths.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[Row](), snap.schema)
    else {
      val ordered = snap.schema.fieldNames.toIndexedSeq
        .map(n => org.apache.spark.sql.functions.col(s"`$n`"))
      scanFilesWithMeta(spark, snap, paths).select(ordered: _*)
    }

  /** [[scanFiles]] plus the physical provenance columns `__file`
    * (qualified file URI) and `__pos` (row index within the file) —
    * what DML hit detection and deletion-vector writes key on. */
  private[sources] def scanFilesWithMeta(spark: SparkSession, snap: Snapshot,
      paths: Seq[String]): DataFrame = {
    val mode = snap.columnMappingMode
    if (mode != "none" && mode != "name" && mode != "id")
      throw new UnsupportedOperationException(
        s"column mapping mode '$mode' not supported (none/name/id)")
    require(paths.nonEmpty, "scanFilesWithMeta needs at least one file")
    import org.apache.spark.sql.functions.col
    // Hive partition discovery may reorder partition columns to the end
    // of a group's output — every group is pinned to the snapshot's
    // column order (plus the provenance columns, taken from the scan's
    // _metadata before any projection) so unions and positional
    // consumers see ONE deterministic schema regardless of file layout.
    val metaCols = Seq(col("_metadata.file_path").as("__file"),
      col("_metadata.row_index").as("__pos"))
    def readGroup(base: String, ps: Seq[String]): DataFrame =
      if (mode == "name" || mode == "id") {
        // name mode: parquet columns match by PHYSICAL name. id mode
        // (icebergCompat writers): they match by parquet FIELD ID —
        // stamp each requested field with `parquet.field.id` from its
        // `delta.columnMapping.id` and let Spark's field-id resolution
        // do the matching (the session flag only activates for fields
        // that carry the metadata, so name-matched reads are unaffected).
        val physical0 = physicalSchema(snap.schema)
        val physical =
          if (mode == "id")
            StructType(physical0.fields.zip(snap.schema.fields).map {
              case (p, l) =>
                if (l.metadata.contains("delta.columnMapping.id"))
                  p.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
                    .withMetadata(p.metadata)
                    .putLong("parquet.field.id",
                      l.metadata.getLong("delta.columnMapping.id"))
                    .build())
                else throw new IllegalStateException(
                  s"id-mode table ${snap.tablePath}: field ${l.name} has no " +
                    "delta.columnMapping.id — cannot resolve columns")
            })
          else physical0
        // session-level by necessity (field-id resolution is a SQL conf,
        // not a per-read option, and the read materializes lazily) —
        // deliberate and safe: the flag only changes behavior for reads
        // whose REQUESTED schema carries parquet.field.id metadata,
        // which this engine attaches exactly for id-mode tables
        if (mode == "id")
          spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        val raw = spark.read.schema(physical)
          .option("basePath", base).parquet(ps: _*)
        raw.select(physical.fields.zip(snap.schema.fields).map {
          case (p, l) => col(s"`${p.name}`").as(l.name)
        }.toIndexedSeq ++ metaCols: _*)
      } else {
        spark.read.schema(snap.schema)
          .option("basePath", base).parquet(ps: _*)
          .select(snap.schema.fieldNames.toIndexedSeq.map(n => col(s"`$n`")) ++
            metaCols: _*)
      }
    def readAll(ps: Seq[String]): DataFrame =
      ps.groupBy(fileTableRoot).toSeq.sortBy(_._1)
        .map { case (root, group) => readGroup(root, group) }
        .reduce(_ unionByName _)

    // Merge-on-read: files carrying a deletion vector are scanned with
    // their physical row index and anti-joined against the DV sidecar
    // rows (file, pos) — fully distributed, positions never transit the
    // driver, and the join probe side is bounded by DELETED rows, not
    // the table.
    // Callers hand over either plain absolute paths (snapshot file
    // lists) or qualified URIs (provenance-column round trips) —
    // canonicalize both sides before matching.
    val hconf = spark.sessionState.newHadoopConf()
    def canon(p: String): String = {
      val hp = new Path(p)
      hp.getFileSystem(hconf).makeQualified(hp).toString
    }
    val dvByCanon: Map[String, DvDescriptor] = snap.files.flatMap { a =>
      a.dv.map { d =>
        val abs = new Path(snap.tablePath,
          java.net.URLDecoder.decode(a.path, "UTF-8")).toString
        canon(abs) -> (if (d.inline) d
          else d.copy(path = new Path(snap.tablePath, d.path).toString))
      }
    }.toMap
    val (dvPaths, plainPaths) = paths.partition(p => dvByCanon.contains(canon(p)))
    if (dvPaths.isEmpty) readAll(plainPaths)
    else {
      // Each (data file, descriptor) ref parses ITS vector out of the
      // roaring DV file in the executor task — positions never transit
      // the driver, and the probe side stays bounded by deleted rows.
      // Inline ('i') vectors decode straight from the descriptor's z85
      // payload; no file I/O. File reads use the SESSION's Hadoop conf
      // (broadcast — spark.hadoop.* credentials/endpoints must reach
      // executor-side DV opens on real object stores).
      val refs: Seq[(String, String, String, Long, Long)] = dvPaths.map { p =>
        val d = dvByCanon(canon(p))
        (canon(p), d.storageType, if (d.inline) d.raw else d.path,
          d.offset, d.sizeInBytes)
      }
      val bconf = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(hconf))
      import spark.implicits._
      val dvRows = spark.createDataset(refs)
        .flatMap { case (file, st, ref, off, size) =>
          val positions =
            if (st == "i")
              RoaringDv.deserialize(RoaringDv.z85DecodeTo(ref, size.toInt))
            else {
              val p = new Path(ref)
              val dfs = p.getFileSystem(bconf.value.value)
              val len = dfs.getFileStatus(p).getLen.toInt
              val bytes = new Array[Byte](len)
              val in = dfs.open(p)
              try in.readFully(0, bytes) finally in.close()
              RoaringDv.unframe(bytes, off, size)
            }
          positions.map(file -> _)
        }.toDF("__dv_file", "__dv_pos")
      val withMeta = readAll(dvPaths)
      val filtered = withMeta.join(dvRows,
          withMeta("__file") === dvRows("__dv_file") &&
            withMeta("__pos") === dvRows("__dv_pos"), "left_anti")
      if (plainPaths.isEmpty) filtered
      else readAll(plainPaths).unionByName(filtered)
    }
  }

  private val mapper = new ObjectMapper()
  private val VersionRe = """(\d{20})\.json""".r
  private val CompactedRe = """(\d{20})\.(\d{20})\.compacted\.json""".r

  private val SinglePartRe = """(\d{20})\.checkpoint\.parquet""".r
  private val MultiPartRe = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
  private val V2Re =
    """(\d{20})\.checkpoint\.([0-9a-fA-F-]{36})\.(?:parquet|json)""".r

  def logDir(tablePath: String): Path = new Path(tablePath, "_delta_log")

  def isDeltaTable(spark: SparkSession, tablePath: String): Boolean = {
    val p = logDir(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p)
  }

  /** Current (or as-of) table version. Checkpoint versions count: after
    * checkpoint + log cleanup a valid table may have no commit JSON at
    * its current version (mirrors snapshot()'s own horizon). */
  def latestVersion(spark: SparkSession, tablePath: String): Long = {
    val (_, commits, checkpoints, compacted) = listLog(spark, tablePath)
    // Compacted range ends count too: a compacted file legitimizes
    // deleting the commit JSONs it covers, so a log tail of the shape
    // [compact 0..e, commits deleted, no newer checkpoint] is still a
    // fully replayable table at version e.
    (commits.keys ++ checkpoints.keys ++ compacted.keys.map(_._2))
      .maxOption.getOrElse(
        throw new IllegalStateException(s"no Delta commits under $tablePath"))
  }

  /** List the log: commit JSONs by version, plus COMPLETE checkpoints by
    * version. A multi-part checkpoint (`<v>.checkpoint.<i>.<n>.parquet`)
    * is trusted only when all n distinct parts are present — a reader
    * racing the part-rename publish (or landing after a crash mid-write)
    * must not bootstrap from a partial live-file set: replay starts at
    * v+1, so missing adds would be silent durable data loss, not an
    * error. Incomplete checkpoints are simply invisible; replay falls
    * back to the next older complete checkpoint or the full commit log. */
  private[sources] def listLog(spark: SparkSession, tablePath: String)
      : (FileSystem, Map[Long, Path], Map[Long, Seq[Path]],
         Map[(Long, Long), Path]) = {
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir))
      throw new IllegalArgumentException(s"not a Delta table (no _delta_log): $tablePath")
    val entries = fs.listStatus(dir).map(_.getPath)
    val commits = entries.flatMap(p => p.getName match {
      case VersionRe(v) => Some(v.toLong -> p)
      case _ => None
    }).toMap
    // log-compaction files, from the SAME listing (LIST is a metered
    // high-latency RPC on object stores — one call serves all shapes)
    val compacted: Map[(Long, Long), Path] = entries.flatMap(p =>
      p.getName match {
        case CompactedRe(s, e) => Some((s.toLong, e.toLong) -> p)
        case _ => None
      }).toMap
    val singles = entries.flatMap(p => p.getName match {
      case SinglePartRe(v) => Some(v.toLong -> p)
      case _ => None
    }).toMap
    val multis: Map[Long, Seq[Path]] = entries.flatMap(p => p.getName match {
      case MultiPartRe(v, i, n) => Some(((v.toLong, n.toInt), i.toInt, p))
      case _ => None
    }).groupBy(_._1).collect {
      // complete = exactly parts 1..n all present (distinct, no gaps)
      case ((v, n), group) if group.map(_._2).toSet == (1 to n).toSet =>
        v -> group.sortBy(_._2).map(_._3).toSeq
    }
    // V2 checkpoints: <v>.checkpoint.<uuid>.parquet manifests whose add
    // entries live in _sidecars/. Several writers may race the same
    // version with different uuids — any one is a complete manifest, so
    // the lexically-first is picked deterministically.
    val v2s: Map[Long, Seq[Path]] = entries.flatMap(p => p.getName match {
      case V2Re(v, _) => Some(v.toLong -> p)
      case _ => None
    }).groupBy(_._1).map { case (v, g) =>
      v -> Seq(g.map(_._2).minBy(_.getName))
    }
    // preference at the same version: any complete form is valid; the
    // single-part file is the cheapest bootstrap, v2 next, multi last
    val listed = multis ++ v2s ++ singles.map { case (v, p) => v -> Seq(p) }
    // `_last_checkpoint` is TRUSTED first (the protocol's pointer —
    // what foreign readers consult): when it names a checkpoint the
    // listing missed (eventually-consistent stores list-lag renames),
    // targeted existence probes adopt it; a corrupt/dangling pointer
    // falls back to the listing silently. Versions the listing DOES
    // know keep their listed artifact set (completeness was validated).
    val pointed: Map[Long, Seq[Path]] =
      readLastCheckpoint(fs, dir) match {
        case Some((v, partsOpt)) if !listed.contains(v) =>
          partsOpt match {
            case None =>
              val p = new Path(dir, f"$v%020d.checkpoint.parquet")
              if (fs.exists(p)) Map(v -> Seq(p)) else Map.empty
            case Some(n) =>
              val ps = (1 to n).map(i =>
                new Path(dir, f"$v%020d.checkpoint.$i%010d.$n%010d.parquet"))
              if (ps.forall(fs.exists)) Map(v -> ps.toSeq) else Map.empty
          }
        case _ => Map.empty
      }
    (fs, commits, listed ++ pointed, compacted)
  }

  /** Parse `_delta_log/_last_checkpoint`: (version, parts). None when
    * absent or unreadable — the pointer is a hint with list-fallback,
    * never a hard dependency. */
  private def readLastCheckpoint(fs: FileSystem,
      dir: Path): Option[(Long, Option[Int])] = {
    val lc = new Path(dir, "_last_checkpoint")
    try {
      if (!fs.exists(lc)) return None
      val in = fs.open(lc)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = mapper.readTree(txt)
      Option(node.get("version")).map(v =>
        v.asLong() -> Option(node.get("parts")).map(_.asInt()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Resolve TIMESTAMP AS OF to a version: the last commit whose log
    * file's modification time is at or before `ts` (Delta's own
    * timestamp resolution — commit mtime is the protocol's commit
    * timestamp surrogate). Errors when `ts` predates the earliest
    * retained commit, exactly like Delta ("before the earliest version
    * available"). Checkpoint-only versions (cleaned logs) count via the
    * checkpoint file's mtime. */
  def versionAt(spark: SparkSession, tablePath: String,
      ts: java.sql.Timestamp): Long = {
    val (fs, commits, checkpoints, _) = listLog(spark, tablePath)
    val times: Map[Long, Long] =
      (checkpoints.map { case (v, ps) =>
        v -> ps.map(p => fs.getFileStatus(p).getModificationTime).max
      } ++ commits.map { case (v, p) =>  // commit mtime wins over checkpoint
        v -> fs.getFileStatus(p).getModificationTime
      } ++ commits.flatMap { case (v, p) => // in-commit timestamp wins over all
        readIct(fs, p).map(v -> _)
      }).toMap
    val at = times.filter(_._2 <= ts.getTime).keys.maxOption
    at.getOrElse(throw new IllegalArgumentException(
      if (times.isEmpty)
        // compacted-only log: per-version timestamps left with the
        // deleted commits, so TIMESTAMP AS OF cannot resolve (use
        // VERSION AS OF — snapshot replays the compacted range fine)
        s"no timestamped log artifacts under $tablePath (commits " +
          "compacted away?) — use VERSION AS OF"
      else
        s"timestamp $ts is before the earliest retained version of " +
          s"$tablePath (earliest commit at " +
          s"${new java.sql.Timestamp(times.values.min)})"))
  }

  /** The `commitInfo.inCommitTimestamp` of a commit file, if stamped —
    * the writer feature that makes TIMESTAMP AS OF independent of log
    * file mtimes (which rewrites, copies, and object-store migrations
    * all corrupt). Scans the commit's action lines for commitInfo; a
    * pre-feature commit returns None and falls back to mtime. */
  private def readIct(fs: FileSystem, commit: Path): Option[Long] =
    withLogLines(fs, commit)(_.map(mapper.readTree)
      .collectFirst { case n if n.hasNonNull("commitInfo") => n.get("commitInfo") }
      .filter(_.hasNonNull("inCommitTimestamp"))
      .map(_.get("inCommitTimestamp").asLong()))

  /** Stream a log file's non-empty lines through `f` — the ONE
    * JSON-lines reading idiom (commit JSONs, compacted files, V2 JSON
    * manifests, CDC files) so charset/close handling lives in a single
    * place. The iterator is only valid inside `f`. */
  private[sources] def withLogLines[A](fs: FileSystem, p: Path)
      (f: Iterator[String] => A): A = {
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    try f(Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .filter(_.trim.nonEmpty))
    finally reader.close()
  }

  /** [[readIct]] by table path + version; None when the commit JSON no
    * longer exists (cleaned log) or carries no in-commit timestamp. */
  private[sources] def commitIct(spark: SparkSession, tablePath: String,
      version: Long): Option[Long] = {
    if (version < 0) return None
    val dir = logDir(tablePath)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val p = new Path(dir, f"$version%020d.json")
    if (!fs.exists(p)) None else readIct(fs, p)
  }

  /** Replay the log to `versionAsOf` (default: latest). */
  def snapshot(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): Snapshot = {
    val (fs, commits, checkpoints, compacted) = listLog(spark, tablePath)
    // compacted ends participate (see latestVersion): replay can serve a
    // tail whose commit JSONs were deleted behind a compacted range.
    val latest = (commits.keys ++ checkpoints.keys ++
      compacted.keys.map(_._2)).maxOption.getOrElse(
      throw new IllegalStateException(s"empty _delta_log under $tablePath"))
    val target = versionAsOf.getOrElse(latest)
    require(target <= latest, s"version $target > latest $latest for $tablePath")

    val live = mutable.LinkedHashMap[String, AddEntry]()
    val txns = mutable.Map[String, Long]()
    val domains = mutable.LinkedHashMap[String, String]()
    var schemaString: String = null
    var partCols: Seq[String] = Nil
    var config: Map[String, String] = Map.empty
    var mdId: Option[String] = None
    var protocolInfo: TableProtocol = TableProtocol()

    // One JSON action line (commit, compacted-log, or V2 JSON-manifest
    // form) applied to the accumulating state. `sidecarSink` collects
    // sidecar references — only manifests carry them; its presence also
    // marks checkpoint-bootstrap context, where `remove` lines are
    // vacuum tombstones (not pending deletes) and must be IGNORED —
    // mirroring the parquet manifest branch, which never selects the
    // remove column. A spec-reconciled manifest carries no add+remove
    // conflict, but a foreign non-reconciled one must not produce a
    // different live set depending on manifest form.
    def processNode(node: com.fasterxml.jackson.databind.JsonNode,
        sidecarSink: Option[mutable.Buffer[String]] = None): Unit = {
      val bootstrapCtx = sidecarSink.isDefined
      val add = node.get("add"); val rm = node.get("remove")
      val md = node.get("metaData"); val proto = node.get("protocol")
      if (add != null) {
        val p = add.get("path").asText()
        val stats =
          if (add.hasNonNull("stats")) Some(add.get("stats").asText())
          else None
        val dv =
          if (add.hasNonNull("deletionVector")) {
            val d = add.get("deletionVector")
            val st = d.get("storageType").asText()
            checkDvStorage(st)
            Some(DvDescriptor(
              dvPathOf(st, d.get("pathOrInlineDv").asText()),
              d.get("cardinality").asLong(),
              if (d.hasNonNull("offset")) d.get("offset").asLong() else 1L,
              if (d.hasNonNull("sizeInBytes")) d.get("sizeInBytes").asLong()
              else 0L,
              st, d.get("pathOrInlineDv").asText()))
          } else None
        def optLong(n: String): Option[Long] =
          if (add.hasNonNull(n)) Some(add.get(n).asLong()) else None
        live(p) = AddEntry(p, add.get("size").asLong(), stats, dv,
          optLong("baseRowId"), optLong("defaultRowCommitVersion"))
      }
      if (rm != null && !bootstrapCtx) live.remove(rm.get("path").asText())
      if (md != null) {
        schemaString = md.get("schemaString").asText()
        partCols = jsonArray(md.get("partitionColumns")).map(_.asText())
        val c = md.get("configuration")
        config =
          if (c == null || !c.isObject) Map.empty
          else c.properties().iterator().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        mdId = Option(md.get("id")).map(_.asText())
      }
      if (proto != null) {
        checkProtocol(proto.get("minReaderVersion").asInt())
        protocolInfo = TableProtocol(
          proto.get("minReaderVersion").asInt(),
          proto.get("minWriterVersion").asInt(),
          if (proto.hasNonNull("readerFeatures"))
            jsonArray(proto.get("readerFeatures")).map(_.asText()) else Nil,
          if (proto.hasNonNull("writerFeatures"))
            jsonArray(proto.get("writerFeatures")).map(_.asText()) else Nil)
      }
      val txn = node.get("txn")
      if (txn != null)
        txns(txn.get("appId").asText()) = txn.get("version").asLong()
      val dm = node.get("domainMetadata")
      if (dm != null) {
        if (dm.hasNonNull("removed") && dm.get("removed").asBoolean())
          domains.remove(dm.get("domain").asText())
        else domains(dm.get("domain").asText()) =
          dm.get("configuration").asText()
      }
      val sc = node.get("sidecar")
      if (sc != null) sidecarSink.foreach(_ += sc.get("path").asText())
    }

    // Start from the newest checkpoint at-or-before the target: its rows
    // are the complete live state at that version (removes in it are
    // vacuum tombstones, not pending deletes).
    val ckptVersion = checkpoints.keys.filter(_ <= target).maxOption
    ckptVersion.foreach { v =>
      def processAdd(a: Row): Unit = {
        val path = a.getAs[String]("path")
        val stats =
          if (a.schema.fieldNames.contains("stats"))
            Option(a.getAs[String]("stats"))
          else None
        val dv =
          if (a.schema.fieldNames.contains("deletionVector") &&
              a.getAs[AnyRef]("deletionVector") != null) {
            val d = a.getAs[Row]("deletionVector")
            val st = d.getAs[String]("storageType")
            checkDvStorage(st)
            def lf(n: String, dflt: Long): Long =
              if (d.schema.fieldNames.contains(n) && !d.isNullAt(d.fieldIndex(n)))
                d.getAs[Long](n)
              else dflt
            Some(DvDescriptor(
              dvPathOf(st, d.getAs[String]("pathOrInlineDv")),
              d.getAs[Long]("cardinality"), lf("offset", 1L), lf("sizeInBytes", 0L),
              st, d.getAs[String]("pathOrInlineDv")))
          } else None
        def optLong(n: String): Option[Long] =
          if (a.schema.fieldNames.contains(n) && !a.isNullAt(a.fieldIndex(n)))
            Some(a.getAs[Long](n))
          else None
        live(path) = AddEntry(path, a.getAs[Long]("size"), stats, dv,
          optLong("baseRowId"), optLong("defaultRowCommitVersion"))
      }
      val paths = checkpoints(v)
      val sidecarFiles = mutable.Buffer[String]()
      if (paths.size == 1 && paths.head.getName.endsWith(".json")) {
        // V2 JSON-manifest form (`<v>.checkpoint.<uuid>.json`): the same
        // actions as the parquet manifest, one JSON per line — foreign
        // writers may emit either; sidecars are always parquet.
        withLogLines(fs, paths.head)(_.foreach(l =>
          processNode(mapper.readTree(l), Some(sidecarFiles))))
      } else {
      val rows = spark.read.parquet(paths.map(_.toString): _*)
      val cols = rows.columns.toSet
      val wanted = Seq("add", "metaData", "protocol", "txn", "sidecar",
        "domainMetadata").filter(cols)
      rows.select(wanted.map(org.apache.spark.sql.functions.col): _*)
        .collect() // checkpoint = table METADATA; size is O(#files), not data
        .foreach { r =>
          wanted.zipWithIndex.foreach {
            case ("add", i) if !r.isNullAt(i) =>
              processAdd(r.getStruct(i))
            case ("sidecar", i) if !r.isNullAt(i) =>
              sidecarFiles += r.getStruct(i).getAs[String]("path")
            case ("metaData", i) if !r.isNullAt(i) =>
              val m = r.getStruct(i)
              schemaString = m.getAs[String]("schemaString")
              partCols = m.getAs[scala.collection.Seq[String]]("partitionColumns").toSeq
              if (m.schema.fieldNames.contains("configuration")) {
                val c = m.getAs[scala.collection.Map[String, String]]("configuration")
                if (c != null) config = c.toMap
              }
              mdId = Option(m.getAs[String]("id"))
            case ("protocol", i) if !r.isNullAt(i) =>
              val p = r.getStruct(i)
              checkProtocol(p.getAs[Int]("minReaderVersion"))
              def feats(field: String): Seq[String] =
                if (p.schema.fieldNames.contains(field) &&
                    !p.isNullAt(p.fieldIndex(field)))
                  p.getAs[scala.collection.Seq[String]](field).toSeq
                else Nil
              protocolInfo = TableProtocol(
                p.getAs[Int]("minReaderVersion"),
                p.getAs[Int]("minWriterVersion"),
                feats("readerFeatures"), feats("writerFeatures"))
            case ("txn", i) if !r.isNullAt(i) =>
              val t = r.getStruct(i)
              txns(t.getAs[String]("appId")) = t.getAs[Long]("version")
            case ("domainMetadata", i) if !r.isNullAt(i) =>
              val dm = r.getStruct(i)
              val removed = dm.schema.fieldNames.contains("removed") &&
                !dm.isNullAt(dm.fieldIndex("removed")) &&
                dm.getAs[Boolean]("removed")
              if (removed) domains.remove(dm.getAs[String]("domain"))
              else domains(dm.getAs[String]("domain")) =
                dm.getAs[String]("configuration")
            case _ =>
          }
        }
      }
      // V2 checkpoints keep the file actions in sidecar parquet under
      // _delta_log/_sidecars/ (relative names per the protocol). A
      // referenced-but-missing sidecar is a HARD error — bootstrapping
      // from the surviving subset would silently drop live files, the
      // exact failure mode the multi-part completeness check exists to
      // prevent.
      if (sidecarFiles.nonEmpty) {
        val scDir = new Path(logDir(tablePath), "_sidecars")
        val paths = sidecarFiles.toSeq.map { p =>
          if (p.contains("://") || p.startsWith("/")) p
          else new Path(scDir, p).toString
        }
        paths.foreach { p =>
          if (!fs.exists(new Path(p))) throw new IllegalStateException(
            s"v2 checkpoint at version $v of $tablePath references a " +
              s"missing sidecar $p — refusing a partial live-file set")
        }
        spark.read.parquet(paths: _*).select("add").collect().foreach { r =>
          if (!r.isNullAt(0)) processAdd(r.getStruct(0))
        }
      }
    }

    val from = ckptVersion.map(_ + 1).getOrElse(0L)
    // Log-compaction files (`<s>.<e>.compacted.json`, protocol-optional)
    // hold the action reconciliation of their whole range in commit-JSON
    // form. Replay prefers the LONGEST compacted file COVERING the
    // cursor whose end fits the target (s ≤ cursor ≤ e) — on a long
    // tail past the last checkpoint that's one file open instead of
    // e−s+1. A cursor strictly inside the range (a checkpoint landed
    // mid-range before compaction) is fine: re-applying the range's
    // already-checkpointed prefix is idempotent — adds/removes re-apply
    // onto the same live map and metaData/protocol/txn/domain carry
    // latest-wins semantics — and without the covering jump a tail
    // whose commit JSONs were deleted behind the compaction (which
    // latestVersion explicitly advertises as replayable) would throw
    // 'missing commit'. The individual commits stay authoritative for
    // time travel INSIDE the range and for CDF/ICT reads, which always
    // address exact versions.
    val replayFiles = mutable.Buffer[Path]()
    var cursor = from
    while (cursor <= target) {
      val jump = compacted.collect {
        case ((s, e), p) if s <= cursor && e >= cursor && e <= target =>
          (e, p)
      }
      jump.maxByOption(_._1) match {
        case Some((e, p)) => replayFiles += p; cursor = e + 1
        case None =>
          replayFiles += commits.getOrElse(cursor,
            throw new IllegalStateException(
              s"missing Delta commit $cursor under $tablePath"))
          cursor += 1
      }
    }
    replayFiles.foreach(commit => withLogLines(fs, commit)(
      _.foreach(line => processNode(mapper.readTree(line)))))

    require(schemaString != null, s"no metaData action in log of $tablePath")
    checkReaderFeatures(protocolInfo, tablePath)
    val snap = Snapshot(target,
      DataType.fromJson(schemaString).asInstanceOf[StructType],
      partCols, live.values.toSeq, tablePath, txns.toMap, config, mdId,
      protocolInfo, domains.toMap)
    // version-checksum tripwire: replayed totals must match the crc the
    // committer recorded for this version, when one exists
    DeltaChecksum.verify(spark, snap)
    snap
  }

  /** Read a Delta table as a DataFrame (optionally time-traveled). The
    * scan is a plain distributed parquet read over the snapshot's live
    * files — predicate pushdown / column pruning apply unchanged.
    *
    * Column mapping (`delta.columnMapping.mode = name`, reader version
    * 2): parquet files store PHYSICAL column names recorded in each
    * schema field's `delta.columnMapping.physicalName` metadata; the
    * scan reads the physical schema and projects back to logical names
    * (a zero-cost rename in the plan — pruning/pushdown still operate
    * on the physical scan). `id` mode (parquet field-id matching) is
    * rejected explicitly rather than misread. */
  def read(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None,
      timestampAsOf: Option[java.sql.Timestamp] = None): DataFrame = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "pass versionAsOf OR timestampAsOf, not both")
    val asOf = versionAsOf.orElse(
      timestampAsOf.map(versionAt(spark, tablePath, _)))
    val snap = snapshot(spark, tablePath, asOf)
    scanFiles(spark, snap, snap.filePaths)
  }

  /** Read with file-level data skipping: files whose `add.stats` range
    * provably cannot satisfy `condition` are never opened, and the full
    * predicate still filters the surviving rows (pruning is an I/O
    * optimization, not a correctness dependency — files without stats
    * always scan). At 100 TB this is the difference between opening the
    * three files whose [min,max] straddle a point predicate and opening
    * the table. */
  def readWhere(spark: SparkSession, tablePath: String, condition: Column,
      versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, versionAsOf)
    // Partition values become point ranges in each file's skipping stats,
    // so partition predicates prune files exactly like clustered-column
    // ranges do (files without any skippable info always survive).
    val statted: Seq[(String, String)] = snap.files.flatMap { a =>
      DataSkipping.withPartitionValues(a.stats, a.path, snap.schema,
        snap.partitionColumns).map(a.path -> _)
    }
    val kept: Seq[AddEntry] =
      if (statted.isEmpty) snap.files
      else {
        import org.apache.spark.sql.functions.{col => c, from_json}
        val statsDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            statted.map { case (p, s) => org.apache.spark.sql.Row(p, s) }, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("path",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("stats",
              org.apache.spark.sql.types.StringType))))
        val withStats = statted.map(_._1).toSet
        val keepPaths = statsDf
          .withColumn("s", from_json(c("stats"),
            DataSkipping.statsSchema(snap.schema)))
          .where(DataSkipping.canMatch(condition, snap.schema.fieldNames.toSet))
          .select("path").collect().map(_.getString(0)).toSet
        snap.files.filter(a => !withStats(a.path) || keepPaths(a.path))
      }
    val pruned = snap.copy(files = kept)
    // scanFiles keeps mapped tables honest here too: stats recorded
    // under physical names simply fail to parse against the logical
    // stats schema → safe() keeps the file (conservative, never wrong).
    scanFiles(spark, pruned, pruned.filePaths).where(condition)
  }

  /** Unmapped and NAME-mapped tables are writable (writers route frames
    * through [[toPhysical]] so files hold physical names); any other
    * mapping mode (id) is rejected — minting fresh column ids on write
    * is out of scope, and a logical-named file in an id-mapped table
    * would resolve to silent nulls. Every data-writing path calls this
    * with its already-loaded snapshot. */
  /** Writer features this engine implements. The protocol requires a
    * writer to REFUSE a table whose `writerFeatures` names anything
    * else — e.g. writing a `rowTracking` table without maintaining row
    * ids, or an `icebergCompatV2` table without syncing the Iceberg
    * metadata, silently corrupts the feature's invariants. Legacy
    * writer versions (2-6) only ever imply features from this set, so
    * the gate needs the feature list alone. */
  private[sources] val SupportedWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "changeDataFeed", "columnMapping", "identityColumns",
    "deletionVectors", "timestampNtz", "inCommitTimestamp",
    "v2Checkpoint", "vacuumProtocolCheck", "domainMetadata", "rowTracking",
    // writer obligations hold: new files are written with the table's
    // CURRENT (widest) logical schema, and DeltaSchema.widenColumnType
    // records `delta.typeChanges` at ALTER time
    "typeWidening", "typeWidening-preview",
    // variant writes use Spark's native parquet variant layout — the
    // encoding the feature mandates (createProtocolAction declares it)
    "variantType", "variantType-preview",
    // liquid clustering (r13, VERDICT r12 item 9): the feature's writer
    // obligations are (a) PRESERVE the `delta.clustering` domain —
    // which this writer meets by construction: ordinary commits never
    // tombstone foreign domains, snapshot replay carries them, and
    // checkpoints/log compaction re-emit every live domain — and
    // (b) clustering the DATA is explicitly best-effort in the
    // protocol ("writers are not required to cluster"), so appends and
    // DML that don't re-cluster stay spec-conformant. A foreign
    // clustered table therefore survives our DML with its clustering
    // metadata intact (DeltaSourceSpec pins it end-to-end).
    "clusteredTable", "clustering")

  private[sources] def checkWritable(snap: Snapshot): Unit = {
    val mode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    if (mode != "none" && mode != "name") throw new UnsupportedOperationException(
      s"${snap.tablePath} uses column mapping mode '$mode'; this engine " +
        "writes unmapped and name-mapped tables only")
    val unsupported =
      snap.protocol.writerFeatures.filterNot(SupportedWriterFeatures)
    if (unsupported.nonEmpty) throw new UnsupportedOperationException(
      s"${snap.tablePath} requires writer features " +
        unsupported.sorted.mkString("[", ", ", "]") +
        " that this engine does not implement; writing would corrupt " +
        "the feature's invariants — refusing (the table stays readable)")
    // `invariants` the FEATURE is listed on virtually every real table;
    // refuse only when the schema actually defines one (we would not
    // enforce it on the incoming rows).
    if (snap.schema.fields.exists(_.metadata.contains("delta.invariants")))
      throw new UnsupportedOperationException(
        s"${snap.tablePath} defines column invariants, which this " +
          "engine does not enforce — refusing to write")
  }

  /** `delta.appendOnly=true` forbids commits that remove live rows
    * (protocol: no `remove` with dataChange=true) — DELETE, UPDATE,
    * matched MERGE clauses, overwrite, RESTORE. Compaction keeps
    * working: OPTIMIZE removes files with dataChange=false. */
  private[sources] def checkAppendOnly(snap: Snapshot,
      operation: String): Unit =
    if (snap.configuration.get("delta.appendOnly")
        .exists(_.equalsIgnoreCase("true")))
      throw new UnsupportedOperationException(
        s"${snap.tablePath} is delta.appendOnly=true; $operation would " +
          "remove live rows")

  /** Physical-name view of a logical schema: each field renamed to its
    * `delta.columnMapping.physicalName` (identity without mapping
    * metadata). What the parquet files of a name-mapped table actually
    * hold — reads resolve through it and writes must produce it. */
  private[sources] def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      val pn =
        if (f.metadata.contains("delta.columnMapping.physicalName"))
          f.metadata.getString("delta.columnMapping.physicalName")
        else f.name
      f.copy(name = pn)
    })

  /** Project a PHYSICAL-named frame (a staged-file or change-file read)
    * back to the logical schema — the read-side inverse of
    * [[toPhysical]]; extra columns pass through via `extra`. */
  private[sources] def fromPhysical(df: org.apache.spark.sql.DataFrame,
      schema: StructType,
      extra: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(physicalSchema(schema).fields.zip(schema.fields).map {
      case (p, l) => col(s"`${p.name}`").as(l.name)
    }.toIndexedSeq ++ extra.map(c => col(s"`$c`")): _*)
  }

  /** Rename a frame's logical columns to their physical names before a
    * data-file write on a mapped table (columns outside the table
    * schema — e.g. `_change_type` — pass through). Fields carrying a
    * `delta.columnMapping.id` are also stamped with `parquet.field.id`
    * so the written files resolve under BOTH mapping modes — Spark's
    * parquet writer materializes that key as the parquet field_id,
    * which id-mode readers (icebergCompat and this engine's own id-mode
    * scan) require; name-mode readers ignore it. No-op when the schema
    * carries no mapping. */
  private[sources] def toPhysical(df: org.apache.spark.sql.DataFrame,
      schema: StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val m = schema.fields.zip(physicalSchema(schema).fields)
      .map { case (l, p) => l.name -> (p.name, l.metadata) }.toMap
    if (m.forall { case (l, (p, md)) =>
        l == p && !md.contains("delta.columnMapping.id") }) df
    else df.select(df.columns.toIndexedSeq.map { c =>
      m.get(c) match {
        case Some((p, md)) if md.contains("delta.columnMapping.id") =>
          col(s"`$c`").as(p, new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", md.getLong("delta.columnMapping.id"))
            .build())
        case Some((p, _)) => col(s"`$c`").as(p)
        case None => col(s"`$c`")
      }
    }: _*)
  }

  /** Reader versions 1-3 are in scope (2 adds column mapping, which
    * read() handles in name mode; 3 adds deletion vectors, which
    * scanFiles applies); higher versions are rejected rather than
    * misread. */
  private def checkProtocol(minReader: Int): Unit =
    if (minReader > 3) throw new UnsupportedOperationException(
      s"Delta reader protocol $minReader not supported (this reader implements versions 1-3)")

  /** Reader features this engine actually implements. `timestampNtz`
    * costs nothing extra (Spark's schema JSON and parquet reader handle
    * TIMESTAMP_NTZ natively); `vacuumProtocolCheck` requires no read-path
    * behavior by definition — it exists to gate vacuum implementations. */
  /** Whether `delta.feature.<name>=supported` enablement must declare
    * the feature on the READER side too (reader-writer features). */
  private[sources] def isReaderFeature(name: String): Boolean =
    SupportedReaderFeatures.contains(name)

  private val SupportedReaderFeatures: Set[String] = Set(
    "columnMapping", "deletionVectors", "v2Checkpoint",
    "timestampNtz", "vacuumProtocolCheck",
    // Type widening needs no bespoke read path: the scan already reads
    // every file with the snapshot's DECLARED schema, and Spark's
    // vectorized parquet reader promotes the narrower physical types the
    // protocol allows (byte→short→int→long, float→double, int→double,
    // date→TIMESTAMP_NTZ, int→decimal, decimal precision growth) to the
    // requested wider type. Both the stable and preview feature names
    // appear in the wild.
    "typeWidening", "typeWidening-preview",
    // Variant needs no bespoke path either: the feature mandates exactly
    // Spark's own parquet variant encoding (struct<metadata,value>
    // binary pair), which the scan reads natively once the declared
    // schema says `variant`.
    "variantType", "variantType-preview")

  /** Protocol gate for reader version 3 TABLE FEATURES: the spec requires
    * a reader to refuse the table when `readerFeatures` names a feature it
    * does not implement (e.g. a future format revision) — reading on
    * anyway would silently misinterpret data. Version gating alone
    * (checkProtocol) cannot catch this: every feature table sits at
    * reader 3. Validated once per snapshot, after the replay settles on
    * the table's final protocol action. */
  private def checkReaderFeatures(p: TableProtocol, tablePath: String): Unit = {
    val unsupported = p.readerFeatures.filterNot(SupportedReaderFeatures)
    if (unsupported.nonEmpty) throw new UnsupportedOperationException(
      s"Delta table $tablePath requires reader features " +
        unsupported.sorted.mkString("[", ", ", "]") +
        " that this reader does not implement (supported: " +
        SupportedReaderFeatures.toSeq.sorted.mkString(", ") + ")")
  }

  /** All three protocol storage forms are readable: absolute (`p`),
    * uuid-relative (`u`, the form standard Delta writers emit —
    * resolved through [[RoaringDv.relativeDvPath]]), and inline (`i`,
    * the z85 payload carried in the descriptor itself, the form
    * standard writers emit for tiny deletes). Anything else fails
    * loudly, never misread as zero deletions. */
  private def checkDvStorage(storageType: String): Unit =
    if (storageType != "p" && storageType != "u" && storageType != "i")
      throw new UnsupportedOperationException(
        s"deletion vector storageType '$storageType' not supported " +
          "(forms 'p'/'u'/'i' only)")

  /** Table-relative (or absolute) DV file path for a descriptor;
    * inline descriptors have no path. */
  private def dvPathOf(storageType: String, pathOrInlineDv: String): String =
    storageType match {
      case "u" => RoaringDv.relativeDvPath(pathOrInlineDv)
      case "i" => ""
      case _ => pathOrInlineDv
    }

  private def jsonArray(n: JsonNode): Seq[JsonNode] =
    if (n == null) Nil
    else (0 until n.size()).map(n.get)
}
