package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.sources.DeltaDml.DmlResult

/** Merge-on-read DELETE via deletion vectors (the protocol's
  * `deletionVector` add-file field, reader 3 / writer 7 feature): with
  * `delta.enableDeletionVectors=true`, a DELETE writes the deleted ROW
  * POSITIONS to a sidecar and re-adds the untouched data files with a
  * DV descriptor — no data rewrite at all. A point delete on a 100 TB
  * table costs one scan of the HIT files plus a sidecar of the deleted
  * positions, instead of rewriting every hit file; the scan-side cost
  * is one anti-join bounded by deleted rows ([[DeltaLog.scanFilesWithMeta]]).
  *
  * Physical encoding (documented deviation, [[DeltaLog.DvDescriptor]]):
  * ONE parquet sidecar of `(file, pos)` per DELETE commit, shared by
  * all of the commit's descriptors — the same one-DV-file-per-commit
  * shape Delta writes, with parquet instead of a roaring-bitmap bin.
  * Re-deleting from an already-vectored file UNIONS the old positions
  * into the new sidecar (a file's descriptor always points at its
  * complete deletion set; the superseded sidecar becomes vacuumable).
  *
  * UPDATE is merge-on-read too ([[update]]): old row versions are
  * vectored out and only the UPDATED rows append as new files. MERGE
  * and OPTIMIZE stay copy-on-write: their rewrites read through the DV
  * filter (purging deleted rows physically) and re-add files WITHOUT a
  * descriptor, retiring the vector.
  */
object DeltaDv {

  val Property = "delta.enableDeletionVectors"
  val DvDir = "_deletion_vectors"

  def enabled(configuration: Map[String, String]): Boolean =
    configuration.get(Property).exists(_.equalsIgnoreCase("true"))

  /** Stage the commit's `(file, pos)` rows as ONE sidecar parquet;
    * returns its table-relative path. The coalesce is bounded by deleted
    * positions (16 bytes-ish each), not table size — the same
    * single-file-per-commit shape as Delta's own DV bins. */
  private def writeSidecar(rows: DataFrame, tablePath: String): String = {
    val spark = rows.sparkSession
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(table, s".dv-staging-${java.util.UUID.randomUUID()}")
    rows.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("DV write produced no part file"))
    val rel = s"$DvDir/dv-${java.util.UUID.randomUUID()}.parquet"
    val target = new Path(table, rel)
    fs.mkdirs(target.getParent)
    if (!fs.rename(part, target))
      throw new IllegalStateException(s"could not place DV sidecar $target")
    fs.delete(staging, true)
    rel
  }

  /** The vectorization common to MOR DELETE and UPDATE: given the
    * matched rows (with provenance columns), stage ONE sidecar holding
    * the hit files' complete deletion sets and return the remove /
    * re-add-with-descriptor actions plus the newly-deleted row count.
    * None when nothing matched. */
  private[sources] def vectorize(spark: SparkSession, snap: DeltaLog.Snapshot,
      tablePath: String, matched: DataFrame)
      : Option[(Seq[com.fasterxml.jackson.databind.node.ObjectNode], Long)] = {
    val hitFiles = matched.select("__file").distinct()
      .collect().map(_.getString(0)) // metadata-scale
    if (hitFiles.isEmpty) return None

    val hconf = spark.sessionState.newHadoopConf()
    def canon(p: String): String = {
      val hp = new Path(p)
      hp.getFileSystem(hconf).makeQualified(hp).toString
    }
    val entryByCanon: Map[String, DeltaLog.AddEntry] = snap.files.map { a =>
      canon(new Path(tablePath,
        java.net.URLDecoder.decode(a.path, "UTF-8")).toString) -> a
    }.toMap
    val hitEntries = hitFiles.toSeq.map(f => f -> entryByCanon.getOrElse(f,
      throw new IllegalStateException(s"scanned file not in snapshot: $f")))

    // New positions ∪ the hit files' existing vectors → each descriptor
    // stays the file's COMPLETE deletion set.
    val newRows = matched.select(col("__file").as("file"), col("__pos").as("pos"))
    val oldSidecars = hitEntries.flatMap(_._2.dv)
      .map(d => new Path(tablePath, d.path).toString).distinct
    val allRows =
      if (oldSidecars.isEmpty) newRows
      else newRows.unionByName(
        spark.read.schema("file STRING, pos BIGINT").parquet(oldSidecars: _*)
          .filter(col("file").isin(hitFiles.toIndexedSeq: _*))).distinct()

    val rel = writeSidecar(allRows, tablePath)
    val cards = spark.read.schema("file STRING, pos BIGINT")
      .parquet(new Path(tablePath, rel).toString)
      .groupBy("file").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // #hit files
    val oldCards = hitEntries.map(_._2.dv.map(_.cardinality).getOrElse(0L)).sum
    val affected = cards.values.sum - oldCards

    // remove + re-add with the descriptor (adds AFTER removes — replay
    // is line-ordered)
    val actions = hitEntries.map(e => DeltaWrite.removeAction(e._2.path)) ++
      hitEntries.map { case (f, a) =>
        DeltaWrite.addAction(a.copy(dv = Some(
          DeltaLog.DvDescriptor(rel, cards.getOrElse(f, 0L)))))
      }
    Some((actions, affected))
  }

  /** The merge-on-read DELETE. Called by [[DeltaDml.delete]] when the
    * table property opts in. */
  private[sources] def delete(spark: SparkSession, tablePath: String,
      condition: org.apache.spark.sql.Column): DmlResult = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    DeltaLog.checkWritable(snap)
    if (snap.files.isEmpty) return DmlResult(snap.version, 0, 0L)

    val withMeta = DeltaLog.scanFilesWithMeta(spark, snap, snap.filePaths)
    // Already-vectored rows are filtered by the scan, so `matched` is
    // exactly the NEWLY deleted rows.
    val matched = withMeta.filter(condition)
    vectorize(spark, snap, tablePath, matched) match {
      case None => DmlResult(snap.version, 0, 0L)
      case Some((dvActions, affected)) =>
        val cdcs =
          if (!DeltaCdf.enabled(snap.configuration)) Nil
          else DeltaCdf.writeCdcFiles(
            matched.select(snap.schema.fieldNames.toIndexedSeq.map(col): _*)
              .withColumn("_change_type", lit("delete")), tablePath)
            .map(DeltaCdf.cdcAction)
        val v = DeltaWrite.commit(spark, tablePath,
          DeltaWrite.dvProtocolAction() +: (dvActions ++ cdcs), "DELETE")
        DmlResult(v, 0, affected)
    }
  }

  /** Merge-on-read UPDATE: the matched rows' OLD versions are vectored
    * out of their files and the UPDATED versions append as new files —
    * cost proportional to updated ROWS, not hit files (a one-row update
    * in a 1 GB file writes a one-row file plus a one-position sidecar).
    * Called by [[DeltaDml.update]] when the table property opts in. */
  private[sources] def update(spark: SparkSession, tablePath: String,
      condition: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)]): DmlResult = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    DeltaLog.checkWritable(snap)
    if (snap.files.isEmpty) return DmlResult(snap.version, 0, 0L)

    val withMeta = DeltaLog.scanFilesWithMeta(spark, snap, snap.filePaths)
    val matched = withMeta.filter(condition)
    vectorize(spark, snap, tablePath, matched) match {
      case None => DmlResult(snap.version, 0, 0L)
      case Some((dvActions, affected)) =>
        val byName = assignments.toMap
        // SET expressions evaluate against the OLD row, all at once
        // (same projection rule as the copy-on-write path).
        val updated = matched.select(snap.schema.fieldNames.toIndexedSeq.map { c =>
          byName.get(c).map(_.as(c)).getOrElse(col(c))
        }: _*)
        val adds = DeltaWrite.writeDataFiles(updated, tablePath,
          snap.partitionColumns)
        DeltaConstraints.enforceStaged(spark, tablePath, adds, snap.schema,
          snap.configuration)
        val cdcs =
          if (!DeltaCdf.enabled(snap.configuration)) Nil
          else DeltaCdf.writeCdcFiles(
            matched.select(snap.schema.fieldNames.toIndexedSeq.map(col): _*)
              .withColumn("_change_type", lit("update_preimage"))
              .unionByName(updated
                .withColumn("_change_type", lit("update_postimage"))), tablePath)
            .map(DeltaCdf.cdcAction)
        val v = DeltaWrite.commit(spark, tablePath,
          DeltaWrite.dvProtocolAction() +:
            (dvActions ++ adds.map(DeltaWrite.addAction) ++ cdcs), "UPDATE")
        DmlResult(v, 0, affected)
    }
  }
}
