package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Incremental change consumption from the Delta log — the semantics of
  * Delta-as-a-streaming-source: a consumer holds a last-seen version and
  * each poll returns the rows ADDED by commits after it (reading only
  * the new commits' `add` files, never rescanning the table).
  *
  * Append-only commits replay exactly. A commit that REMOVES files
  * (overwrite, DML, not compaction) cannot be represented as an
  * append-stream — by default that is an error, mirroring Delta's own
  * streaming source; `ignoreChanges = true` opts into emitting the
  * commit's added files anyway (re-emitting rewritten rows — the same
  * at-least-once contract as Delta's `ignoreChanges`), and
  * `ignoreDeletes = true` opts into skipping REMOVE-ONLY commits (a
  * DELETE whose rewrite produced no files — the delete signal is
  * dropped, which is exactly why it needs the explicit flag, as in
  * Delta's own `ignoreDeletes`). OPTIMIZE commits (`dataChange =
  * false`) are layout-only and are skipped entirely.
  */
object DeltaChanges {

  private val mapper = new ObjectMapper()

  final case class Changes(fromVersionExclusive: Long, toVersion: Long,
      addedFiles: Seq[String])

  /** File paths added by commits in `(fromExclusive, toInclusive]`
    * (`toInclusive` defaults to the latest version — a streaming source
    * passes the batch's end offset so a commit landing mid-planning
    * stays out of the batch). */
  def changedFiles(spark: SparkSession, tablePath: String,
      fromExclusive: Long, ignoreChanges: Boolean = false,
      ignoreDeletes: Boolean = false,
      toInclusive: Option[Long] = None): Changes = {
    val latest = toInclusive.getOrElse(DeltaLog.latestVersion(spark, tablePath))
    val fs = DeltaLog.logDir(tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val added = scala.collection.mutable.Buffer[String]()
    ((fromExclusive + 1) to latest).foreach { v =>
      val commit = new org.apache.hadoop.fs.Path(
        DeltaLog.logDir(tablePath), f"$v%020d.json")
      // A missing commit in range means history was cleaned past the
      // consumer's offset — skipping it would silently LOSE data.
      // (if/else, NOT statement sequence: a bare block after `throw new
      // X(...)` parses as an anonymous-subclass body.)
      if (!fs.exists(commit)) {
        throw new IllegalStateException(
          s"commit $v of $tablePath no longer exists (log cleaned past " +
            "this consumer's offset) — full snapshot refresh required")
      } else {
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(commit), "UTF-8"))
        val adds = scala.collection.mutable.Buffer[String]()
        var dataChangingRemove = false
        var dataChangingAdd = false
        try Iterator.continually(reader.readLine()).takeWhile(_ != null)
          .filter(_.trim.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            val add = node.get("add"); val rm = node.get("remove")
            if (add != null) {
              val changes = !add.hasNonNull("dataChange") ||
                add.get("dataChange").asBoolean(true)
              if (changes) { dataChangingAdd = true; adds += add.get("path").asText() }
            }
            if (rm != null && (!rm.hasNonNull("dataChange") ||
                rm.get("dataChange").asBoolean(true)))
              dataChangingRemove = true
          }
        finally reader.close()
        // ANY data-changing remove breaks the append contract — including
        // a remove-ONLY commit (a DELETE whose rewrite produced no part
        // files). Treating that as a no-op would silently drop the
        // delete signal; real Delta demands the same explicit opt-in.
        if (dataChangingRemove && !ignoreChanges) {
          if (dataChangingAdd)
            throw new UnsupportedOperationException(
              s"commit $v of $tablePath rewrites data (overwrite/DML); " +
                "an append stream cannot represent it — pass " +
                "ignoreChanges=true to re-emit rewritten rows, or re-read " +
                "the snapshot")
          else if (!ignoreDeletes)
            throw new UnsupportedOperationException(
              s"commit $v of $tablePath deletes data without adding any; " +
                "an append stream cannot represent the deletion — pass " +
                "ignoreDeletes=true to skip delete-only commits, or " +
                "re-read the snapshot")
        }
        added ++= adds
      }
    }
    Changes(fromExclusive, latest, added.toSeq.map { p =>
      new org.apache.hadoop.fs.Path(tablePath,
        java.net.URLDecoder.decode(p, "UTF-8")).toString
    })
  }

  /** Rows added after `fromExclusive`, with the new high-water version
    * to store for the next poll. */
  def readChanges(spark: SparkSession, tablePath: String,
      fromExclusive: Long, ignoreChanges: Boolean = false,
      ignoreDeletes: Boolean = false): (Long, DataFrame) = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    val c = changedFiles(spark, tablePath, fromExclusive, ignoreChanges, ignoreDeletes)
    val df =
      if (c.addedFiles.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[Row](), snap.schema)
      else spark.read.schema(snap.schema)
        .option("basePath", tablePath).parquet(c.addedFiles: _*)
    (c.toVersion, df)
  }
}
