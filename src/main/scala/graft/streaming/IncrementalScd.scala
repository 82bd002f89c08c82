package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ScdPipeline

/** Incremental SCD Type 2 sync: the streaming generalization the
  * north star asks for (the reference re-reads the whole source every run,
  * delta_to_postgres_scd.py:269-337 — here each arriving micro-batch
  * merges incrementally via foreachBatch).
  *
  * Target storage is versioned parquet snapshots (`v<batchId>/` plus a
  * `_CURRENT` pointer file) — a minimal transactional-commit pattern
  * standing in for a Delta/Iceberg table in this parquet-only environment:
  * readers always see a complete snapshot, never a partial overwrite, and
  * the pointer flip is the atomic commit. With Delta jars present the
  * foreachBatch body becomes a single MERGE INTO and nothing else changes.
  */
object IncrementalScd {

  private def currentPointer(targetDir: String) = Paths.get(targetDir, "_CURRENT")

  /** Read the current SCD snapshot, or None before the first commit. */
  def readCurrent(spark: SparkSession, targetDir: String): Option[DataFrame] = {
    val p = currentPointer(targetDir)
    if (Files.exists(p)) {
      val v = Files.readString(p).trim
      Some(spark.read.parquet(s"$targetDir/$v"))
    } else None
  }

  /** Delta-backed variant: each micro-batch sync is ONE atomic Delta
    * overwrite commit through [[graft.sources.DeltaWrite]] — readers
    * replaying the log always see a complete snapshot, and every sync
    * point stays time-travelable (`DeltaLog.read(_, _, versionAsOf)`),
    * which the `_CURRENT`-pointer form cannot offer. This is the
    * reference's `USING DELTA` SCD target (unity_catalog_scd.py:123-128)
    * made incremental. */
  def startDelta(
      source: DataFrame,
      tablePath: String,
      businessKeys: Seq[String],
      clock: Long => Timestamp = _ => new Timestamp(System.currentTimeMillis()))
    : StreamingQuery = {
    import graft.sources.{DeltaLog, DeltaWrite}
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tablePath/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val target =
          if (DeltaLog.isDeltaTable(spark, tablePath))
            DeltaLog.read(spark, tablePath)
          else ScdPipeline.emptyTarget(batch)
        val (next, summary) =
          ScdPipeline.sync(target, batch, businessKeys, now = clock(batchId))
        // Safe to write while `next`'s plan still reads the previous
        // version: copy-on-write tombstones old files in the log but
        // never deletes them from disk, and the staging write completes
        // before the remove+add commit flips the snapshot.
        val v = DeltaWrite.write(next, tablePath,
          org.apache.spark.sql.SaveMode.Overwrite)
        println(s"[scd-stream] batch=$batchId $summary -> delta v$v")
      }
      .start()
  }

  /** Start the incremental sync of a streaming business-row source into an
    * SCD2 target. `clock` maps batchId → effective timestamp (injectable
    * for deterministic tests; production uses wall clock). */
  def start(
      source: DataFrame,
      targetDir: String,
      businessKeys: Seq[String],
      clock: Long => Timestamp = _ => new Timestamp(System.currentTimeMillis()))
    : StreamingQuery = {
    Files.createDirectories(Paths.get(targetDir))
    source.writeStream
      .outputMode("append")
      // The checkpoint is what makes restarts incremental: a re-started
      // sync processes only files that arrived since the last commit.
      .option("checkpointLocation", s"$targetDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val target = readCurrent(spark, targetDir)
          .getOrElse(ScdPipeline.emptyTarget(batch))
        val (next, summary) =
          ScdPipeline.sync(target, batch, businessKeys, now = clock(batchId))
        val version = s"v$batchId"
        next.write.mode("overwrite").parquet(s"$targetDir/$version")
        // Atomic commit: flip the pointer only after the snapshot is fully
        // written, via write-temp-then-ATOMIC_MOVE — a direct writeString
        // truncates first, so a concurrent reader could see an empty file.
        val tmp = Paths.get(targetDir, s"_CURRENT.tmp.$batchId")
        Files.writeString(tmp, version)
        Files.move(tmp, currentPointer(targetDir),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        println(s"[scd-stream] batch=$batchId $summary -> $version")
      }
      .start()
  }
}
