package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Summary of one SCD sync, mirroring the reference's returned dict
  * (delta_to_postgres_scd.py:322-330). */
final case class ScdSummary(
    insertedNew: Long, closedChanged: Long, unchanged: Long, totalRows: Long)

/** SCD Type 2 merge as a pure, distributed DataFrame transformation.
  *
  * Reference semantics (delta_to_postgres_scd.py:177-267) preserved:
  *   - business-key identity; uniqueness over current rows only;
  *   - change detection folds NULL to '' before comparing
  *     (`COALESCE(CAST(col AS STRING), '') <>  ...`, :252) — so a NULL→''
  *     transition is NOT a change (documented bug-compatible behavior);
  *   - net effect per batch: close changed, insert changed+new, ignore
  *     identical (:242-261);
  *   - column mapping applied before the merge (:286-298).
  *
  * Deviations (documented, SURVEY §7.3):
  *   - in-batch duplicate business keys are pre-deduplicated
  *     deterministically (the reference would hit PostgreSQL's
  *     "affect row twice" error).
  *
  * `scd_id` is DENSE (maxId+1, maxId+2, …), matching the reference's
  * PostgreSQL sequence, via [[graft.sources.DeltaIdentity]]'s two-pass
  * distributed assignment (per-partition counts to the driver, then an
  * executor-side offset stamp) — dense without serializing the cluster
  * through one partition.
  *
  * Scale shape: one shuffle keyed on the business key (the full-outer
  * join); history rows are untouched (no rewrite of closed partitions when
  * the target store supports appends — here the whole snapshot is returned
  * and the caller persists it).
  */
object ScdPipeline {

  val ScdCols: Seq[String] =
    Seq("scd_id", "effective_date", "end_date", "is_current", "created_at", "updated_at")

  /** Reference change predicate (:250-254): any non-key column differs
    * after NULL→'' folding on the string rendering. */
  private def changed(cols: Seq[String], l: String => Column, r: String => Column): Column =
    cols.map(c =>
        coalesce(l(c).cast("string"), lit("")) =!= coalesce(r(c).cast("string"), lit("")))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Deterministic in-batch dedup: keep one row per key (greatest by the
    * string rendering of all non-key columns — arbitrary but stable). */
  private def dedupBatch(batch: DataFrame, keys: Seq[String]): DataFrame = {
    val others = batch.columns.filterNot(keys.contains)
    if (others.isEmpty) batch.dropDuplicates(keys) // pure-key table: no
    else {                                         // orderable payload
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(others.map(c => coalesce(col(c).cast("string"), lit("")).desc): _*)
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** Create an empty SCD target with the incoming business schema. */
  def emptyTarget(incoming: DataFrame): DataFrame =
    incoming.limit(0)
      .withColumn("scd_id", lit(null).cast(LongType))
      .withColumn("effective_date", lit(null).cast("timestamp"))
      .withColumn("end_date", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(null).cast("boolean"))
      .withColumn("created_at", lit(null).cast("timestamp"))
      .withColumn("updated_at", lit(null).cast("timestamp"))

  /** Merge one incoming snapshot into the SCD target; returns the new
    * target snapshot plus the change summary. `now` is injected so syncs
    * are reproducible (the reference uses CURRENT_TIMESTAMP, :198-203). */
  def sync(
      target: DataFrame,
      incomingRaw: DataFrame,
      businessKeys: Seq[String],
      columnMapping: Map[String, String] = Map.empty,
      now: Timestamp): (DataFrame, ScdSummary) = {

    // A17 column mapping: rename mapped columns, keep the rest.
    val mapped = columnMapping.foldLeft(incomingRaw) {
      case (d, (from, to)) => d.withColumnRenamed(from, to)
    }
    val incoming = dedupBatch(mapped, businessKeys)
    val bizCols = incoming.columns.toSeq
    val nonKey = bizCols.filterNot(businessKeys.contains)

    val current = target.filter(col("is_current"))
    val history = target.filter(!col("is_current"))

    // Presence flags that survive all-null payloads: key columns are join
    // keys (coalesced), so detect sides via scd_id / a sentinel.
    val hasT = col("t.scd_id").isNotNull
    val probe = incoming.withColumn("__s_present", lit(true))
    val j = current.as("t").join(probe.as("s"), businessKeys, "full_outer")
    val hasS = col("__s_present").isNotNull
    val isChanged = changed(nonKey, c => col(s"t.$c"), c => col(s"s.$c"))

    val keptCurrent = j.filter(hasT && (!hasS || !isChanged))
      .select(businessKeys.map(col) ++ nonKey.map(c => col(s"t.$c")) ++
        ScdCols.map(c => col(s"t.$c")): _*)
    val closedOld = j.filter(hasT && hasS && isChanged)
      .select(businessKeys.map(col) ++ nonKey.map(c => col(s"t.$c")) ++ Seq(
        col("t.scd_id"), col("t.effective_date"),
        lit(now).as("end_date"), lit(false).as("is_current"),
        col("t.created_at"), lit(now).as("updated_at")): _*)
    val toInsert = j.filter(hasS && (!hasT || isChanged))
      .select(businessKeys.map(col) ++ nonKey.map(c => col(s"s.$c")): _*)

    // One pass over the target yields the id offset AND the history
    // count (ADVICE r01: history.count() was a second job per sync, and
    // the old broadcast-scalar max subtree re-ran on every downstream
    // materialization of the snapshot — costly in the streaming path).
    val tstats = target.agg(
      coalesce(max("scd_id"), lit(0L)).as("__max"),
      coalesce(sum(when(!col("is_current"), 1).otherwise(0)), lit(0L)).as("__nh")).head
    val (maxId, nHistory) = (tstats.getLong(0), tstats.getLong(1))
    val (withIds, _) = graft.sources.DeltaIdentity.assign(
      toInsert, "scd_id", start = 1L, step = 1L, firstValue = maxId + 1)
    val inserted = withIds
      .withColumn("effective_date", lit(now))
      .withColumn("end_date", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
      .withColumn("created_at", lit(now))
      .withColumn("updated_at", lit(now))

    val order = bizCols ++ ScdCols
    val result = history.select(order.map(col): _*)
      .unionByName(keptCurrent.select(order.map(col): _*))
      .unionByName(closedOld.select(order.map(col): _*))
      .unionByName(inserted.select(order.map(col): _*))

    // One aggregation pass for the whole summary (four separate counts
    // would re-execute the join four times).
    val stats = j.agg(
      coalesce(sum(when(hasT && hasS && isChanged, 1).otherwise(0)), lit(0L)).as("closed"),
      coalesce(sum(when(hasS && !hasT, 1).otherwise(0)), lit(0L)).as("new"),
      coalesce(sum(when(hasT && hasS && !isChanged, 1).otherwise(0)), lit(0L)).as("unchanged"),
      coalesce(sum(when(hasT && !hasS, 1).otherwise(0)), lit(0L)).as("cur_only")).head
    val (nClosed, nNew, nUnchanged, nCurOnly) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    (result, ScdSummary(
      insertedNew = nNew + nClosed, // changed rows insert a fresh version
      closedChanged = nClosed,
      unchanged = nUnchanged,
      // history + all current (kept or closed) + freshly inserted
      totalRows = nHistory + nClosed + nUnchanged + nCurOnly + nNew + nClosed))
  }
}
