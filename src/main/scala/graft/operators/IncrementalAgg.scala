package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DeltaCdf, DeltaLog}

/** Incremental maintenance of a SUM/COUNT-per-key aggregate (the
  * materialized-view pattern) over the row-level change feed: inserts
  * and update post-images add, deletes and update pre-images subtract,
  * and a key whose count reaches zero leaves the view. AVG derives as
  * sum/count downstream; MIN/MAX are NOT maintainable from deltas alone
  * (a deleted maximum needs a rescan) — that asymmetry is inherent to
  * delta maintenance, not this implementation.
  *
  * The feed comes through [[DeltaCdf.changesInRange]]: commits that
  * carry cdc change files are consumed as exact pre/post images
  * (bounded by the rows the DML touched), and commits without them fall
  * back to the copy-on-write multiset diff — so enabling
  * `delta.enableChangeDataFeed` on the base table makes refresh cost
  * proportional to ROWS CHANGED instead of files rewritten.
  *
  * Scale shape: each refresh reads ONLY the commits' change/changed
  * files (bounded by the DML, never the table), reduces them to per-key
  * deltas with map-side combine, and joins against the view on its key
  * — one shuffle keyed like the view itself. Refreshing a 100 TB
  * table's view after a point UPDATE touches what the update wrote,
  * nothing else.
  */
object IncrementalAgg {

  /** The batch form the view maintains: per-key sum + count. */
  def compute(base: DataFrame, key: String, valueCol: String): DataFrame =
    base.groupBy(key)
      .agg(sum(valueCol).as("agg_sum"), count(lit(1)).as("agg_cnt"))

  /** Apply the row-level changes of commits `(fromExclusive, toInclusive]`
    * to a previously computed view. Returns the refreshed view (equal to
    * recomputing from the current snapshot). */
  def refresh(spark: SparkSession, view: DataFrame, tablePath: String,
      fromExclusive: Long, toInclusive: Long,
      key: String, valueCol: String): DataFrame = {
    val deltas =
      if (toInclusive <= fromExclusive) None
      else Some(DeltaCdf.changesInRange(spark, tablePath, fromExclusive + 1,
        toInclusive, DeltaLog.snapshot(spark, tablePath, Some(toInclusive)).schema))
    deltas match {
      case None => view
      case Some(ch) =>
        val signed = ch.withColumn("__sign",
          when(col("_change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L))
        val perKey = signed.groupBy(key).agg(
          sum(col(valueCol) * col("__sign")).as("d_sum"),
          sum(col("__sign")).as("d_cnt"))
        view.join(perKey, Seq(key), "full_outer")
          .select(col(key),
            (coalesce(col("agg_sum"), lit(0.0)) + coalesce(col("d_sum"), lit(0.0)))
              .as("agg_sum"),
            (coalesce(col("agg_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
              .as("agg_cnt"))
          .filter(col("agg_cnt") > 0)
    }
  }
}
