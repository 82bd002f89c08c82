package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.col

/** Attach per-key aggregates to every row of a frame — the "count over
  * key" primitive behind q178's repeated-window detection and q144's
  * per-shingle (nt, df).
  *
  * Two physically different shapes compute the same values:
  *
  *  - `window` (default): `agg OVER (PARTITION BY keys)` — ONE exchange
  *    on the key. The honest cost (r14, ADVICE): Spark's `WindowExec`
  *    buffers every row of each key group in a spillable
  *    `ExternalAppendOnlyUnsafeRowArray` and there is no map-side
  *    partial aggregation, so a ubiquitous key becomes an O(group)
  *    on-disk buffer pinned in a single task. It spills rather than
  *    OOMs, and for long-tailed natural-language keys (shingle df) the
  *    measured 100× exponents are 0.74–0.91 — the right default here.
  *  - `twoPhase` (`spark.graft.windowCount=twoPhase`): groupBy + join
  *    back on the key — map-side partial aggregation keeps per-key
  *    state O(1) in memory regardless of skew, at the price of a second
  *    exchange and a join. The escape hatch for unknown-skew corpora.
  *
  * Both shapes are deterministic and value-identical; the conf only
  * moves where the skew cost lands (disk buffer vs extra exchange).
  */
object WindowCount {
  def attach(df: DataFrame, keys: Seq[String],
             aggs: Seq[(Column, String)]): DataFrame = {
    val mode = df.sparkSession.conf
      .getOption("spark.graft.windowCount").getOrElse("window")
    mode match {
      case "twoPhase" =>
        val head +: tail = aggs.map { case (c, n) => c.as(n) }
        // NULL-SAFE (<=>) join back (ADVICE r14): NULL is a valid
        // PARTITION BY group in the window shape, so a plain equi join
        // here would silently drop NULL-keyed rows — the keys are
        // renamed on the aggregate side and joined with <=> per key,
        // keeping the two shapes value-identical for nullable keys too.
        val agg = keys.foldLeft(
          df.groupBy(keys.map(col): _*).agg(head, tail: _*))(
          (a, k) => a.withColumnRenamed(k, s"__wc_$k"))
        df.join(agg, keys.map(k => col(k) <=> col(s"__wc_$k"))
            .reduce(_ && _))
          .drop(keys.map(k => s"__wc_$k"): _*)
      case _ =>
        val w = Window.partitionBy(keys.map(col): _*)
        aggs.foldLeft(df) { case (acc, (c, n)) =>
          acc.withColumn(n, c.over(w))
        }
    }
  }
}
