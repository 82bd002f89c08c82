package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.SessionCaches.TrackedPersist

/** Event-stream operators over the `events` table (SURVEY §2.2 window /
  * streaming rows; as-of/theta-join row): as-of join,
  * sessionization, pivot, tumbling windows, distinct-count (exact and HLL),
  * and JSON extraction. These are the batch forms; the streaming module
  * runs the same aggregations through Structured Streaming.
  *
  * Scale notes: every operator shuffles once on its natural key
  * (user_id / event_type / window), and the as-of join is the O(n log n)
  * single-window form — NOT the O(n²) inequality self-join a naive
  * translation would produce (that's what the oracle SQL uses, since
  * correctness at sf0.01 is the only thing asked of DuckDB here).
  */
object EventOps {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[GraftQuery] = Seq(

    // As-of join: for each purchase, the most recent signup at-or-before
    // it for the same user. A RANGE frame to CURRENT ROW over ts includes
    // equal-ts peers — exactly the s.ts <= p.ts join semantics.
    GraftQuery("q51_asof_join",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .withColumn("asof_ts",
            max(when(col("event_type") === "signup", col("ts"))).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "asof_ts")
          .orderBy("event_id")
      },
      Some("SELECT p.event_id, p.user_id, MAX(s.ts) AS asof_ts FROM events p " +
        "LEFT JOIN events s ON p.user_id = s.user_id AND s.event_type = 'signup' " +
        "AND s.ts <= p.ts WHERE p.event_type = 'purchase' " +
        "GROUP BY p.event_id, p.user_id ORDER BY p.event_id")),

    // Sessionization: 30-minute inactivity gap starts a new session.
    // Gap boundary is `>=`: an event arriving EXACTLY gap-after the
    // previous one opens a new session — the same half-open-interval
    // semantics as session_window (q86), so the two formulations (and
    // their shared oracle) stay row-identical on boundary data.
    // Session-path transition matrix — the Markov view of user journeys
    // (which event typically follows which): per (prev_type, type) pair,
    // the transition count and probability. One lag window on the
    // (user_id, ts, event_id) ordering the whole events family shares,
    // then a |types|²-bounded aggregate; the probability divides by the
    // prev-type row total via a second tiny aggregate joined back
    // (broadcast — ≤|types| rows). Exact integers; mirrored division.
    GraftQuery("q150_event_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = ev(s, d)
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy("prev_type").agg(sum("n").as("tot"))
        pairs.join(broadcast(totals), Seq("prev_type"))
          .select(col("prev_type"), col("event_type"), col("n"),
            (col("n").cast("double") / col("tot").cast("double")).as("p"))
          .orderBy("prev_type", "event_type")
      },
      Some("WITH x AS (SELECT user_id, event_type, LAG(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
        "pr AS (SELECT prev_type, event_type, COUNT(*) AS n FROM x " +
        "WHERE prev_type IS NOT NULL GROUP BY 1, 2), " +
        "t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot FROM pr GROUP BY 1) " +
        "SELECT pr.prev_type, pr.event_type, pr.n, " +
        "CAST(pr.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p " +
        "FROM pr JOIN t ON pr.prev_type = t.prev_type " +
        "ORDER BY pr.prev_type, pr.event_type")),

    GraftQuery("q52_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev(s, d)
          .withColumn("lag_ts", lag("ts", 1).over(w))
          .withColumn("nf",
            when(col("lag_ts").isNull ||
              col("ts") >= col("lag_ts") + expr("INTERVAL 30 MINUTE"), 1)
              .otherwise(0))
          .groupBy("user_id")
          .agg(sum("nf").cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("WITH x AS (SELECT user_id, ts, LAG(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts FROM events), " +
        "f AS (SELECT user_id, CASE WHEN lag_ts IS NULL OR ts >= lag_ts + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS nf FROM x) " +
        "SELECT user_id, CAST(SUM(nf) AS BIGINT) AS n_sessions, COUNT(*) AS n_events " +
        "FROM f GROUP BY user_id ORDER BY user_id")),

    // Pivot with a declared value list (dynamic pivot would need a driver
    // round-trip to enumerate keys — never do that at scale).
    GraftQuery("q53_pivot",
      (s, d) => ev(s, d)
        .groupBy("user_id")
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0, EventTypes)
        .orderBy("user_id"),
      Some("SELECT user_id, " + EventTypes.map(t =>
        s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(", ") +
        " FROM events GROUP BY user_id ORDER BY user_id")),

    // Epoch-aligned 1-hour tumbling window (batch form of the streaming
    // windowed aggregation; window(ts, '1 hour').start ≡ date_trunc).
    GraftQuery("q54_window_tumbling",
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sv"))
        .orderBy("ws", "event_type"),
      Some("SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv " +
        "FROM events GROUP BY 1, 2 ORDER BY ws, event_type")),

    GraftQuery("q55_distinct_users",
      (s, d) => ev(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("du"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("SELECT event_type, COUNT(DISTINCT user_id) AS du, COUNT(*) AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // HLL++ sketch — the 100 TB form of q55 (no per-key exact set, fixed
    // sketch memory, single shuffle). r9: ORACLED ERROR-BOUND ROW — the
    // exact distinct counts are q55's own SQL, carried as real
    // differential columns, and `approx_ok` certifies the HLL++ estimate
    // within 10% of them (default rsd 0.05 — double headroom); an
    // estimator regression now breaks the hash. Both aggregates run in
    // the same single-shuffle groupBy.
    GraftQuery("q56_approx_distinct_users",
      (s, d) => ev(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("du"),
          approx_count_distinct(col("user_id")).as("adu"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("du"), col("n"),
          (abs(col("adu") - col("du")) <= col("du") * 0.1)
            .cast("long").as("approx_ok"))
        .orderBy("event_type"),
      Some("SELECT event_type, COUNT(DISTINCT user_id) AS du, COUNT(*) AS n, " +
        "CAST(1 AS BIGINT) AS approx_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // Range join (theta-join row): events within the preceding 5 minutes
    // for the same user. The oracle states it as the inequality self-join;
    // the Spark plan is the O(n log n) form — a RANGE window frame in
    // microseconds ([-5min, -1µs] ≡ b.ts >= a.ts - 5min AND b.ts < a.ts),
    // which shuffles once on user_id instead of materializing pair blowup.
    GraftQuery("q67_range_join",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
          .rangeBetween(-300000000L, -1L)
        ev(s, d)
          .withColumn("prior_5m", count(lit(1)).over(w))
          .filter(col("event_type") === "error")
          .select("event_id", "prior_5m")
          .orderBy("event_id")
      },
      Some("SELECT a.event_id, COUNT(b.event_id) AS prior_5m FROM events a " +
        "LEFT JOIN events b ON a.user_id = b.user_id AND b.ts < a.ts " +
        "AND b.ts >= a.ts - INTERVAL 5 MINUTE " +
        "WHERE a.event_type = 'error' GROUP BY a.event_id ORDER BY a.event_id")),

    // Native session_window sessionization — same semantics as q52's
    // lag-based form (30-minute gap), expressed through Spark's built-in
    // session operator (merging windows, map-side partial merge; also
    // the streaming-native form). Same oracle as q52 — the two
    // formulations must agree row-for-row.
    GraftQuery("q86_session_window",
      (s, d) => ev(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("ev"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("ev").as("n_events"))
        .orderBy("user_id"),
      Some("WITH x AS (SELECT user_id, ts, LAG(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts FROM events), " +
        "f AS (SELECT user_id, CASE WHEN lag_ts IS NULL OR ts >= lag_ts + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS nf FROM x) " +
        "SELECT user_id, CAST(SUM(nf) AS BIGINT) AS n_sessions, COUNT(*) AS n_events " +
        "FROM f GROUP BY user_id ORDER BY user_id")),

    GraftQuery("q57_json_extract",
      (s, d) => ev(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sk"))
        .orderBy("event_type"),
      Some("SELECT event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sk " +
        "FROM events GROUP BY event_type ORDER BY event_type"))
    ,

    // Funnel analysis (sequential-pattern detection): how far does each
    // user get through view → click-within-6h → purchase-within-6h with
    // strictly increasing timestamps? The MATCH_RECOGNIZE-shaped
    // question every product pipeline asks (the conversion window is
    // what makes the stages discriminate — unbounded, everyone with 50
    // events eventually converts). Scale shape: three filtered
    // min-aggregations and the final stage join are ALL keyed on
    // user_id — one hash partitioning reused end-to-end (no windows
    // over the full event stream, no per-user event-list buffering);
    // each stage's input is only the users who survived the previous
    // one.
    GraftQuery("q93_funnel",
      (s, d) => {
        val e = ev(s, d)
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = e.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 6 HOUR"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 6 HOUR"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        e.select("user_id").distinct()
          .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
          .join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
          .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
          .select(when(col("s3").isNotNull, 3L).when(col("s2").isNotNull, 2L)
            .when(col("s1").isNotNull, 1L).otherwise(0L).as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some("WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id " +
        "AND e.event_type = 'click' AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 6 HOUR GROUP BY 1), " +
        "p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id " +
        "AND e.event_type = 'purchase' AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 6 HOUR GROUP BY 1), " +
        "u AS (SELECT DISTINCT user_id FROM events), " +
        "s AS (SELECT CAST(CASE WHEN p.user_id IS NOT NULL THEN 3 WHEN c.user_id IS NOT NULL THEN 2 " +
        "WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage " +
        "FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)) " +
        "SELECT stage, COUNT(*) AS n_users FROM s GROUP BY stage ORDER BY stage"))
    ,

    // Cohort retention: users grouped by the week of their first event,
    // counted in each later week they were active — the triangle every
    // growth dashboard draws. Scale shape: the first-event aggregation
    // and the activity join share the user_id partitioning; the
    // per-(user, cohort, offset) distinct collapses a user's events
    // map-side before the final (cohort, offset) count. Week offsets are
    // exact integers (week starts differ by multiples of 7 days), so
    // the result is engine-identical.
    GraftQuery("q96_retention",
      (s, d) => {
        val e = ev(s, d)
        val first = e.groupBy("user_id").agg(min("ts").as("first_ts"))
        e.join(first, "user_id")
          .select(col("user_id"),
            to_date(date_trunc("week", col("first_ts"))).as("cohort_week"),
            (datediff(to_date(date_trunc("week", col("ts"))),
              to_date(date_trunc("week", col("first_ts")))) / 7)
              .cast("long").as("week_offset"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1), " +
        "a AS (SELECT DISTINCT e.user_id, CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week, " +
        "CAST(date_diff('day', date_trunc('week', f.first_ts), date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset " +
        "FROM events e JOIN f USING (user_id)) " +
        "SELECT cohort_week, week_offset, COUNT(*) AS n_active " +
        "FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_offset"))
    ,

    // Time-series gap fill + forward fill — regularize each user's event
    // stream onto an hourly grid (the feature-engineering step before
    // any windowed model input). The grid itself NEVER materializes:
    // a forward-filled grid hour always carries the value of the last
    // PRESENT hour at-or-before it, so the grid-sum telescopes to
    // Σ hv_i × weight_i where weight_i is the whole-hour distance to the
    // user's next present hour (1 for the last row — it only covers
    // itself). One (user, hour) rollup exchange, one lead() window on
    // the user key, and the final per-user agg rides the window's
    // partitioning — grid size (users × span) drops out of the cost
    // entirely, which at 100 TB is the difference between work
    // proportional to EVENTS and work proportional to users × years of
    // wall-clock hours. The decimal weight product keeps the money rule
    // exact: hv × integer-hours is exact in decimal, so fill_sum equals
    // the grid-summed oracle bit-for-bit after the final double cast.
    GraftQuery("q107_gap_fill",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // r13: the whole pipeline runs in INTEGER hour-bucket space —
        // under the UTC session, date_trunc('hour', ts) is exactly
        // FLOOR(unix_micros(ts) / 3600e6), and no output column is a
        // timestamp, so the per-row timestamp ceremony (truncate →
        // re-encode → unix_timestamp at three later points) collapses
        // to one integer division at the scan. r14: the division is a
        // true floor in int64 — `x div d` truncates toward zero, which
        // only equals date_trunc's floor for ts >= epoch; subtracting
        // pmod (always non-negative) first makes the identity hold for
        // pre-1970 timestamps too, with no double round-trip (micros
        // exceed 2^53, so floor(x / 3.6e9) through double is NOT exact).
        // Bucket arithmetic
        // (lead-diff weights, max-min spans) is then pure int64 —
        // identical values, measured at a third of the executor time.
        // ONE exchange on the natural key: the lead() window and the
        // final rollup both need user_id clustering, and hash(user_id)
        // also SATISFIES the (user_id, hb) rollup's ClusteredDistribution
        // (partition exprs ⊆ grouping keys), so an explicit user_id
        // repartition lets every downstream operator ride the same
        // exchange — 3 shuffles collapse to 1 + the output range sort
        // (r13; the skew exposure is identical to before, because the
        // window stage already required whole-user co-location).
        val hourly = ev(s, d)
          .repartition(col("user_id"))
          .groupBy(col("user_id"),
            expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000")
              .as("hb"))
          .agg(sum(col("value").cast(DecimalType(18, 2))).as("hv"))
        val w = Window.partitionBy("user_id").orderBy("hb")
        hourly
          .withColumn("weight",
            coalesce(lead("hb", 1).over(w) - col("hb"), lit(1L)))
          .groupBy("user_id")
          .agg(
            (max("hb") - min("hb") + 1L).cast("long").as("n_hours"),
            ((max("hb") - min("hb") + 1L) - count(lit(1))).cast("long")
              .as("n_gaps"),
            sum(col("hv") * col("weight")).cast("double").as("fill_sum"))
          .orderBy("user_id")
      },
      Some("WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS h, " +
        "SUM(CAST(value AS DECIMAL(18,2))) AS hv FROM events GROUP BY 1, 2), " +
        "b AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1), " +
        "grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b), " +
        "j AS (SELECT g.user_id, g.h, hourly.hv FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h), " +
        "f AS (SELECT user_id, hv, last_value(hv IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv FROM j) " +
        "SELECT user_id, COUNT(*) AS n_hours, " +
        "CAST(SUM(CASE WHEN hv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps, " +
        "CAST(SUM(fv) AS DOUBLE) AS fill_sum FROM f GROUP BY user_id ORDER BY user_id"))
    ,

    // RFM segmentation — recency/frequency/monetary quintiles per user.
    // NOT a global ntile window (one partition holding every user): the
    // quintile boundaries are a one-row percentile aggregate broadcast
    // back over the per-user metrics (q109's threshold shape ×3), so
    // bucketing is a narrow in-row comparison sum and the only exchanges
    // are the user rollup and the final sort. Monetary goes through
    // DECIMAL(18,2) (money rule); recency compares in epoch micros
    // (exact int64 below 2^53, so the interpolated double boundary is
    // engine-stable).
    GraftQuery("q113_rfm",
      (s, d) => {
        val qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
        val per = ev(s, d).groupBy("user_id")
          .agg(unix_micros(max("ts")).as("r"),
            count(lit(1)).as("f"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("m"))
        val thr = per.agg(
          expr(s"percentile(r, $qs)").as("rt"),
          expr(s"percentile(f, $qs)").as("ft"),
          expr(s"percentile(m, $qs)").as("mt"))
        def bucket(c: Column, t: Column): Column =
          (1 to 4).foldLeft(lit(1L))((acc, i) =>
            acc + (c >= element_at(t, i)).cast("long"))
        per.crossJoin(broadcast(thr))
          .select(col("user_id"),
            bucket(col("r"), col("rt")).as("r_q"),
            bucket(col("f").cast("double"), col("ft")).as("f_q"),
            bucket(col("m"), col("mt")).as("m_q"))
          .orderBy("user_id")
      },
      Some("WITH per AS (SELECT user_id, epoch_us(MAX(ts)) AS r, COUNT(*) AS f, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m FROM events GROUP BY 1), " +
        "t AS (SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rt, " +
        "quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS ft, " +
        "quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mt FROM per) " +
        "SELECT user_id, " +
        "CAST(1 + CAST(r >= rt[1] AS INT) + CAST(r >= rt[2] AS INT) + CAST(r >= rt[3] AS INT) + CAST(r >= rt[4] AS INT) AS BIGINT) AS r_q, " +
        "CAST(1 + CAST(f >= ft[1] AS INT) + CAST(f >= ft[2] AS INT) + CAST(f >= ft[3] AS INT) + CAST(f >= ft[4] AS INT) AS BIGINT) AS f_q, " +
        "CAST(1 + CAST(m >= mt[1] AS INT) + CAST(m >= mt[2] AS INT) + CAST(m >= mt[3] AS INT) + CAST(m >= mt[4] AS INT) AS BIGINT) AS m_q " +
        "FROM per, t ORDER BY user_id"))
    ,

    // Hourly anomaly detection — the observability workload over the
    // event stream: per event type, the 20 most anomalous hours by
    // z-score of the hourly event count against that type's own
    // hourly distribution. Population stats come from EXACT integer
    // sums (Σn, Σn² are int64 aggregates; hourly counts are far below
    // 2^26 so Σn² fits 2^53 — both engines see identical integers) and
    // the mean/σ/z chain is a fixed-order double multiply/divide with a
    // correctly-rounded sqrt (IEEE-exact cross-engine, q114's
    // precedent — no libm transcendentals). σ=0 groups are filtered
    // rather than risking engine-specific 0/0. Scale shape: one
    // (type, hour) exchange with map-side combine collapses the stream
    // to aggregate scale; per-type stats are a ~|types|-row broadcast
    // back onto it; top-k is a TakeOrdered. The hourly rollup is
    // persisted — it feeds both the stats and the probe side, and
    // recomputing it would re-scan events twice.
    GraftQuery("q127_anomaly_hours",
      (s, d) => {
        val hourly = ev(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
          .persistTracked()
        val stats = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("hours"), sum("n").as("sn"),
            sum(col("n") * col("n")).as("sn2"))
        val mean = col("sn").cast("double") / col("hours").cast("double")
        val variance = col("sn2").cast("double") / col("hours").cast("double") -
          (col("sn").cast("double") / col("hours").cast("double")) *
            (col("sn").cast("double") / col("hours").cast("double"))
        hourly.join(broadcast(stats), "event_type")
          .filter(sqrt(variance) > lit(0.0))
          .select(col("event_type"), col("h"), col("n"),
            ((col("n").cast("double") - mean) / sqrt(variance)).as("z"))
          .orderBy(col("z").desc, col("event_type"), col("h"))
          .limit(20)
      },
      Some("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
        "COUNT(*) AS n FROM events GROUP BY 1, 2), " +
        "st AS (SELECT event_type, COUNT(*) AS hours, SUM(n) AS sn, " +
        "SUM(n * n) AS sn2 FROM hourly GROUP BY 1), " +
        "z AS (SELECT hourly.event_type, h, n, " +
        "(CAST(n AS DOUBLE) - CAST(sn AS DOUBLE) / CAST(hours AS DOUBLE)) / " +
        "sqrt(CAST(sn2 AS DOUBLE) / CAST(hours AS DOUBLE) - " +
        "(CAST(sn AS DOUBLE) / CAST(hours AS DOUBLE)) * " +
        "(CAST(sn AS DOUBLE) / CAST(hours AS DOUBLE))) AS z, " +
        "sqrt(CAST(sn2 AS DOUBLE) / CAST(hours AS DOUBLE) - " +
        "(CAST(sn AS DOUBLE) / CAST(hours AS DOUBLE)) * " +
        "(CAST(sn AS DOUBLE) / CAST(hours AS DOUBLE))) AS sd " +
        "FROM hourly JOIN st ON hourly.event_type = st.event_type) " +
        "SELECT event_type, h, n, z FROM z WHERE sd > 0.0 " +
        "ORDER BY z DESC, event_type, h LIMIT 20"))
  )
}
