package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function and set-operation breadth for the Tier B surface
  * (SURVEY §2.2 "implied" rows): string/date/math suites, array ops over
  * real array data, EXCEPT/INTERSECT, and ROLLUP. All single-pass narrow
  * transforms or single aggregations; every query oracle-exact.
  *
  * Dialect notes baked in: Spark's ceil/floor of a double return BIGINT
  * (DuckDB: DOUBLE — cast there); EXTRACT returns BIGINT in DuckDB (cast
  * Spark's int); element access is 0-based get() here, 1-based [] there;
  * dayofweek is intentionally absent (Sunday=1 vs ISO mismatch).
  */
object ScalarOps {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    GraftQuery("q32_string_suite",
      (s, d) => T(s, d, "customer")
        .select(col("c_custkey"),
          concat(col("c_name"), lit("_"), col("c_mktsegment")).as("cn"),
          expr("replace(c_name, 'Customer', 'C')").as("rep"),
          element_at(split(col("c_name"), "#"), 2).as("num_part"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
          ltrim(rtrim(col("c_name"))).as("tr"))
        .orderBy("c_custkey")
        .limit(100),
      Some("SELECT c_custkey, CONCAT(c_name, '_', c_mktsegment) AS cn, " +
        "REPLACE(c_name, 'Customer', 'C') AS rep, " +
        "string_split(c_name, '#')[2] AS num_part, " +
        "LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS pad, " +
        "LTRIM(RTRIM(c_name)) AS tr " +
        "FROM customer ORDER BY c_custkey LIMIT 100")),

    GraftQuery("q33_date_suite",
      (s, d) => T(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mstart"))
        .orderBy("o_orderkey")
        .limit(100),
      Some("SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate) AS y, " +
        "EXTRACT(MONTH FROM o_orderdate) AS m, EXTRACT(DAY FROM o_orderdate) AS dom, " +
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart " +
        "FROM orders ORDER BY o_orderkey LIMIT 100")),

    // Array ops over genuine array data (embedding: array<float>).
    GraftQuery("q34_array_ops",
      (s, d) => T(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          get(col("embedding"), lit(0)).as("e0"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"))
        .orderBy("vec_id"),
      Some("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
        "embedding[1] AS e0, " +
        "CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos " +
        "FROM embeddings ORDER BY vec_id")),

    GraftQuery("q35_setops",
      (s, d) => {
        val c = T(s, d, "customer").select(col("c_custkey").as("k"))
        val o = T(s, d, "orders").select(col("o_custkey").as("k"))
        val onlyCust = c.except(o).agg(count(lit(1)).as("only_cust"))
        val both = c.intersect(o).agg(count(lit(1)).as("both_sides"))
        onlyCust.crossJoin(broadcast(both))
      },
      Some("SELECT (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer EXCEPT " +
        "SELECT o_custkey FROM orders)) AS only_cust, " +
        "(SELECT COUNT(*) FROM (SELECT c_custkey FROM customer INTERSECT " +
        "SELECT o_custkey FROM orders)) AS both_sides")),

    // Window-function breadth: ranking, offset, and frame-bounded value
    // functions in one pass. o_orderkey is unique per customer partition,
    // so every window order is total and rank ≡ dense_rank ≡ row_number.
    GraftQuery("q64_window_suite",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            ntile(4).over(w).cast("long").as("quartile"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            first("o_orderkey").over(wf).as("first_ok"),
            last("o_orderkey").over(wf).as("last_ok"))
          .filter(col("o_custkey") < 200)
          .orderBy("o_custkey", "o_orderkey")
          .drop("o_totalprice")
      },
      Some("SELECT o_custkey, o_orderkey, " +
        "CAST(RANK() OVER w AS BIGINT) AS rnk, " +
        "CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk, " +
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile, " +
        "LAG(o_totalprice, 1) OVER w AS prev_price, " +
        "LEAD(o_totalprice, 1) OVER w AS next_price, " +
        "FIRST_VALUE(o_orderkey) OVER wf AS first_ok, " +
        "LAST_VALUE(o_orderkey) OVER wf AS last_ok " +
        "FROM orders WHERE o_custkey < 200 " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey), " +
        "wf AS (PARTITION BY o_custkey ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey")),

    GraftQuery("q36_rollup",
      (s, d) => T(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")),

    // Exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the (n-1)p interpolation definition.
    // r14 SCALE rework: Spark's percentile() aggregate buffers a
    // value→count OpenHashMap per group — for a CONTINUOUS column
    // (l_extendedprice: distinct ≈ rows) that map is data-proportional
    // EXECUTOR HEAP, the one aggregation state in the corpus that grew
    // with the data (everything else is capped/sketched). The exact
    // sort-based form instead ranks each group's rows in a window
    // (WindowExec's buffer is disk-SPILLABLE — q178's documented
    // tradeoff, here strictly better than an OOM), keeps only the two
    // bracketing ranks per requested p, and interpolates with
    // quantile_cont's exact double chain (v_lo + d·(v_hi − v_lo), d =
    // (n−1)p − ⌊(n−1)p⌋ — duck-pinned, hash-exact). Same one group-key
    // exchange; the flag groups sort in parallel. (The global
    // single-threshold forms — q109/q113 — keep percentile(): an empty
    // partitionBy window would serialize onto one task, trading an
    // in-memory buffer for a worse bottleneck.)
    GraftQuery("q39_percentiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Hybrid exact form (r15 opt, guide §1.2/§2.4): l_quantity is an
        // INTEGER-VALUED domain column (TPC-H: 1..50), so Spark's
        // `percentile()` value→count map is bounded by the 50-value
        // domain — the r14 "data-proportional aggregation state" hazard
        // (the reason the sort form exists) only applies to CONTINUOUS
        // columns. Both quantity percentiles therefore run as UNORDERED
        // window aggregates (one buffered pass, bounded state — the
        // pre-r14 hash-exact expression), and only l_extendedprice (truly
        // continuous) keeps the r14 sort + bracketing-rank form. Net: the
        // same single flag exchange, ONE in-partition sort instead of
        // three window passes (measured 2.0 → 1.2 s at sf0.1; plan diff
        // "3 Window + 2 Sort → 2 Window + 1 Sort" in plans/r15).
        // lineitem's quantity/price are non-null by schema; a
        // null-bearing column would need its own branch so its n
        // excludes nulls per column.
        val w = Window.partitionBy("l_returnflag")
        val ranked = T(s, d, "lineitem")
          .select(col("l_returnflag"),
            col("l_quantity").cast("double").as("__q"),
            col("l_extendedprice").cast("double").as("__p"))
          .withColumn("__rnp", row_number().over(w.orderBy("__p")).cast("long"))
          .withColumn("__n", count(lit(1)).over(w))
          .withColumn("__mq", expr("percentile(__q, 0.5)").over(w))
          .withColumn("__pq", expr("percentile(__q, 0.9)").over(w))
        def idx = (col("__n") - 1L).cast("double") * lit(0.5)
        def loRn = floor(idx).cast("long") + 1L
        def hiRn = least(loRn + 1L, col("__n"))
        val keep = col("__rnp") === loRn || col("__rnp") === hiRn
        ranked.filter(keep).groupBy("l_returnflag")
          .agg(max(when(col("__rnp") === loRn, col("__p"))).as("__lo"),
            max(when(col("__rnp") === hiRn, col("__p"))).as("__hi"),
            max("__n").as("__n"),
            max("__mq").as("med_qty"), max("__pq").as("p90_qty"))
          .select(col("l_returnflag"), col("med_qty"), col("p90_qty"), {
            val ix = (col("__n") - 1L).cast("double") * lit(0.5)
            val fr = ix - floor(ix)
            (col("__lo") + fr * (col("__hi") - col("__lo"))).as("med_price")
          })
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty, " +
        "quantile_cont(l_quantity, 0.9) AS p90_qty, " +
        "quantile_cont(l_extendedprice, 0.5) AS med_price " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Statistical moments via the explicit sum/sum-of-squares formula —
    // identical expressions on both engines instead of each engine's own
    // stddev accumulator (Welford vs naive differ in final ulps). Exact
    // here because l_quantity is integer-valued (sums are exact doubles).
    GraftQuery("q63_stats_moments",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"),
          sum(col("l_quantity") * col("l_quantity")).as("sq"))
        .select(col("l_returnflag"), col("n"),
          (col("s") / col("n")).as("mean_qty"),
          // NULLIF guards n=1 groups identically on both engines (Spark's
          // non-ANSI x/0 is NULL, DuckDB's IEEE mode would give NaN).
          sqrt((col("sq") - col("s") * col("s") / col("n")) /
            nullif(col("n") - 1, lit(0))).as("sd_qty"))
        .orderBy("l_returnflag"),
      Some("WITH m AS (SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS s, " +
        "SUM(l_quantity * l_quantity) AS sq FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, s / n AS mean_qty, " +
        "sqrt((sq - s * s / n) / NULLIF(n - 1, 0)) AS sd_qty FROM m ORDER BY l_returnflag")),

    GraftQuery("q38_like_in",
      (s, d) => T(s, d, "part")
        .filter(col("p_type").like("%ECO%") ||
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .groupBy("p_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("p_brand")).as("nb"))
        .orderBy("p_type"),
      Some("SELECT p_type, COUNT(*) AS n, COUNT(DISTINCT p_brand) AS nb FROM part " +
        "WHERE p_type LIKE '%ECO%' OR p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') " +
        "GROUP BY p_type ORDER BY p_type")),

    // Deterministic string aggregation: collect_list order is undefined,
    // so sort before joining — mirrors string_agg(... ORDER BY) exactly.
    GraftQuery("q65_string_agg",
      (s, d) => T(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey"),
      Some("SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations, " +
        "COUNT(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")),

    GraftQuery("q66_union_all",
      (s, d) => {
        val a = T(s, d, "orders").select(col("o_custkey").as("k"))
        val b = T(s, d, "customer").select(col("c_custkey").as("k"))
        a.unionAll(b).agg(count(lit(1)).as("n"), countDistinct(col("k")).as("dk"))
      },
      Some("SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS dk FROM " +
        "(SELECT o_custkey AS k FROM orders UNION ALL SELECT c_custkey FROM customer)")),

    GraftQuery("q37_math_suite",
      (s, d) => T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"), col("l_tax"),
          abs(col("l_discount") - 0.05).as("ad"),
          ceil(col("l_extendedprice")).as("ce"),
          floor(col("l_extendedprice")).as("fl"),
          sqrt(col("l_quantity")).as("sq"),
          pmod(col("l_orderkey"), lit(7L)).as("m7"))
        .orderBy("l_orderkey", "l_quantity", "l_discount", "l_tax", "ce", "fl")
        .limit(100)
        .drop("l_quantity", "l_discount", "l_tax"),
      Some("SELECT l_orderkey, ad, ce, fl, sq, m7 FROM (" +
        "SELECT l_orderkey, l_quantity, l_discount, l_tax, " +
        "ABS(l_discount - 0.05) AS ad, " +
        "CAST(CEIL(l_extendedprice) AS BIGINT) AS ce, " +
        "CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl, " +
        "SQRT(l_quantity) AS sq, l_orderkey % 7 AS m7 FROM lineitem " +
        "ORDER BY l_orderkey, l_quantity, l_discount, l_tax, ce, fl LIMIT 100)"))
  )
}
