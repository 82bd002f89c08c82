package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** One verifiable operator: a Spark plan plus (when SQL-expressible) the
  * exact DuckDB oracle the driver hash-compares against.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The declared relational corpus (SURVEY §2.3 Q01–Q28), re-expressed with
  * the DataFrame API so Catalyst plans it (pushdown, pruning, partial aggs,
  * broadcast joins, TakeOrderedAndProject) with zero hand-scheduling.
  *
  * Determinism contract with the DuckDB oracle:
  *   - every multi-row result carries a total ORDER BY (unique key suffix);
  *   - SUM/AVG over 2-decimal money columns go through DECIMAL(18,2) so the
  *     aggregation is exact (order-independent) in both engines, then cast
  *     to DOUBLE for a stable output schema — a raw double sum would differ
  *     in final ulps between Spark's partial aggregation and DuckDB's
  *     sequential sum;
  *   - integer-valued doubles (l_quantity) sum exactly in IEEE754, no cast;
  *   - MIN/MAX/raw columns pass through bit-identical, no cast;
  *   - COUNT/LENGTH/ROW_NUMBER/EXTRACT are cast to BIGINT on whichever side
  *     defaults narrower, so output schemas agree.
  */
object Relational {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact, order-independent sum of a 2-dp money column, output DOUBLE. */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val all: Seq[GraftQuery] = Seq(

    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data; the
    // extra sort keys make the LIMIT boundary deterministic across engines.
    GraftQuery("q01_scan_limit",
      (s, d) => T(s, d, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_quantity"), col("l_partkey"), col("l_suppkey"))
        .limit(10),
      Some("SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, " +
        "l_extendedprice, l_quantity, l_partkey, l_suppkey LIMIT 10")),

    GraftQuery("q02_count",
      (s, d) => T(s, d, "lineitem").agg(count(lit(1)).as("count")),
      Some("SELECT COUNT(*) AS count FROM lineitem")),

    GraftQuery("q03_projection",
      (s, d) => T(s, d, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_extendedprice", "l_quantity")
        .limit(100),
      Some("SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem " +
        "ORDER BY l_orderkey, l_extendedprice, l_quantity LIMIT 100")),

    GraftQuery("q04_filter_eq",
      (s, d) => T(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'")),

    GraftQuery("q05_filter_bool",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_quantity").between(5, 15) &&
          (col("l_discount") > 0.05 || col("l_tax") < 0.02))
        .agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity BETWEEN 5 AND 15 " +
        "AND (l_discount > 0.05 OR l_tax < 0.02)")),

    // README.md:133 shape — the reference's canonical GROUP BY example.
    GraftQuery("q06_group_count",
      (s, d) => T(s, d, "orders")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("count"))
        .orderBy(col("count").desc, col("o_orderstatus"))
        .limit(5),
      Some("SELECT o_orderstatus, COUNT(*) AS count FROM orders GROUP BY o_orderstatus " +
        "ORDER BY count DESC, o_orderstatus LIMIT 5")),

    // test_pg_query.py:43-46 conditional-aggregation shape (one scan, n counts).
    GraftQuery("q07_conditional_agg",
      (s, d) => T(s, d, "orders").agg(
        count(lit(1)).as("total"),
        count(when(col("o_orderstatus") === "O", 1)).as("open_cnt"),
        count(when(col("o_orderstatus") === "F", 1)).as("done_cnt")),
      Some("SELECT COUNT(*) AS total, COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_cnt, " +
        "COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS done_cnt FROM orders")),

    GraftQuery("q08_agg_suite",
      (s, d) => T(s, d, "lineitem").agg(
        sum(col("l_quantity")).as("sq"), // integer-valued doubles: exact
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"),
        countDistinct(col("l_suppkey")).as("ds")),
      Some("SELECT SUM(l_quantity) AS sq, MIN(l_extendedprice) AS mn, " +
        "MAX(l_extendedprice) AS mx, COUNT(DISTINCT l_suppkey) AS ds FROM lineitem")),

    GraftQuery("q09_having",
      (s, d) => T(s, d, "lineitem")
        .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
        .filter(col("c") > 10)
        .orderBy(col("c").desc, col("l_suppkey"))
        .limit(20),
      Some("SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey " +
        "HAVING COUNT(*) > 10 ORDER BY c DESC, l_suppkey LIMIT 20")),

    GraftQuery("q10_inner_join",
      (s, d) => {
        val c = T(s, d, "customer"); val o = T(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .select("c_name", "o_orderkey")
          .orderBy("o_orderkey")
          .limit(50)
      },
      Some("SELECT c.c_name, o.o_orderkey FROM customer c JOIN orders o " +
        "ON c.c_custkey = o.o_custkey ORDER BY o.o_orderkey LIMIT 50")),

    // The reference's only join shape: edges ⋈ nodes ⋈ nodes (load_memgraph.py:92).
    GraftQuery("q11_two_hop_join",
      (s, d) => {
        val n = T(s, d, "nation"); val r = T(s, d, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("n_name").as("nation"), col("r_name").as("region"))
          .orderBy("nation")
      },
      Some("SELECT n1.n_name AS nation, r.r_name AS region FROM nation n1 " +
        "JOIN region r ON n1.n_regionkey = r.r_regionkey ORDER BY nation")),

    GraftQuery("q12_left_join_agg",
      (s, d) => {
        val c = T(s, d, "customer"); val o = T(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("cnt"))
          .orderBy(col("cnt").desc, col("c_custkey"))
          .limit(20)
      },
      Some("SELECT c.c_custkey, COUNT(o.o_orderkey) AS cnt FROM customer c " +
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey " +
        "ORDER BY cnt DESC, c.c_custkey LIMIT 20")),

    GraftQuery("q13_semi_join",
      (s, d) => {
        val c = T(s, d, "customer"); val o = T(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT COUNT(*) AS n FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)")),

    GraftQuery("q14_anti_join",
      (s, d) => {
        val c = T(s, d, "customer"); val o = T(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT COUNT(*) AS n FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)")),

    // ORDER BY + LIMIT fuses into TakeOrderedAndProjectExec: per-partition
    // top-k then a k-row merge on the driver — no global sort at any scale.
    GraftQuery("q15_topk",
      (s, d) => T(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    GraftQuery("q16_union_distinct",
      (s, d) => {
        val o = T(s, d, "orders").select(col("o_custkey").as("x"))
        val c = T(s, d, "customer").select(col("c_custkey").as("x"))
        o.union(c).distinct().orderBy("x").limit(100)
      },
      Some("SELECT x FROM (SELECT o_custkey AS x FROM orders UNION " +
        "SELECT c_custkey FROM customer) t ORDER BY x LIMIT 100")),

    // Latest-per-key — the core of the SCD2 generalization (SURVEY A20).
    GraftQuery("q17_window_latest",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        T(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey")
          .limit(50)
      },
      Some("SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
        "FROM orders) t WHERE rn = 1 ORDER BY o_custkey LIMIT 50")),

    GraftQuery("q18_window_running_sum",
      (s, d) => {
        // Window order must be total up to interchangeable rows: duplicate
        // (l_orderkey, l_linenumber) pairs exist, so l_quantity (the summed
        // column) and l_extendedprice break ties — rows still tied after
        // that are identical w.r.t. the running sum, so rs is deterministic.
        val w = Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_quantity", "l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity")).over(w).as("rs"))
          .orderBy("l_orderkey", "l_linenumber", "rs")
          .limit(100)
      },
      Some("SELECT l_orderkey, l_linenumber, SUM(l_quantity) OVER " +
        "(PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, rs LIMIT 100")),

    GraftQuery("q19_cte",
      (s, d) => T(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s"))
        .filter(col("s") > 100000)
        .agg(count(lit(1)).as("n")),
      Some("WITH big AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s " +
        "FROM orders GROUP BY o_custkey) SELECT COUNT(*) AS n FROM big WHERE s > 100000")),

    // The SCD2 change-detection predicate shape (delta_to_postgres_scd.py:252).
    GraftQuery("q20_coalesce_neq",
      (s, d) => T(s, d, "orders")
        .filter(coalesce(col("o_orderstatus"), lit("")) =!=
          coalesce(col("o_orderpriority"), lit("")))
        .agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM orders WHERE " +
        "COALESCE(o_orderstatus, '') <> COALESCE(o_orderpriority, '')")),

    GraftQuery("q21_string_fns",
      (s, d) => T(s, d, "customer")
        .orderBy("c_custkey")
        .select(upper(col("c_name")).as("u"),
          length(col("c_name")).cast("long").as("l"),
          substring(col("c_name"), 1, 5).as("s"))
        .limit(20),
      Some("SELECT UPPER(c_name) AS u, CAST(LENGTH(c_name) AS BIGINT) AS l, " +
        "SUBSTR(c_name, 1, 5) AS s FROM customer ORDER BY c_custkey LIMIT 20")),

    GraftQuery("q22_date_fns",
      (s, d) => T(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(count(lit(1)).as("c"))
        .orderBy("y"),
      Some("SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS c " +
        "FROM orders GROUP BY 1 ORDER BY y")),

    GraftQuery("q23_math_round",
      (s, d) => T(s, d, "lineitem")
        .select(col("l_orderkey"),
          round(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))), 2)
            .cast("double").as("net"))
        .orderBy("l_orderkey", "net")
        .limit(100),
      Some("SELECT l_orderkey, CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net " +
        "FROM lineitem ORDER BY l_orderkey, net LIMIT 100")),

    GraftQuery("q24_distinct",
      (s, d) => T(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus")),

    // TPC-H Q1 shape — the aggregation workhorse; partial aggregation
    // (map-side combine) reduces the shuffle to |groups| rows per partition.
    GraftQuery("q25_tpch_q1",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base"),
          (sum(col("l_discount").cast(DecimalType(18, 2))).cast("double") /
            count(lit(1))).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base, " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc, " +
        "COUNT(*) AS cnt FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // LIMIT 0: schema-only result (delta-unity-duckdb.js:496 DESCRIBE trick).
    GraftQuery("q26_limit0_schema",
      (s, d) => T(s, d, "lineitem").limit(0),
      Some("SELECT * FROM lineitem LIMIT 0")),

    GraftQuery("q27_scalar_subquery",
      (s, d) => {
        val o = T(s, d, "orders")
        val av = o.agg((sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double") / count(lit(1))).as("av"))
        o.crossJoin(broadcast(av))
          .filter(col("o_totalprice") > col("av"))
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > " +
        "(SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)")),

    // GROUPING SETS has no DataFrame-API form; identical SQL text runs on
    // both engines (NULLS FIRST pinned — Spark/DuckDB defaults differ).
    GraftQuery("q28_grouping_sets",
      (s, d) => {
        Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
          "GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus)) " +
          "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")
      },
      Some("SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus)) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"))
    ,

    // UNPIVOT (melt) — q53's pivot inverted: the four lineitem measures
    // become (measure, value) rows, then a per-(flag, measure) profile.
    // Spark's `unpivot` is a zero-shuffle in-row Expand (each input row
    // emits 4 narrow rows BEFORE the aggregation's partial combine, so
    // the exchange carries only group aggregates, never the 4× row
    // blowup). Oracle spelled as UNION ALL — same semantics, and DuckDB
    // folds it to a similar multi-emit scan.
    GraftQuery("q106_unpivot",
      (s, d) => T(s, d, "lineitem")
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"),
          sum(col("val").cast(DecimalType(18, 2))).cast("double").as("sv"))
        .orderBy("l_returnflag", "measure"),
      Some("WITH u AS (" +
        "SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem " +
        "UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem " +
        "UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem) " +
        "SELECT l_returnflag, measure, COUNT(*) AS n, " +
        "CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sv " +
        "FROM u GROUP BY 1, 2 ORDER BY l_returnflag, measure"))
    ,

    // LATERAL join — per-outer-row correlated subquery with its own
    // ORDER BY/LIMIT (top-2 nations by customer count per region), the
    // SQL-standard form of "top-k per group against another table".
    // Identical SQL text runs on both engines (q28's pattern). Catalyst
    // DECORRELATES the lateral subquery into a join + per-group
    // row_number window rather than re-executing it per outer row —
    // at scale that is one customer-side aggregation and one window,
    // not |region| query replays.
    GraftQuery("q112_lateral_topk",
      (s, d) => {
        Seq("region", "nation", "customer")
          .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))
        s.sql(LateralSql)
      },
      Some(LateralSql))
  )

  // def, not val: referenced from `all` above its own declaration point
  // (a val would still be null while `all` initializes).
  private def LateralSql =
    """SELECT r.r_name, t.n_name, t.n_cust FROM region r,
      |LATERAL (SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust
      |  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name ORDER BY n_cust DESC, n.n_name LIMIT 2) t
      |ORDER BY r.r_name, t.n_cust DESC, t.n_name""".stripMargin.replace("\n", " ")
}
