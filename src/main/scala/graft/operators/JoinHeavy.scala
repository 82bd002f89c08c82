package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Multi-join analytical queries in TPC-H shapes (SURVEY §2.2 join rows;
  * §2.3 corpus extension) — the workloads where the
  * 100 TB join strategy matters most.
  *
  * Plan discipline: dimension tables (region/nation, and customer when it
  * is the small side after filtering) are broadcast so the fact tables
  * (lineitem, orders) never shuffle for them; the only shuffles left are
  * the fact⋈fact equi-join keyed on orderkey and the final aggregation,
  * both of which AQE can re-plan at runtime (skew split, partition
  * coalescing). Money math goes through DECIMAL(18,2) so results are
  * order-independent and oracle-exact (see Relational's Scaladoc).
  */
object JoinHeavy {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def revenue = // l_extendedprice * (1 - l_discount), exact
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2))))

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val all: Seq[GraftQuery] = Seq(

    // TPC-H Q3 shape: filtered dim ⋈ fact ⋈ fact, aggregate, top-k.
    GraftQuery("q29_tpch_q3_shape",
      (s, d) => {
        val c = T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val o = T(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
        val l = T(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        // no broadcast hint on customer: it is SF-PROPORTIONAL (a 100 TB
        // TPC-H run has billions of customers) — the planner broadcasts
        // it at bench scale from honest size estimates and must be free
        // to shuffle-join at scale (the q119/q120 r10 precedent)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(sum(revenue).cast("double").as("rev"), count(lit(1)).as("n_lines"))
          .orderBy(col("rev").desc, col("o_orderkey"))
          .limit(20)
      },
      Some(s"""SELECT o_orderkey, o_orderdate, CAST(SUM($revenueSql) AS DOUBLE) AS rev,
        |COUNT(*) AS n_lines
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY rev DESC, o_orderkey LIMIT 20""".stripMargin.replace("\n", " "))),

    // TPC-H Q5 shape: five-way snowflake join down to region, grouped by
    // nation. region+nation broadcast (tiny), customer/supplier hash-join.
    GraftQuery("q30_tpch_q5_shape",
      (s, d) => {
        val r = T(s, d, "region").filter(col("r_name") === "ASIA")
        val n = T(s, d, "nation")
        val c = T(s, d, "customer").select("c_custkey", "c_nationkey")
        val o = T(s, d, "orders").select("o_orderkey", "o_custkey")
        val l = T(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        val nr = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        c.join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
          .join(o, col("o_custkey") === col("c_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy("n_name")
          .agg(sum(revenue).cast("double").as("rev"), count(lit(1)).as("n_lines"))
          .orderBy(col("rev").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS rev, COUNT(*) AS n_lines
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin.replace("\n", " "))),

    // Part/supplier profiling: two independent dims against the fact,
    // grouped by attributes from both — exercises join-order freedom.
    GraftQuery("q31_part_supplier_profile",
      (s, d) => {
        val p = T(s, d, "part").select("p_partkey", "p_brand")
        val sup = T(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val n = T(s, d, "nation").select("n_nationkey", "n_name")
        val l = T(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
        // part and supplier are SF-PROPORTIONAL — no broadcast hints
        // (see q29); nation is FIXED 25 rows, the one genuinely bounded
        // dim in this snowflake, so its hint stays
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(sup.join(broadcast(n),
            col("s_nationkey") === col("n_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("p_brand", "n_name")
          .agg(sum(col("l_quantity")).as("qty"),
            sum(revenue).cast("double").as("rev"))
          .orderBy("p_brand", "n_name")
      },
      Some(s"""SELECT p_brand, n_name, SUM(l_quantity) AS qty,
        |CAST(SUM($revenueSql) AS DOUBLE) AS rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY p_brand, n_name ORDER BY p_brand, n_name""".stripMargin.replace("\n", " ")))
  )
}
