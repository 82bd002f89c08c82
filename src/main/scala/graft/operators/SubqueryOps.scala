package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Subquery surface (SURVEY §2.2 delegated-SQL rows the round-1 corpus
  * only partially covered): EXISTS / NOT EXISTS (decorrelated to
  * semi/anti joins — the plan Catalyst itself produces for them), the
  * TPC-H Q18 large-IN-subquery shape, and a correlated scalar subquery
  * in WHERE (decorrelated to an aggregate + equi-join).
  *
  * Scale shape: every decorrelation here is the textbook one-shuffle
  * form — the subquery side aggregates/filters FIRST (map-side
  * combined), then joins on the correlation key; no per-row re-execution
  * of the subquery, which is what a naive correlated evaluation would
  * do at 100 TB.
  */
object SubqueryOps {

  private def T(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val all: Seq[GraftQuery] = Seq(

    // EXISTS ≡ left-semi join on the correlation key.
    GraftQuery("q77_exists_subquery",
      (s, d) => {
        val bigOrders = T(s, d, "orders").filter(col("o_totalprice") > 150000)
        T(s, d, "customer").join(bigOrders,
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 150000) ORDER BY c_custkey")),

    // NOT EXISTS ≡ left-anti join.
    GraftQuery("q78_not_exists_subquery",
      (s, d) => {
        val recent = T(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01"))
        T(s, d, "customer").join(recent,
            col("c_custkey") === col("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_inactive"),
            min("c_custkey").as("first_key"))
      },
      Some("SELECT COUNT(*) AS n_inactive, MIN(c_custkey) AS first_key " +
        "FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1995-01-01')")),

    // TPC-H Q18 shape: IN (grouped-HAVING subquery) ≡ aggregate-then-join.
    GraftQuery("q79_tpch_q18_shape",
      (s, d) => {
        val bigLines = T(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast("double").as("sum_qty"))
          .filter(col("sum_qty") > 300)
        T(s, d, "orders")
          .join(bigLines, col("o_orderkey") === col("l_orderkey"))
          .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders JOIN (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300) b
        |  ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " ")),
    ),

    // Correlated scalar subquery in WHERE ≡ per-key aggregate + join.
    // AVG through DECIMAL so the comparison boundary is bit-identical in
    // both engines (Relational.scala determinism conventions).
    GraftQuery("q80_correlated_scalar",
      (s, d) => {
        val o = T(s, d, "orders")
        val custAvg = o.groupBy(col("o_custkey").as("ck"))
          .agg((sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double") / count(lit(1))).as("av"))
        o.join(custAvg, col("o_custkey") === col("ck"))
          .filter(col("o_totalprice") > col("av"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
        "WHERE o_totalprice > (SELECT " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) " +
        "FROM orders x WHERE x.o_custkey = o.o_custkey) ORDER BY o_orderkey"))
  )
}
