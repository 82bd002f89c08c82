package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

/** Salting must be result-identical to the plain forms; bucketed joins
  * must plan without a shuffle Exchange. */
class ScaleOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scale-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  test("salted join equals plain join") {
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    val salted = ScaleOps.saltedJoin(o, c, "o_custkey", "c_custkey", 8)
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salted aggregation equals plain groupBy count") {
    val l = Tables.load(spark, sf, "lineitem")
    val plain = l.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val salted = ScaleOps.saltedCountByKey(l, "l_suppkey", 8)
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("bloom-prefiltered join equals the plain join and prunes the fact " +
    "side before its shuffle") {
    val li = Tables.load(spark, sf, "lineitem")
    val dim = Tables.load(spark, sf, "part").filter(col("p_partkey") % 10 === 0)
      .select("p_partkey", "p_name")
    val plain = li.join(dim, li("l_partkey") === dim("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
    val bloomed = ScaleOps.bloomPrefilteredJoin(li, dim, "l_partkey", "p_partkey",
        expectedDimRows = 1000L)
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
    assert(bloomed.exceptAll(plain).count() == 0 &&
      plain.exceptAll(bloomed).count() == 0)
    // the filter actually prunes: far fewer fact rows survive than exist
    // (dim keeps 1/10 of keys; fpp 1% passes ~1% extra)
    val total = li.count()
    val survivors = ScaleOps.bloomPrefilteredJoin(li, dim,
      "l_partkey", "p_partkey", expectedDimRows = 1000L)
    assert(survivors.count() < total / 2,
      "bloom prefilter should drop most non-joining fact rows")
    // and the membership probe sits in the plan as a Filter on the fact
    // scan side (before the join), not after
    val plan = survivors.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in:\n$plan")
  }

  test("bucketed join plans with no shuffle Exchange") {
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    ScaleOps.writeBucketed(spark,
      o, "orders_b", "o_orderkey", l, "lineitem_b", "l_orderkey", 8)
    val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$physical")
    // and it still computes the right thing
    val expected = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() == expected)
  }
}
