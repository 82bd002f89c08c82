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
