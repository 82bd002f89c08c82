package graft

import org.apache.spark.sql.SparkSession

/** t1 smoke main: reproduces the reference CLI's output shape
  * (README.md:96-111 — "Table row count", schema listing, result rows)
  * against local fixtures, and sanity-checks the driver contract
  * (entry() rows > 0; queries/oracleSql key agreement). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.load(spark, sfDir, "lineitem")
    println(s"Table row count: ${li.count()}")
    println("Schema:")
    li.schema.foreach(f =>
      println(s"  ${f.name}  ${f.dataType.simpleString}  nullable=${f.nullable}"))

    val flagship = SparkEntry.entry(spark)
    val n = flagship.count()
    println(s"entry() rows: $n")
    flagship.show(truncate = false)
    require(n > 0, "entry() must return rows")

    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    require(ok.subsetOf(qk), s"oracleSql keys not in queries: ${ok -- qk}")
    println(s"queries=${qk.size} oracled=${ok.size}")
    spark.stop()
  }
}
