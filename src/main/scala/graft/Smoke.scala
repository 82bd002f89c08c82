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

    // SCD2 pipeline end-to-end (Tier A A17-A21 surface).
    {
      import spark.implicits._
      val b1 = Seq((1, "open", "alpha"), (2, "open", "beta"))
        .toDF("mission_id", "status", "name")
      val (t1, s1) = operators.ScdPipeline.sync(
        operators.ScdPipeline.emptyTarget(b1), b1, Seq("mission_id"),
        now = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      val b2 = Seq((1, "closed", "alpha"), (3, "open", "gamma"))
        .toDF("mission_id", "status", "name")
      val (t2, s2) = operators.ScdPipeline.sync(t1.cache(), b2, Seq("mission_id"),
        now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      println(s"scd sync1: $s1")
      println(s"scd sync2: $s2")
      require(t2.count() == 4, "scd: expected 4 version rows")
    }

    // Graph pipeline end-to-end (A28-A30 surface).
    {
      import spark.implicits._
      val block =
        """MERGE (parent:Mission {id: 'M1'}) SET parent.title = 'Alpha', parent.comments = ['c1']
          |MERGE (child:Mission {id: 'M2'}) SET child.title = 'Beta', child.comments = []
          |MERGE (parent)-[:IS_PARENT_TO]->(child)""".stripMargin
      val (nodes, edges) = operators.GraphPipeline.load(spark, Seq(block, block).toDS)
      val (stats, sample) = operators.GraphPipeline.verify(nodes, edges)
      println(s"graph: $stats")
      sample.show(truncate = false)
      require(stats.nodes == 2 && stats.edges == 1, "graph MERGE dedup failed")
    }
    println("smoke OK")
    spark.stop()
  }
}
