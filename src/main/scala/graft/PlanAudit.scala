package graft

import org.apache.spark.sql.SparkSession

/** One-shot corpus plan scan (dev tool): prints, for every corpus
  * query, which scale-smell operators its physical plan contains
  * (CartesianProduct, BroadcastNestedLoopJoin, CodegenFallback-only
  * projections are visible as missing WholeStageCodegen around them).
  * PlanAuditSpec turns the curated result into a regression guard.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "SortMergeJoin")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val p = q(spark, sf).queryExecution.executedPlan.toString
        val hit = smells.filter(p.contains)
        if (hit.nonEmpty) println(s"$name: ${hit.mkString(", ")}")
      } catch { case e: Throwable => println(s"$name: PLAN-ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
