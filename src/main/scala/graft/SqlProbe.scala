package graft
import org.apache.spark.sql.SparkSession

/** Local iteration tool: run one dialect statement against the sf tables
  * and show result + schema. `runMain graft.SqlProbe <sfDir> <sql>` —
  * registers every testdata table as a temp view first, exactly like the
  * corpus query builders do, so the statement under test sees the same
  * environment. Not driver-facing. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sql = args.drop(1).mkString(" ")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    val df = DuckDialect.sql(spark, sql)
    df.printSchema()
    df.show(20, truncate = false)
    spark.stop()
  }
}
