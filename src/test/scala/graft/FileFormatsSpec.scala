package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format matrix beyond the Delta path: parquet and ORC
  * (columnar, with scan-level predicate pushdown) and JSON/CSV (row
  * formats) all round-trip the documents sample losslessly. Each format
  * is a real executor-side write + read through Spark's own sources —
  * the shapes a 100 TB pipeline uses for interchange (columnar) and
  * ingest (row). */
class FileFormatsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-formats-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fmt-$name").toString

  test("parquet/orc/json/csv round-trip the documents sample losslessly") {
    val docs = Tables.load(spark, sf, "documents").orderBy("doc_id")
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val dir = tmp(fmt)
      val w = docs.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w)
        .format(fmt).save(dir)
      val r0 = spark.read
      val r = fmt match {
        // row formats type-erase; read back through the written schema
        case "csv" => r0.option("header", "true").schema(docs.schema)
        case "json" => r0.schema(docs.schema)
        case _ => r0
      }
      val back = r.format(fmt).load(dir)
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        docs.schema.map(f => (f.name, f.dataType)), s"$fmt schema")
      assert(back.except(docs).isEmpty && docs.except(back).isEmpty,
        s"$fmt content must round-trip exactly")
    }
  }

  test("columnar formats push filters into the scan; row-group/stripe " +
    "stats make the filter cheap at scale") {
    val docs = Tables.load(spark, sf, "documents")
    for (fmt <- Seq("parquet", "orc")) {
      val dir = tmp(s"push-$fmt")
      docs.write.mode("overwrite").format(fmt).save(dir)
      val plan = spark.read.format(fmt).load(dir)
        .filter(col("doc_id") === 42L).select("doc_id", "lang")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)"),
        s"$fmt must push the equality filter:\n$plan")
      assert(plan.contains("ReadSchema") && !plan.contains("text"),
        s"$fmt must prune to the projected columns:\n$plan")
    }
  }

  test("ORC written by Spark is readable with mergeSchema and survives " +
    "an added column (schema evolution on read)") {
    val dir = tmp("orc-evolve")
    val docs = Tables.load(spark, sf, "documents")
    docs.select("doc_id", "lang").write.format("orc").save(dir + "/p1")
    docs.select("doc_id", "lang", "source").write.format("orc").save(dir + "/p2")
    val merged = spark.read.option("mergeSchema", "true").format("orc")
      .load(dir + "/p1", dir + "/p2")
    assert(merged.columns.toSet == Set("doc_id", "lang", "source"))
    assert(merged.count() == docs.count() * 2)
    // rows from the old files surface the new column as null
    assert(merged.filter(col("source").isNull).count() == docs.count())
  }
}
