package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to named queries (local iteration);
    // the driver passes none and dumps the full corpus
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Harness-compat gate (VERDICT r10 item 6): the DRIVER canonicalizes
    // results through pandas, which cannot sort/hash ndarray cells — an
    // ARRAY/MAP/STRUCT output column passes the local tuple-based
    // oracle_check but errs at the driver's gate (the r10 q172 red row).
    // Catch the divergence class HERE: a complex-typed output fails its
    // dump loudly with the serialization fix spelled out.
    def complexCols(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
          f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] => f.name
      }.toSeq
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = complexCols(df)
        if (bad.nonEmpty) throw new IllegalStateException(
          s"[harness-gate] output columns ${bad.mkString(", ")} are " +
            "ARRAY/MAP/STRUCT — the driver's pandas canonicalizer cannot " +
            "sort them; serialize via array_to_string(...)/to_json on BOTH " +
            "the Spark and oracle sides (corpus outputs stay scalar)")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally { spark.catalog.clearCache(); SessionCaches.release(spark) }
    }
    // Same gate, oracle side: the driver's duckdb call does .df() on the
    // statement result — a non-SELECT-shaped oracle (bare COPY/DDL)
    // returns None and errs (the r10 q174 red row).
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // Head extraction skips leading comments and '(' (ADVICE r11): a
      // parenthesized SELECT/set-op or a leading comment is result-
      // returning and must not be misclassified by the gate.
      var sHead = sql.trim
      var scanning = true
      while (scanning) {
        if (sHead.startsWith("--")) {
          val nl = sHead.indexOf('\n')
          sHead = if (nl < 0) "" else sHead.substring(nl + 1).trim
        } else if (sHead.startsWith("/*")) {
          val e = sHead.indexOf("*/")
          sHead = if (e < 0) "" else sHead.substring(e + 2).trim
        } else if (sHead.startsWith("(")) {
          sHead = sHead.substring(1).trim
        } else scanning = false
      }
      val head = sHead.takeWhile(!_.isWhitespace)
        .toUpperCase(java.util.Locale.ROOT)
      // result-set-returning heads: DuckDB's PIVOT/UNPIVOT/FROM-first/
      // VALUES statements return relations (q166/q167 were driver-green
      // in r10); the divergence class is COPY/DDL/DML, which return None
      val ok = Set("SELECT", "WITH", "PIVOT", "UNPIVOT", "FROM",
        "VALUES", "DESCRIBE", "SUMMARIZE")
      if (!ok.contains(head))
        System.err.println(s"[verify] $name failed: [harness-gate] oracle " +
          s"SQL starts with '$head' — the driver calls .df() on the " +
          "statement result, which is None for non-SELECT statements; " +
          "oracle a SELECT computing the same contract instead")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
