package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.io.StdIn

/** CLI + interactive REPL, mirroring the reference's two entry points:
  * the scanner CLI (delta-unity-duckdb.js:537-635 — count, optional
  * schema, then results as table or JSON) and the SQL REPL
  * (query_sync_table.py:175-209 — help/tables/exit, SELECT-vs-DML
  * dispatch is unnecessary here since spark.sql handles both).
  *
  * Usage:
  *   runMain graft.Cli --table=lineitem --query="SELECT COUNT(*) FROM \$TABLE"
  *   runMain graft.Cli --table=/path/to/file.parquet --limit=5 --schema
  *   runMain graft.Cli --interactive
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val opts = args.filter(_.startsWith("--")).map { a =>
      a.stripPrefix("--").split("=", 2) match {
        // sbt's runMain arg splitting keeps embedded quote characters —
        // strip them so --timestamp="yyyy-MM-dd HH:mm:ss" parses
        case Array(k, v) => k -> v.stripPrefix("\"").stripSuffix("\"")
        case Array(k) => k -> "true"
      }
    }.toMap

    val sfDir = opts.getOrElse("sf-dir", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)

    // Star-schema table names resolve directly; 3-part names map back to
    // the same loaders (so events keeps its nanos→timestamp handling on
    // every resolution route); anything else is a raw path. When the
    // reference's UC env pair is present (delta-unity-duckdb.js:101-105),
    // unmatched 3-part names go through the LIVE REST client instead of
    // the path mapping — getTableInfo → temp-credential vending → SAS
    // install → Delta read (graft.sources.UnityCatalogClient).
    val pathResolver = new PathResolver()
    val ucResolver: Option[TableResolver] = for {
      host <- sys.env.get("DATABRICKS_WORKSPACE_URL")
      tok <- sys.env.get("DATABRICKS_TOKEN")
    } yield new graft.sources.UnityCatalogResolver(
      new graft.sources.UnityCatalogClient(host, tok))
    val resolver = new TableResolver {
      override def resolve(s: SparkSession, ref: String): DataFrame = {
        val short =
          if (pathResolver.isCatalogName(ref)) ref.split("\\.").last else ref
        if (Tables.names.contains(short)) Tables.load(s, sfDir, short)
        else ucResolver match {
          case Some(uc) if pathResolver.isCatalogName(ref) => uc.resolve(s, ref)
          case _ => pathResolver.resolve(s, ref)
        }
      }
    }
    val scanner = new DeltaScanner(spark, resolver)

    if (opts.contains("interactive")) repl(spark)
    else opts.get("table") match {
      case None =>
        System.err.println(
          "usage: graft.Cli --table=<name|path> [--query=SQL] [--limit=N] " +
            "[--schema] [--version=N | --timestamp=\"yyyy-MM-dd HH:mm:ss\"] " +
            "[--format=table|json] [--sf-dir=DIR] | --interactive")
        sys.exit(1)
      case Some(table) =>
        // Reference CLI flow (delta-unity-duckdb.js:582-634): stats first,
        // optional schema, then the query (default scan+limit).
        // --version=N / --timestamp=TS time-travel a Delta table target.
        val isDelta = graft.sources.DeltaLog.isDeltaTable(spark, table)
        val sc = (opts.get("version"), opts.get("timestamp")) match {
          case (Some(v), _) if isDelta =>
            new DeltaScanner(spark, new TableResolver {
              override def resolve(s: SparkSession, ref: String): DataFrame =
                graft.sources.DeltaLog.read(s, ref, Some(v.toLong))
            })
          case (None, Some(ts)) if isDelta =>
            new DeltaScanner(spark, new TableResolver {
              override def resolve(s: SparkSession, ref: String): DataFrame =
                graft.sources.DeltaLog.read(s, ref,
                  timestampAsOf = Some(java.sql.Timestamp.valueOf(ts)))
            })
          case _ => scanner
        }
        println(s"Table row count: ${sc.getTableStats(table)}")
        if (opts.contains("schema")) {
          println("Schema:")
          sc.getTableSchema(table).foreach(f =>
            println(s"  ${f.name}  ${f.dataType.simpleString}"))
        }
        val df = sc.query(table, opts.get("query"),
          opts.get("limit").map(_.toInt).getOrElse(10))
        // Reference parity: JSON is the DEFAULT; --format=table opts into
        // the table rendering (delta-unity-duckdb.js:577,621 — "Display
        // results as table (default: JSON)")
        opts.getOrElse("format", "json") match {
          case "table" => df.show(100, truncate = false)
          case _ => sc.toJsonLines(df).foreach(println)
        }
    }
    spark.stop()
  }

  private def repl(spark: SparkSession): Unit = {
    println("graft SQL (help | tables | exit)")
    Iterator.continually(StdIn.readLine("SQL> "))
      .takeWhile(l => l != null && l.trim != "exit")
      .map(_.trim).filter(_.nonEmpty)
      .foreach {
        case "help" =>
          println("Enter SQL over: " + Tables.names.mkString(", "))
        case "tables" =>
          spark.catalog.listTables().show(truncate = false)
        case sql if DuckDialect.summarizeTarget(sql).exists(_.nonEmpty) =>
          // DuckDB's SUMMARIZE <table> — Spark's summary() profile
          try spark.table(DuckDialect.summarizeTarget(sql).get)
            .summary().show(100, truncate = false)
          catch { case e: Exception => println(s"error: ${e.getMessage}") }
        case sql =>
          // UPDATE/DELETE on Delta table paths route to the copy-on-write
          // DML engine (the reference REPL's non-SELECT dispatch,
          // query_sync_table.py:123-125); everything else is spark.sql —
          // including CREATE SCHEMA/DATABASE and USE qualification.
          try graft.sources.DeltaDml.dispatch(spark, sql) match {
            case Some(r) =>
              println(s"${r.affectedRows} rows affected " +
                s"(${r.rewrittenFiles} files rewritten, version ${r.version})")
            case None => graft.sources.DeltaDml.dispatchMerge(spark, sql) match {
              case Some(m) =>
                println(s"merged: ${m.updatedRows} updated, " +
                  s"${m.deletedRows} deleted, ${m.insertedRows} inserted " +
                  s"(${m.rewrittenFiles} files rewritten, version ${m.version})")
              case None =>
                // Delta maintenance surface (OPTIMIZE / VACUUM / RESTORE /
                // ADD|DROP CONSTRAINT / SET TBLPROPERTIES), then the
                // table_changes CDF function, before plain spark.sql
                graft.sources.DeltaDml.dispatchMaintenance(spark, sql) match {
                  case Some(msg) => println(msg)
                  case None =>
                    graft.sources.DeltaMaintenance.dispatchHistory(spark, sql)
                      .orElse(graft.sources.DeltaCdf.dispatchSql(spark, sql)) match {
                      case Some(df) => df.show(100, truncate = false)
                      case None => // dialect-tolerant: DuckDB-isms rewrite
                        DuckDialect.sql(spark, sql).show(100, truncate = false)
                    }
                }
            }
          }
          catch { case e: Exception =>
            println(s"error: ${e.getMessage}")
            // the --query surface substitutes $TABLE; the REPL (like the
            // reference's, query_sync_table.py:189-203) uses table names
            if (sql.contains("$TABLE"))
              println("hint: $TABLE belongs to the --query surface; in " +
                "the REPL reference tables by name (see `tables`)")
          }
          // graft-internal persists die at the statement boundary — the
          // show() above consumed the frame, so the session never
          // accumulates query-internal caches (ADVICE r9). User CACHE
          // TABLE pins are NOT tracked and survive (the reason this is
          // a targeted release, not catalog.clearCache).
          finally SessionCaches.release(spark)
      }
  }
}
