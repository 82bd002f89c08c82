package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Every query entry in [[SparkEntry.queries]] receives `(spark, sfDir)` and
  * reads the parquet tables lazily through here — Catalyst then pushes
  * filters and prunes columns all the way into the parquet scan, so a query
  * that touches two columns reads two columns. At cluster scale the same
  * code reads a partitioned table directory instead of a single file; no
  * operator below ever assumes single-file input.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-session plan cache: spark.read.parquet eagerly lists files and
  // reads footers for schema; across the benchmark corpus that
  // re-listing is a measurable slice of the per-query constant cost. The
  // cached object is only the lazy DataFrame (analyzed plan) — no data.
  // Sessions are WEAK keys so a stopped session's plans are collectable
  // (ADVICE r01: the old strong-keyed map retained every test session).
  // CAVEAT (by design): the analyzed plan snapshots the parquet file
  // listing — files added to a table directory mid-session are invisible
  // until invalidate(). The benchmark/corpus dirs are immutable; growing
  // directories must call invalidate() (or read through DeltaLog, whose
  // snapshot is re-resolved per read).
  private val planCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    planCache.synchronized {
      planCache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
    }.computeIfAbsent((dir, name), _ => loadUncached(spark, dir, name))

  /** Drop all cached plans (use after mutating a table directory). */
  def invalidate(): Unit = planCache.synchronized(planCache.clear())

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped in two physical forms, normalized here so
      // every operator sees a session-TZ TIMESTAMP:
      //  - legacy TIMESTAMP(NANOS): Spark's vectorized reader rejects it,
      //    so read the raw int64 nanos and truncate to micros with
      //    integer division — the same conversion DuckDB applies, so
      //    both engines see identical timestamps. (Double division would
      //    lose precision at 1e18 ns.)
      //  - current timestamp[us] without tz (TIMESTAMP_NTZ): cast to
      //    TIMESTAMP under the UTC session — identical wall-clock values
      //    to DuckDB's naive-as-UTC read, and unix_micros/date functions
      //    resolve again (they reject NTZ inputs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` corpus queries and
    * the interactive surface (DeltaScanner / REPL) resolve bare names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
