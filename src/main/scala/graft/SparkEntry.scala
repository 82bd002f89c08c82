package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, DeltaQueries, EvalMetrics, EventOps, ExtendedOps, GraftQuery, GraphPipeline, JoinHeavy, Multimodal, Relational, ScalarOps, Similarity, Skyline, SubqueryOps, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is declared once as a [[GraftQuery]] (Spark
  * plan + optional DuckDB oracle SQL) in the operator modules; this object
  * just aggregates them into the driver's two maps.
  */
object SparkEntry {

  /** All declared queries, in corpus order. */
  def corpus: Seq[GraftQuery] =
    Relational.all ++ JoinHeavy.all ++ ScalarOps.all ++ TextAnalysis.all ++
      Dedup.all ++ Similarity.all ++ EventOps.all ++ ExtendedOps.all ++
      DeltaQueries.all ++ SubqueryOps.all ++ Skyline.all ++ Multimodal.all ++
      GraphPipeline.all ++ EvalMetrics.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter → partial/final hash agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "q25_tpch_q1").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Caller contract (cache lifecycle): some queries `.persist()`
    * bounded intermediate frames (vocabulary/posting-list sized — e.g.
    * the BM25/PMI token-count frames in [[operators.TextAnalysis]]) that
    * only materialize when the RETURNED DataFrame is consumed, so the
    * query function cannot unpersist them itself. Every such persist is
    * registered with [[graft.SessionCaches]] (r10): a caller that has
    * consumed the result calls `SessionCaches.release(spark)` to drop
    * exactly the query-internal caches — the REPL does so after every
    * statement, and a user's own `CACHE TABLE` pins survive (the reason
    * the pre-r10 REPL could not blanket-clearCache). Verify and Bench
    * additionally `spark.catalog.clearCache()` between queries (their
    * sessions have no user pins); one-shot sessions (DeltaScanner CLI)
    * end with `spark.stop()` and need nothing. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    corpus.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    corpus.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
