package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the scale shapes the late
  * pipeline queries were designed around — a future edit that silently
  * turns a broadcast into a shuffle join, or adds an exchange under a
  * window that was built to reuse one, fails HERE rather than only
  * showing up as a benchmark drift. Counts use the pre-AQE-execution
  * plan string (the queries are not collected). */
class PlanShapeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planshape-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Drop InMemoryRelation build subtrees from a plan string: the tree
    * printer repeats the cached BUILD plan under every consumer's
    * InMemoryTableScan, so counting raw Exchange lines would (a) count
    * the one-per-corpus build shuffle as if it ran per query and
    * (b) count it once PER CONSUMER. Depth = offset of the first
    * non-tree-art character; a build subtree is everything deeper than
    * its InMemoryRelation line. */
  private def stripCachedBuilds(p: String): String = {
    def depth(l: String): Int = {
      val d = l.indexWhere(c => c != ' ' && c != ':' && c != '+' && c != '-')
      if (d < 0) Int.MaxValue else d
    }
    val out = new StringBuilder
    var skipDeeperThan = -1
    for (l <- p.linesIterator) {
      val d = depth(l)
      if (skipDeeperThan >= 0 && d > skipDeeperThan) ()
      else {
        skipDeeperThan = if (l.contains("InMemoryRelation")) d else -1
        out.append(l).append('\n')
      }
    }
    out.toString
  }

  private def exchanges(p: String): Int = {
    val q = stripCachedBuilds(p)
    "(?m)^\\s*(?:\\+- |:- )?Exchange hashpartitioning".r
      .findAllIn(q).length + "Exchange rangepartitioning".r.findAllIn(q).length
  }

  test("q104: bench n-grams probe as a set literal in-scan; corpus text " +
    "never shuffles (r16 — the q168 SortedLongsContain shape)") {
    val p = plan("q104_ngram_decontamination")
    assert(p.contains("graft_sorted_contains"),
      s"bench set must probe as the in-scan sorted-array literal:\n$p")
    assert(!p.contains("Join"),
      s"the broadcast join is gone by design — it came back:\n$p")
    assert(exchanges(p) <= 2, // doc_id agg + final sort
      s"contamination probe grew extra exchanges:\n$p")
  }

  test("q106: unpivot is an in-row Expand, one agg exchange") {
    val p = plan("q106_unpivot")
    assert(p.contains("Expand"), "unpivot must plan as Expand")
    assert(exchanges(p) <= 2, // (flag, measure) agg + final sort
      s"unpivot grew extra exchanges:\n$p")
  }

  test("q107: grid-free gap fill — one lead window, no join, no explode") {
    val p = plan("q107_gap_fill")
    assert(p.contains("Window"), "forward fill must be a window")
    assert(!p.contains("Join"),
      s"the grid join is gone by design — it came back:\n$p")
    assert(!p.contains("Generate"),
      s"the grid explode is gone by design — it came back:\n$p")
    assert(exchanges(p) <= 3, // (user, hour) rollup, user window, final sort
      s"gap fill grew extra exchanges:\n$p")
  }

  test("q125: bloom probe sits in the fact-side filter before the join") {
    val p = plan("q125_bloom_join")
    assert(p.contains("might_contain"),
      "the bloom runtime filter must survive planning as a scan-side probe")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("q126: r14 in-row BM25 — the returned frame is the collected " +
    "top-20 literal, no scan/join/exchange survives in it") {
    val p = plan("q126_bm25_search")
    // the corpus work (one stats collect + one TopKRowsByScore job, both
    // in-row regexp_count scoring — no explode, no posting persist, no
    // df/stats broadcasts) happens in the BUILD's two bounded jobs; the
    // frame handed back is a 20-row local relation
    assert(p.contains("LocalTableScan"),
      s"q126 must return the collected literal top-20:\n$p")
    assert(!p.contains("FileScan") && !p.contains("Join") &&
      exchanges(p) == 0,
      s"q126's returned frame must be local:\n$p")
  }

  test("q127: hourly rollup persisted once; stats broadcast; top-k TakeOrdered") {
    val p = plan("q127_anomaly_hours")
    assert(p.contains("InMemoryRelation") || p.contains("InMemoryTableScan"),
      "the hourly rollup must be persisted — it feeds both stats and probe")
    assert(p.contains("BroadcastHashJoin"), "per-type stats must broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"the hourly stream must not shuffle for the stats join:\n$p")
    assert(p.contains("TakeOrdered"), "top-k must plan as TakeOrdered")
  }

  test("q128: element rows combine map-side; no join; one agg exchange") {
    val p = plan("q128_int8_quant")
    assert(!p.contains("Join"), s"quantization audit must not join:\n$p")
    assert(exchanges(p) <= 2, // label agg + final sort
      s"quant audit grew extra exchanges:\n$p")
    assert(p.contains("HashAggregate"),
      "expected partial aggregation to collapse element rows pre-exchange")
  }

  test("q128: the Int8QuantStats projection stays inside whole-stage " +
    "codegen (a Janino rejection would silently fall back to " +
    "interpreted eval with identical results — only the plan shows it)") {
    val df = SparkEntry.queries("q128_int8_quant")(spark, sf)
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // finalize THIS plan's AQE stages
    val p = qe.executedPlan.toString
    // codegen membership shows as the `*(n)` stage marker on the node
    assert("""\*\(\d+\) Project \[[^\n]*graft_int8_stats""".r
      .findFirstIn(p).isDefined,
      s"graft_int8_stats projection must carry the *(n) codegen marker:\n$p")
  }

  test("q129: dimension stats — no join, one dimension-cardinality exchange") {
    val p = plan("q129_dim_stats")
    assert(!p.contains("Join"), s"dim stats must not join:\n$p")
    assert(exchanges(p) <= 2, // dim agg + final sort
      s"dim stats grew extra exchanges:\n$p")
  }

  test("q183: the all-but-the-top apply is join-free — the model is a " +
    "literal, the corpus streams once (agg exchange only in training)") {
    val p = plan("q183_abtt_transform")
    assert(!p.contains("Join"),
      s"the abtt apply must carry its model as a literal, not a join:\n$p")
    assert(exchanges(p) <= 1, // the output sort only
      s"the abtt apply grew exchanges beyond the output sort:\n$p")
  }

  test("q130: corpus collapses to word frequencies before pair explode") {
    val p = plan("q130_bpe_merges")
    // the Generate over char offsets must sit ABOVE the word-frequency
    // aggregate: pair explosion happens on vocabulary-scale rows only
    val lines = p.linesIterator.toIndexedSeq
    val gen = lines.indexWhere(l =>
      l.contains("Generate explode(sequence"))
    val agg = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(gen >= 0, s"expected the offset explode:\n$p")
    assert(agg > gen,
      s"word-frequency rollup must run under the pair explode:\n$p")
    assert(p.contains("TakeOrdered"), "top-k must plan as TakeOrdered")
  }

  test("q132: in-row bigram zip (no self-join); unigram stats broadcast") {
    val p = plan("q132_pmi_bigrams")
    assert(!p.contains("SortMergeJoin"),
      s"unigram counts and totals must broadcast:\n$p")
    assert(p.contains("TakeOrdered"), "top-k must plan as TakeOrdered")
    // pairs come from arrays_zip in the row, not a join or window
    assert(p.contains("Generate explode"), "expected the zip explode")
  }

  test("q133: one corpus rollup; drift grid is aggregate-scale only") {
    val p = plan("q133_source_drift")
    assert(p.contains("InMemoryRelation") || p.contains("InMemoryTableScan"),
      "the (source, word) rollup must be persisted — three consumers")
    assert(p.contains("TakeOrdered") || p.contains("Sort"),
      "output must be ordered")
  }

  test("q108: centroid sums combine map-side, one agg exchange") {
    val p = plan("q108_label_centroids")
    assert(exchanges(p) <= 2, // (label, pos) agg + final sort
      s"centroids grew extra exchanges:\n$p")
    assert(p.contains("partial".toLowerCase) || p.contains("HashAggregate"),
      "expected partial aggregation before the exchange")
  }

  test("q114: word-keyed pair join stays bounded, norms broadcast") {
    val p = plan("q114_source_similarity")
    assert(p.contains("BroadcastHashJoin"), "norms must broadcast")
  }

  test("q119: triangle wedge joins stay equi-joins over the persisted " +
    "degree-oriented edge list (no nested-loop fallback)") {
    val p = plan("q119_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"wedge enumeration degraded to a nested loop:\n$p")
    // rank tie-breaks are JOIN CONDITIONS on the equi-join, not a
    // post-filter over an unkeyed product; the oriented list is
    // persisted so orientation degrees compute once
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      "oriented edge list must come from the persisted cache")
  }

  test("q156: the source cap plans as WindowGroupLimit with a partial " +
    "below the exchange (15 rows per source leave each map task, not " +
    "the whole partition); bench panel probes in-scan, corpus never " +
    "cartesians") {
    val p = plan("q156_training_manifest")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      s"expected partial+final WindowGroupLimit pair:\n$p")
    // r15: the ≤207-prefix decontamination panel folded from a
    // broadcast anti-join to an in-scan set-literal `exists` (the q168
    // shape, via Dedup.manifestFlags) — no join machinery may remain
    // for it, and the corpus must still never cartesian
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the panel probe must be the in-scan exists literal, not a join")
    assert(p.contains("exists"),
      s"expected the panel exists-literal probe in the scan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("single-corpus-pass rollups (r8): every consumer reads the cached " +
    "count frame — no direct corpus re-scan in the final plan") {
    // q132/q115: all consumers (totals, broadcasts, the scored stream)
    // derive from the persisted vocabulary-bounded rollups, so the FINAL
    // plan contains cache scans and ZERO file scans; the corpus is read
    // only inside the cache-build subplans (once per rollup). A file
    // scan reappearing here means a consumer silently fell off the
    // cache and re-tokenizes the corpus — the 6-passes-at-100TB defect
    // this round removed.
    Seq("q132_pmi_bigrams", "q115_distinctive_terms").foreach { n =>
      // the OPTIMIZED LOGICAL plan (stable under AQE wrapping): cached
      // subtrees appear as InMemoryRelation, direct reads as
      // LogicalRelation — the latter must all live INSIDE cache builds,
      // i.e. none in the consuming plan itself
      val p = SparkEntry.queries(n)(spark, sf).queryExecution.optimizedPlan
      val cached = p.collectWithSubqueries {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      val direct = p.collectWithSubqueries {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
      assert(cached.nonEmpty, s"$n: expected cached rollup reads")
      assert(direct.isEmpty,
        s"$n: a consumer re-scans the corpus directly:\n$p")
    }
  }
}
