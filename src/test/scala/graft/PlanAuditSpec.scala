package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Whole-corpus physical-plan audit — the scale guard that catches a
  * NEW query (or an edit to an old one) silently planning the join
  * shapes that do not survive 100 TB:
  *
  *   - `CartesianProduct` (unbroadcast cross join): never acceptable —
  *     the corpus currently plans ZERO and must stay there.
  *   - `BroadcastNestedLoopJoin`: acceptable ONLY where the broadcast
  *     side is bounded by construction (single-row stats frames,
  *     fixed-size eval panels, the q48 quadratic-by-design oracle
  *     baseline) — whitelisted per query below; anything new fails.
  *   - `SortMergeJoin`: legitimate for data×data joins (full outer,
  *     component resolution), but each occurrence is a real shuffle,
  *     so new ones must be justified here rather than slipping in.
  *
  * The whitelists are the audited state of round 6 (see PlanAudit, the
  * dev main that regenerates them).
  */
class PlanAuditSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // BNLJ with a bounded broadcast side: 1-row aggregate frames
  // (q27/q35/q109/q113/q115/q121/q126/q132 totals, q133 corpus total,
  //  q141's total×head 1-row×1-row cross),
  // fixed-size panels/codebooks (q58/q91/q92), quadratic-by-design
  // baseline (q48 — since r8 gated behind Dedup.exactEmbeddingPairs'
  // 2^16-vector cap: above it the query REFUSES instead of planning
  // the n^2 join, so the whitelisted BNLJ side is bounded by the gate).
  // r14: q126/q131/q135/q153 left BOTH join censuses — the retrieval
  // floor rebuild moved their BM25 stats/top-100 machinery into two
  // bounded BUILD jobs (in-row scoring, TopKRowsByScore aggregates; see
  // rrfFused's Scaladoc), so the returned frames are literal/local with
  // no joins at all. The build jobs' one data×data join (documents ⋈
  // embeddings on the unique key) is the scale plan and runs unhinted.
  private val bnljOk = Set(
    "q27_scalar_subquery", "q35_setops", "q48_dedup_embedding",
    "q58_ann_ivf", "q91_decontamination", "q92_ann_pq",
    "q109_quality_percentile_filter", "q113_rfm",
    "q115_distinctive_terms", "q121_vocab_overlap_sketch",
    "q132_pmi_bigrams",
    "q133_source_drift", "q141_zipf_coverage",
    // q155: 1-row (ct, tt, v) totals frame crossed into the scorer
    "q155_importance_weights",
    // q179: 1-row token-total frame crossed into the surprise scorer
    // (the q155 shape; the vocab side is a hash join, not this BNLJ)
    "q179_unigram_surprise",
    // q156/q157: the ≤207-row bench-prefix panel broadcasts into the
    // decontamination anti-join (q91's bounded panel, LeftAnti form)
    "q156_training_manifest", "q157_pipeline_funnel")

  // SMJ on genuinely data-sized both-sides joins: full outer (q68),
  // bench-prefix range resolution (q91), component → doc resolution
  // (q97), the 100×100-row bounded RRF fuse (q131 — full outer cannot
  // broadcast; q135 inherits the fused frame), and q134's A29
  // verification join (edges ⋈ nodes, both
  // sides corpus-sized products of the same parse — a node-id shuffle
  // join IS the scale plan for graph verification).
  // q145 inherits q97's component → doc resolution join (left join of
  // the corpus onto the near-dup component labels, both doc_id-keyed).
  private val smjOk = Set(
    "q68_outer_joins", "q91_decontamination", "q97_clean_corpus",
    "q134_graph_load",
    "q145_leakproof_split",
    // q156/q157 inherit q97's component → doc resolution left join
    // (survivors ⋈ near-dup labels, both doc_id-keyed)
    "q156_training_manifest", "q157_pipeline_funnel",
    // q119/q120 (r9): node-keyed graph joins — degree/rank dims are
    // data-sized for a data-sized near-dup graph, so the node-id
    // shuffle join IS the 100 TB plan. They planned as broadcast
    // through r8 only because the pre-fold q45 subtree UNDER-estimated
    // (the r9 self-row fold routes the cardinality branch through the
    // (a,b) aggregate, whose honest size estimate exceeds the
    // auto-broadcast threshold). Probed at the staged bench profile:
    // SMJ is at parity or faster (q119 1.34-1.46 s vs 1.6, q120
    // 1.71-1.81 s vs 2.34).
    "q119_triangles", "q120_pagerank",
    // q121 (r9 oracled form): the exact-Jaccard truth side is a
    // word-keyed self-join of the distinct (source, word) frame — both
    // sides vocabulary-sized, so the word-id shuffle join IS the scale
    // plan (same argument as q114's similarity matrix; q121's persisted
    // frame reports honest IMR stats, which push it past the broadcast
    // threshold where q114's estimate-only subtree slips under)
    "q121_vocab_overlap_sketch",
    // q199 (r15): the user-written RIGHT OUTER dim join — Spark can
    // only broadcast the LEFT (build) side of a right-outer, and the
    // left here is the corpus-sized asof accumulation, so the
    // nationkey shuffle join IS the plan for this statement shape at
    // any scale (25-row right side notwithstanding); the asof step
    // itself stays the audited equi+WindowGroupLimit form
    "q199_duckdb_asof_right")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-audit-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("corpus plans: no cartesian products; NLJ/SMJ only where audited") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val p = q(spark, sf).queryExecution.executedPlan.toString
        val cart =
          if (p.contains("CartesianProduct")) Seq(s"$name: CartesianProduct")
          else Nil
        val bnlj =
          if (p.contains("BroadcastNestedLoopJoin") && !bnljOk(name))
            Seq(s"$name: unaudited BroadcastNestedLoopJoin") else Nil
        val smj =
          if (p.contains("SortMergeJoin") && !smjOk(name))
            Seq(s"$name: unaudited SortMergeJoin") else Nil
        cart ++ bnlj ++ smj
    }
    assert(offenders.isEmpty,
      s"plan audit failures (justify + whitelist, or fix the plan):\n" +
        offenders.mkString("\n"))
  }

  // FORCED broadcasts of data-proportional frames (ADVICE r9): a
  // broadcast() hint on a per-document/per-row frame is an unbounded
  // driver collect + executor broadcast at the 100 TB design point —
  // the planner must decide from stats/AQE instead. Broadcast hints on
  // genuinely bounded dims (eval panels, K-row stats, the ≤1000-row
  // bench prefix frame) are fine, so the audit is a per-query hint
  // CENSUS, not a blanket ban: the dedup/graph family whose hints r10
  // removed must stay hint-free in the OPTIMIZED LOGICAL plan (physical
  // broadcasts chosen by the planner from honest estimates are allowed
  // and expected at small SF).
  test("near-dup/graph family plans carry no broadcast HINTS — the " +
    "planner, not the code, decides from size (ADVICE r9)") {
    for (name <- Seq("q45_dedup_ngram_jaccard", "q81_dedup_components",
      "q97_clean_corpus", "q119_triangles", "q120_pagerank")) {
      val optimized = SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan
      // ResolvedHint survives into the optimized plan until the join
      // strategy consumes it — its PRESENCE in the analyzed plan is the
      // authoritative hint census
      val analyzed = SparkEntry.queries(name)(spark, sf)
        .queryExecution.analyzed
      val hints = analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hints.isEmpty,
        s"$name: forced join hint on a data-proportional frame: $hints")
      assert(optimized != null)
    }
  }

  // Corpus-WIDE hint census (VERDICT r10 item 5): the test above pins
  // the five queries whose r9 hints were removed, but a future forced
  // broadcast() of a data-proportional frame anywhere ELSE would pass
  // it. Every query carrying ANY join hint must be named here with its
  // boundedness argument — a new hint-carrying query fails until its
  // hinted frame is argued bounded by construction (panel / dim / K-row
  // stats / capped prefix), the exact review the r9 jaccardPairsOf
  // broadcast(card) bug skipped.
  // The audited census (r11). Hinted frames by class:
  //  - FIXED dims: region (5) / nation (25) / nation⋈region — q11, q30,
  //    q31 (part/supplier hints REMOVED r11: SF-proportional), q71.
  //  - 1-row / K-row stats frames crossed or joined in: q27, q35,
  //    q109, q113, q127 (per-event-type stats — enum-typed key), q133,
  //    q141-class totals inside q131/q135/q153/q155, q150 (per-type
  //    totals), q156/q157 (≤207-row bench prefix).
  //  - bounded panels / top-K sets: q91/q104/q168 (eval-benchmark
  //    5-gram panels — since r15 ALL THREE are id-capped by
  //    construction: mod-97 ∧ doc_id < TextAnalysis.BenchCap, ≤207
  //    docs at any SF; no panel broadcast's boundedness is a stance
  //    any more), q126 (3-term query stats), q132
  //    (top-K bigram sets), q135 (100-row rerank frame). q123 left
  //    this census in r13: its top-100 bigram model is now a packed
  //    LITERAL scored in-scan (BigramModelScore) — the broadcast join
  //    (and its hint) is gone.
  //  - vocabulary-bounded aggregates (Heap's-law sublinear; the
  //    documented stance of q154/q155's VERDICT r9 review): q114,
  //    q115, q121 — all SHUFFLE-side aggregates, no hint broadcasts a
  //    vocab-sized frame into a fact stream.
  //  - capped-vocab (r12, VERDICT r11 items 1+7): the hinted frame is a
  //    top-V LIMIT of a data-derived aggregate — bounded by a named cap
  //    CONSTANT, not a Heap's-law argument. Every query in this class
  //    must appear in cappedVocab below with its cap; a data-derived
  //    broadcast without a cap constant goes to guidance, not here.
  //    Members: q179 (TopV model + 1-row total,
  //    TextAnalysis.SurpriseVocabCap).
  // q29 is deliberately NOT whitelisted: its only former hint was the
  // removed broadcast(customer) — re-adding it fails this census.
  private val hintOk: Set[String] = Set(
    "q11_two_hop_join", "q27_scalar_subquery",
    "q30_tpch_q5_shape", "q31_part_supplier_profile", "q35_setops",
    "q71_delta_scan", "q91_decontamination",
    // q104 left this census in r16: its bench side is now a
    // SortedLongsContain set-literal probe in the corpus scan (the q168
    // move) — the broadcast join (and its hint) is gone.
    "q109_quality_percentile_filter",
    "q113_rfm", "q114_source_similarity", "q115_distinctive_terms",
    "q121_vocab_overlap_sketch",
    "q127_anomaly_hours",
    "q132_pmi_bigrams", "q133_source_drift",
    // q168 left this census in r11: its exact side is now a
    // SortedLongsContain set-literal probe in the corpus scan — the
    // broadcast semi-join (and its hint) is gone. q126/q131/q135/q153
    // left in r14: the retrieval floor rebuild removed every hint the
    // family carried (stats/df broadcasts, the q135/q153 candidate
    // broadcasts) — see the r14 note above bnljOk.
    "q150_event_transitions",
    "q155_importance_weights", "q156_training_manifest",
    "q157_pipeline_funnel",
    "q179_unigram_surprise")

  // capped-vocab class registry (VERDICT r11 item 7): each entry names
  // the CONSTANT that bounds its broadcast/literal model frame. The
  // test below fails if a cap leaves the broadcastable range — and a
  // future vocab-model query must register here (with a real constant)
  // before its hint passes the census, so an uncapped data-derived
  // broadcast can never ride in under the old Heap's-law stance.
  private val cappedVocab: Map[String, Int] = Map(
    "q179_unigram_surprise" ->
      graft.operators.TextAnalysis.SurpriseVocabCap)

  test("capped-vocab census: every vocab-model broadcast is bounded by " +
    "a named cap constant (VERDICT r11 item 7)") {
    cappedVocab.foreach { case (name, cap) =>
      assert(hintOk(name),
        s"$name is in cappedVocab but missing from the hint census")
      assert(cap > 0 && cap <= (1 << 20),
        s"$name: vocab cap $cap outside the broadcastable range " +
          "(0, 2^20] — a model frame this size is no longer a " +
          "K-row-bounded broadcast")
    }
  }

  test("corpus-wide broadcast-hint census: every hint-carrying query is " +
    "audited bounded (VERDICT r10 item 5)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val analyzed = q(spark, sf).queryExecution.analyzed
        val hints = analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h.name
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
            h.hints.toString
        }
        if (hints.nonEmpty && !hintOk(name)) Seq(s"$name: ${hints.size} hint(s)")
        else Nil
    }
    assert(offenders.isEmpty,
      "unaudited join hints (argue the hinted frame bounded, then " +
        s"whitelist in hintOk):\n${offenders.mkString("\n")}")
  }
}
