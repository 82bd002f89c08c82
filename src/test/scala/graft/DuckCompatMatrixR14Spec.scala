package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential matrix for the r14 dialect closures (VERDICT r13 items
  * 3, 6, 7): ASOF multi-join chains, wrapped COLUMNS REPLACE, and
  * expression-argument comma-unnest. Every expected value and OUTPUT
  * COLUMN NAME below was pinned against the installed DuckDB
  * (duckdb.connect() on identical fixtures) while writing this spec —
  * the rows assert name-level parity (the part a wrong derived-name
  * rendering corrupts first), and the refusal rows pin that
  * non-reproducible spellings still go to guidance instead of a
  * silently different answer. */
class DuckCompatMatrixR14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duckcompat-r14-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtures(): Unit = {
    import spark.implicits._
    Seq(("A", 2, 100), ("A", 5, 101), ("B", 7, 200))
      .toDF("sym", "tts", "qty").createOrReplaceTempView("trades")
    Seq(("A", 1, 10), ("A", 3, 11), ("A", 5, 12), ("B", 2, 20), ("B", 6, 21))
      .toDF("sym", "qts", "px").createOrReplaceTempView("quotes")
    Seq(("A", 4, 7), ("B", 5, 8))
      .toDF("sym", "fts", "f").createOrReplaceTempView("fills")
    Seq(("A", "alpha"), ("A", "alpha2"), ("B", "beta"))
      .toDF("sym", "nm").createOrReplaceTempView("dims")
    Seq((1, 2, "x")).toDF("aa", "ab", "c").createOrReplaceTempView("wr")
  }

  test("ASOF chains: inner+left, inner+inner, left+left with flipped " +
    "inequality and correlated second cond — rows equal DuckDB's " +
    "native chain") {
    fixtures()
    val got1 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, q.px, f.fts FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF LEFT JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts " +
        "ORDER BY t.sym, t.tts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) null else r.getInt(4)))
    assert(got1.toSeq == Seq(("A", 2, 1, 10, 4), ("A", 5, 5, 12, null),
      ("B", 7, 6, 21, null)))

    val got2 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, f.fts FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts " +
        "ORDER BY t.sym, t.tts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got2.toSeq == Seq(("A", 2, 1, 4)))

    // second cond references the FIRST pick (q.qts) — the scoping the
    // single-join bridge could not express; q.qts NULL (no first match)
    // must yield a NULL second pick, as DuckDB does
    val got3 = DuckDialect.sql(spark,
      "SELECT t.tts, q.qts, f.fts FROM trades t " +
        "ASOF LEFT JOIN quotes q ON q.sym = t.sym AND q.qts < t.tts " +
        "ASOF LEFT JOIN fills f ON f.sym = t.sym AND f.fts > q.qts " +
        "ORDER BY t.tts").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getInt(2)))
    assert(got3.toSeq == Seq((2, 1, 4), (5, 3, 4), (7, 6, null)))
  }

  test("MIXED asof+plain chains (r14 second pass): plain steps join " +
    "the accumulated flattening with DuckDB's left-deep semantics " +
    "(fan-out, plain-first, LEFT with an extra literal conjunct)") {
    fixtures()
    // asof then plain inner — the dim fan-out duplicates the pick
    val got1 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.px, u.nm FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "JOIN dims u ON u.sym = t.sym " +
        "ORDER BY t.sym, t.tts, u.nm").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got1.toSeq == Seq(("A", 2, 10, "alpha"), ("A", 2, 10, "alpha2"),
      ("A", 5, 12, "alpha"), ("A", 5, 12, "alpha2"), ("B", 7, 21, "beta")))
    // plain FIRST, then an asof referencing the plain side's alias
    val got2 = DuckDialect.sql(spark,
      "SELECT t.tts, u.nm, q.qts FROM trades t " +
        "JOIN dims u ON u.sym = t.sym " +
        "ASOF JOIN quotes q ON q.sym = u.sym AND q.qts <= t.tts " +
        "ORDER BY t.tts, u.nm").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(got2.toSeq == Seq((2, "alpha", 1), (2, "alpha2", 1),
      (5, "alpha", 5), (5, "alpha2", 5), (7, "beta", 6)))
    // asof then LEFT plain with a literal conjunct (null-extends B)
    val got3 = DuckDialect.sql(spark,
      "SELECT t.tts, q.px, u.nm FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "LEFT JOIN dims u ON u.sym = t.sym AND u.nm = 'alpha' " +
        "ORDER BY t.tts").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(got3.toSeq == Seq((2, 10, "alpha"), (5, 12, "alpha"),
      (7, 21, null)))
  }

  test("ASOF chain refusals: equi-free plain step, CROSS member, and " +
    "chain+WHERE go to guidance, never a silently different shape") {
    fixtures()
    val equiFree = intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "JOIN dims u ON u.nm > t.sym").collect())
    assert(equiFree.getMessage.contains("ASOF"))
    // RIGHT members bridge since r15 (DuckCompatMatrixR15Spec); CROSS
    // stays a refusal — an equi-free product the pair gate cannot bound
    val crossMember = intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "CROSS JOIN dims u").collect())
    assert(crossMember.getMessage.contains("ASOF"))
    val withWhere = intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym, q.px, f.f FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts " +
        "WHERE t.qty > 10").collect())
    assert(withWhere.getMessage.contains("ASOF"))
  }

  test("wrapped COLUMNS REPLACE: derived names equal DuckDB's " +
    "rendered spellings (fn lowercased, binaries parenthesized with " +
    "single spaces, bare-ident exprs name by leaf)") {
    fixtures()
    def run(q: String): (Seq[String], Seq[Any]) = {
      val df = DuckDialect.sql(spark, q)
      (df.columns.toSeq, df.collect().head.toSeq)
    }
    // DuckDB-pinned: ['max(aa := (aa + 10))', 'ab', 'c']
    assert(run("SELECT max(COLUMNS(* REPLACE (aa + 10 AS aa))) FROM wr") ==
      ((Seq("max(aa := (aa + 10))", "ab", "c"), Seq(11, 2, "x"))))
    // case + spacing canonicalize: MAX( → max(, aa+10 → (aa + 10)
    assert(run("SELECT MAX(COLUMNS(* REPLACE (aa+10 AS aa))) FROM wr") ==
      ((Seq("max(aa := (aa + 10))", "ab", "c"), Seq(11, 2, "x"))))
    // two replacements under min; DuckDB: min(aa := …), min(ab := …), c
    assert(run("SELECT min(COLUMNS(* REPLACE (aa + 10 AS aa, ab * 2 AS ab))) FROM wr") ==
      ((Seq("min(aa := (aa + 10))", "min(ab := (ab * 2))", "c"),
        Seq(11, 4, "x"))))
    // EXCLUDE composes
    assert(run("SELECT max(COLUMNS(* EXCLUDE (c) REPLACE (aa + 10 AS aa))) FROM wr") ==
      ((Seq("max(aa := (aa + 10))", "ab"), Seq(11, 2))))
    // function expr: ABS( aa ) renders abs(aa)
    assert(run("SELECT max(COLUMNS(* REPLACE (ABS( aa ) AS aa))) FROM wr") ==
      ((Seq("max(aa := abs(aa))", "ab", "c"), Seq(1, 2, "x"))))
    // bare ident expr names by its LEAF, no wrapper text (DuckDB: 'ab',
    // then the real ab dedups to ab_1 through .df(), which the harness
    // canonicalization mirrors)
    assert(run("SELECT max(COLUMNS(* REPLACE (ab AS aa))) FROM wr") ==
      ((Seq("ab", "ab_1", "c"), Seq(2, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (wr.aa AS aa))) FROM wr") ==
      ((Seq("aa", "ab", "c"), Seq(1, 2, "x"))))
    // literal expr
    assert(run("SELECT max(COLUMNS(* REPLACE (10 AS aa))) FROM wr") ==
      ((Seq("max(aa := 10)", "ab", "c"), Seq(10, 2, "x"))))
    // trailing alias overrides every derived name (DuckDB .df(): z, z_1, z_2)
    assert(run("SELECT max(COLUMNS(* REPLACE (aa + 10 AS aa))) AS z FROM wr") ==
      ((Seq("z", "z_1", "z_2"), Seq(11, 2, "x"))))
  }

  test("wrapped COLUMNS REPLACE refusals: spellings DuckDB re-renders " +
    "(CAST re-casing, operators around the wrap) refuse to guidance; " +
    "nested binaries bridge since the r15 second pass (see R15bSpec)") {
    fixtures()
    // r15 second pass: the nested-binary rendering IS mechanical
    // (precedence tree, one paren pair per node) — this row used to
    // refuse and now carries DuckDB's derived name
    val nested = DuckDialect.sql(spark,
      "SELECT max(COLUMNS(* REPLACE (aa + 10 + ab AS aa))) FROM wr")
    assert(nested.columns.toSeq ==
      Seq("max(aa := ((aa + 10) + ab))", "ab", "c"))
    assert(nested.collect().head.toSeq == Seq(13, 2, "x"))
    // r15 third pass: DuckDB-only cast spellings bridge too (name from
    // DuckDB's canonicalization, execution through the Spark twin)
    val i4 = DuckDialect.sql(spark,
      "SELECT max(COLUMNS(* REPLACE (cast(aa as int4) AS aa))) FROM wr")
    assert(i4.columns.toSeq ==
      Seq("max(aa := CAST(aa AS INTEGER))", "ab", "c"))
    for (q <- Seq(
      // wrapper is not a single function call
      "SELECT max(COLUMNS(* REPLACE (aa + 10 AS aa))) + 1 FROM wr"))
      intercept[Exception](DuckDialect.sql(spark, q).collect())
  }

  test("expression-argument comma-unnest: column named by DuckDB's " +
    "rendered expression; non-reproducible spellings refuse") {
    fixtures()
    // DuckDB-pinned: `unnest(list_sort(tags))` yields column
    // "list_sort(tags)" on table alias `unnest`
    val got = DuckDialect.sql(spark,
      "WITH t AS (SELECT 1 AS k, ['c','a','b'] AS tags) " +
        "SELECT k, \"list_sort(tags)\" AS v FROM t, " +
        "unnest(list_sort(tags)) ORDER BY v").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (1, "b"), (1, "c")))
    // with a table alias the column is u."list_sort(tags)"
    val got2 = DuckDialect.sql(spark,
      "WITH t AS (SELECT 1 AS k, ['b','a'] AS tags) " +
        "SELECT u.\"list_sort(tags)\" AS v FROM t, " +
        "unnest(list_sort(tags)) u ORDER BY v").collect()
      .map(_.getString(0))
    assert(got2.toSeq == Seq("a", "b"))
    // DuckDB renders `(tags || main.list_value('z'))` — not mechanical
    intercept[Exception](DuckDialect.sql(spark,
      "WITH t AS (SELECT ['b','a'] AS tags) " +
        "SELECT * FROM t, unnest(tags || ['z'])").collect())
  }
}
