package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential matrix for the r15 dialect closure (VERDICT r14 item
  * 4): SUBQUERY MEMBERS in ASOF chains — `(SELECT …) alias` as the base
  * relation or any join member, the quote-stream-filtered-then-chained
  * statement shape. Every expected row below was pinned against the
  * installed DuckDB (duckdb.connect() on identical fixtures) while
  * writing this spec. Also pins the ADVICE r14 guard-ordering fix: a
  * chain the parser accepts but the expander refuses must reach
  * guidance without paying scale probes or dying on a misleading
  * 'refused at this scale'. */
class DuckCompatMatrixR15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duckcompat-r15-test")
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
  }

  test("ASOF chains with subquery members: filtered mid-chain member, " +
    "subquery base, and duckisms inside the subquery — rows equal " +
    "DuckDB's native chain") {
    fixtures()
    // filtered FIRST member (the quote-stream shape); second cond
    // references the subquery's alias
    val got1 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, q.px, f.fts FROM trades t " +
        "ASOF JOIN (SELECT sym, qts, px FROM quotes WHERE px <> 11) q " +
        "ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF LEFT JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts " +
        "ORDER BY t.sym, t.tts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) null else r.getInt(4)))
    assert(got1.toSeq == Seq(("A", 2, 1, 10, 4), ("A", 5, 5, 12, null),
      ("B", 7, 6, 21, null)))

    // subquery BASE relation
    val got2 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, f.fts " +
        "FROM (SELECT sym, tts FROM trades WHERE qty > 100) t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF LEFT JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts " +
        "ORDER BY t.sym, t.tts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3)))
    assert(got2.toSeq == Seq(("A", 5, 5, null), ("B", 7, 6, null)))

    // TWO subquery members, one carrying a duckism (`//` int division)
    // that must bridge inside the nested expansion
    val got3 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.hpx, f.fts FROM trades t " +
        "ASOF JOIN (SELECT sym, qts, px // 2 AS hpx FROM quotes) q " +
        "ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF LEFT JOIN (SELECT sym, fts FROM fills WHERE f >= 8) f " +
        "ON f.sym = t.sym AND f.fts >= t.tts " +
        "ORDER BY t.sym, t.tts").collect()
      .map(r => (r.getString(0), r.getInt(1),
        // `//` bridges to Spark's `div`, which widens to BIGINT — the
        // VALUE parity is what the row pins
        r.getLong(2).toInt,
        if (r.isNullAt(3)) null else r.getInt(3)))
    assert(got3.toSeq == Seq(("A", 2, 5, null), ("A", 5, 6, null),
      ("B", 7, 10, null)))
  }

  test("subquery-member refusals: parenthesized JOIN-tree member " +
    "(right-deep) and an unaliased group go to guidance") {
    fixtures()
    // a parenthesized JOIN tree is NOT a subquery member — right-deep
    // chains keep refusing (the group does not open with SELECT/WITH)
    val rightDeep = intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF JOIN (fills f2 JOIN quotes q2 ON q2.sym = f2.sym) x " +
        "ON x.sym = t.sym AND x.fts >= t.tts").collect())
    assert(rightDeep.getMessage.contains("ASOF"))
    // grouped member without an alias: no ident to default from
    val noAlias = intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN (SELECT sym, qts FROM quotes) " +
        "ON quotes.sym = t.sym AND quotes.qts <= t.tts " +
        "ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts").collect())
    assert(noAlias.getMessage.contains("ASOF"))
  }

  test("guard ordering (ADVICE r14): an expand-refused chain reaches " +
    "guidance even under a tiny maxPairs — never 'refused at this " +
    "scale'") {
    fixtures()
    spark.conf.set("spark.graft.asof.maxPairs", "1")
    try {
      // bare * select list: asofChainBridge parses this chain but
      // asofChainExpand refuses (prefixed output names are not
      // reconstructible) — pre-fix the guard ran first and threw the
      // misleading scale refusal
      val e = intercept[Exception](DuckDialect.sql(spark,
        "SELECT * FROM trades t " +
          "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
          "ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts")
        .collect())
      assert(!e.getMessage.contains("refused at this scale"),
        s"expand-refused chain paid the scale guard: ${e.getMessage}")
      // and a BRIDGEABLE chain still gates on the pair bound
      val gated = intercept[IllegalArgumentException](DuckDialect.sql(spark,
        "SELECT t.sym, q.px FROM trades t " +
          "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
          "ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts")
        .collect())
      assert(gated.getMessage.contains("refused at this scale"))
    } finally spark.conf.unset("spark.graft.asof.maxPairs")
  }
}
