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
    // r15 second pass: an ALIASED PLAIN tree used to refuse here and
    // now BRIDGES — the inner product joins first, the outer ASOF
    // picks over it (DuckDB-pinned: only A@2 finds an fts >= tts;
    // selected columns are tie-invariant under the fts tie)
    val treeNow = DuckDialect.sql(spark,
      "SELECT t.sym, x.fts, x.f FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF JOIN (fills f2 JOIN quotes q2 ON q2.sym = f2.sym) x " +
        "ON x.sym = t.sym AND x.fts >= t.tts").collect()
      .map(_.toSeq).toSeq
    assert(treeNow == Seq(Seq("A", 4, 7)))
    // grouped member without an alias: no ident to default from
    val noAlias = intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN (SELECT sym, qts FROM quotes) " +
        "ON quotes.sym = t.sym AND quotes.qts <= t.tts " +
        "ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.tts").collect())
    assert(noAlias.getMessage.contains("ASOF"))
  }

  private def render(df: org.apache.spark.sql.DataFrame): String =
    df.columns.mkString(";") + "#" + df.collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else String.valueOf(r.get(i)))
        .mkString(",")
    }.mkString("|")

  private def writeGz(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(p))
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  test("gz CSV sniff (VERDICT r14 item 6): option-free read_csv on " +
    ".csv.gz parses exactly as DuckDB's transparent gz sniff; " +
    "ambiguous dialects keep today's refusal; other codecs refuse") {
    graft.functions.DuckCompat.register(spark)
    // every expected rendering pinned against the installed DuckDB on
    // the same (decompressed) bytes — same dialect answers as the
    // uncompressed R13b rows
    val cases = Seq(
      ("/tmp/sniffgz15/g1.csv.gz", "id,name\n54.8,795\n53.3,732\n11.3,525\n",
        "id;name#54.8,795|53.3,732|11.3,525"),
      ("/tmp/sniffgz15/g2.csv.gz",
        "name;score;city\n420;alpha;kappa\n294;sigma;beta\n",
        "name;score;city#420,alpha,kappa|294,sigma,beta"),
      ("/tmp/sniffgz15/g3.csv.gz", "city\tqty\n136\t46\n669\t655\n",
        "city;qty#136,46|669,655"),
      ("/tmp/sniffgz15/g4.csv.gz", "77.7,64.3,20.7\n74.8,13.8,39.9\n",
        "column0;column1;column2#77.7,64.3,20.7|74.8,13.8,39.9"))
    cases.foreach { case (path, content, want) =>
      writeGz(path, content)
      val got = render(DuckDialect.sql(spark,
        s"SELECT * FROM read_csv('$path')"))
      assert(got == want, s"\nfile: $path\n want: $want\n  got: $got")
    }
    // single-column fallback with a PARTIAL (>64 KB decompressed)
    // sample: the whole-file separator scan must read DECOMPRESSED
    // bytes. DuckDB-pinned: ['w0'], 8999 rows, w1 first, w8999 last.
    val big = (0 until 9000).map(i => s"w$i").mkString("", "\n", "\n")
    writeGz("/tmp/sniffgz15/big_sc.csv.gz", big)
    val df = DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffgz15/big_sc.csv.gz')")
    assert(df.columns.toSeq == Seq("w0"))
    val vals = df.collect().map(_.getString(0))
    assert(vals.length == 8999 && vals.head == "w1" && vals.last == "w8999")
    // ambiguous dialect inside the gz: same refusal as the plain file
    writeGz("/tmp/sniffgz15/amb.csv.gz", "a,b;c\nd,e;f\n")
    val e1 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffgz15/amb.csv.gz')").collect())
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    // a mislabeled .gz (plain bytes) refuses loudly, never misparses
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/sniffgz15/fake.csv.gz"),
      "a,b\n1,2\n".getBytes("UTF-8"))
    val e2 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffgz15/fake.csv.gz')").collect())
    assert(e2.getMessage.contains("cannot decompress"), e2.getMessage)
  }

  test("right-deep tree members (r15 second pass): an unaliased " +
    "parenthesized inner ASOF join evaluates INNER-FIRST and leaks its " +
    "aliases — rows equal DuckDB's native right-deep chain") {
    fixtures()
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // inner-first is provably different from left-deep: A@5 picks q3
    // here because the inner (quote→fill) pick runs before the outer —
    // a left-deep respelling would pick q5 and drop the row
    assert(run("SELECT t.sym, t.tts, q.qts, f.fts FROM trades t " +
      "ASOF JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4), Seq("A", 5, 3, 4), Seq("B", 7, 2, 5)))
    // inner ASOF LEFT keeps fill-less quotes (NULL fts)
    assert(run("SELECT t.sym, t.tts, q.qts, f.fts FROM trades t " +
      "ASOF JOIN (quotes q ASOF LEFT JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4), Seq("A", 5, 5, null), Seq("B", 7, 6, null)))
    // outer ASOF LEFT over the tree
    assert(run("SELECT t.sym, t.tts, q.qts, f.fts FROM trades t " +
      "ASOF LEFT JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4), Seq("A", 5, 3, 4), Seq("B", 7, 2, 5)))
    // the outer range may bind the SECOND inner alias
    assert(run("SELECT t.sym, t.tts, f.fts FROM trades t " +
      "ASOF JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND f.fts >= t.tts ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 4)))
    // a LATER chain step may reference the tree's inner aliases
    assert(run("SELECT t.sym, t.tts, q.qts, f.fts, d.qts AS dq FROM trades t " +
      "ASOF JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND q.qts <= t.tts " +
      "ASOF LEFT JOIN quotes d ON d.sym = f.sym AND d.qts > f.fts " +
      "ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4, 5), Seq("A", 5, 3, 4, 5), Seq("B", 7, 2, 5, 6)))
    // a PLAIN outer join over a tree member (zero top-level ASOFs —
    // the tree's own ASOF is paren-hidden) — both kinds DuckDB-pinned
    assert(run("SELECT t.sym, t.tts, q.qts, f.fts FROM trades t " +
      "JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND q.qts + 1 = t.tts ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4)))
    assert(run("SELECT t.sym, t.tts, q.qts, f.fts FROM trades t " +
      "LEFT JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
      "ON q.sym = t.sym AND q.qts + 1 = t.tts ORDER BY t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4), Seq("A", 5, null, null),
        Seq("B", 7, null, null)))
    // keyword case-robustness: the classifier lowercases — an
    // all-lowercase tree and a mixed-case head parse identically
    assert(run("select t.sym, t.tts, q.qts, f.fts from trades t " +
      "asof join (quotes q asof left join fills f on f.sym = q.sym and f.fts >= q.qts) " +
      "on q.sym = t.sym and q.qts <= t.tts order by t.sym, t.tts") ==
      Seq(Seq("A", 2, 1, 4), Seq("A", 5, 5, null), Seq("B", 7, 6, null)))
    // refusals: aliased tree (DuckDB mixes member- and inner-alias
    // scoping), inner PLAIN join (spell it left-deep), alias collision
    // the INNER pair generation is gated too (|r1| × r2's largest
    // inner-equi group), not just the outer step
    spark.conf.set("spark.graft.asof.maxPairs", "1")
    try {
      val gated = intercept[IllegalArgumentException](DuckDialect.sql(spark,
        "SELECT t.sym, f.fts FROM trades t " +
          "ASOF JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
          "ON q.sym = t.sym AND q.qts <= t.tts").collect())
      assert(gated.getMessage.contains("refused at this scale"))
    } finally spark.conf.unset("spark.graft.asof.maxPairs")
    // an ALIASED tree hides its inner aliases (r15 second pass) — the
    // outer ON referencing q2 through x's scope fails loudly, exactly
    // DuckDB's "Referenced table q2 not found" binder error
    intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN (quotes q2 ASOF JOIN fills f2 ON f2.sym = q2.sym AND f2.fts >= q2.qts) x " +
        "ON q2.sym = t.sym AND q2.qts <= t.tts " +
        "JOIN fills f3 ON f3.sym = t.sym").collect())
    // an UNALIASED PLAIN tree used to refuse here and now BRIDGES
    // (r15 second pass) — inner product first, aliases leak
    // (DuckDB-pinned rows)
    val plainTree = DuckDialect.sql(spark,
      "SELECT t.sym, q2.px, f3.fts FROM trades t " +
        "ASOF JOIN (quotes q2 JOIN fills f2 ON f2.sym = q2.sym) " +
        "ON q2.sym = t.sym AND q2.qts <= t.tts " +
        "JOIN fills f3 ON f3.sym = t.sym " +
        "ORDER BY t.sym, t.tts, q2.px").collect().map(_.toSeq).toSeq
    assert(plainTree == Seq(Seq("A", 10, 4), Seq("A", 12, 4),
      Seq("B", 21, 5)))
    // an unaliased tree whose inner alias COLLIDES with an earlier
    // one keeps refusing
    intercept[Exception](DuckDialect.sql(spark,
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN (quotes t ASOF JOIN fills f ON f.sym = t.sym AND f.fts >= t.qts) " +
        "ON t.sym = t.sym AND t.qts <= t.tts " +
        "JOIN fills f3 ON f3.sym = t.sym").collect())
  }

  test("composed r15 chain: tree member + subquery member + RIGHT dim " +
    "step in ONE statement equals DuckDB") {
    import spark.implicits._
    fixtures()
    Seq(("A", "alpha"), ("B", "beta"), ("C", "gamma"))
      .toDF("sym", "nm").createOrReplaceTempView("dimsc")
    val got = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, f.fts, s.px AS spx, d.nm " +
        "FROM trades t " +
        "ASOF JOIN (quotes q ASOF JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
        "ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF LEFT JOIN (SELECT sym, qts, px FROM quotes WHERE px <> 11) s " +
        "ON s.sym = f.sym AND s.qts > f.fts " +
        "RIGHT JOIN dimsc d ON d.sym = t.sym " +
        "ORDER BY d.nm, t.tts NULLS LAST").collect().map(_.toSeq).toSeq
    assert(got == Seq(
      Seq("A", 2, 1, 4, 12, "alpha"), Seq("A", 5, 3, 4, 12, "alpha"),
      Seq("B", 7, 2, 5, 21, "beta"),
      Seq(null, null, null, null, null, "gamma")))
  }

  test("RIGHT/FULL plain members in mixed chains (r15): null-extension " +
    "of the accumulated side equals DuckDB's left-deep chain") {
    import spark.implicits._
    fixtures()
    Seq(("A", "alpha"), ("B", "beta"), ("C", "gamma"), ("D", "delta"))
      .toDF("sym", "nm").createOrReplaceTempView("dims2")
    Seq(("A", 4, 7), ("B", 5, 8), ("C", 9, 9))
      .toDF("sym", "fts", "f").createOrReplaceTempView("fills2")
    // RIGHT member after an ASOF step: unmatched dims rows surface with
    // every accumulated column NULL (DuckDB-pinned)
    val got1 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, d.nm FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "RIGHT JOIN dims2 d ON d.sym = t.sym " +
        "ORDER BY d.nm, t.tts").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getInt(2), r.getString(3)))
    assert(got1.toSeq == Seq(("A", 2, 1, "alpha"), ("A", 5, 5, "alpha"),
      ("B", 7, 6, "beta"), (null, null, null, "delta"),
      (null, null, null, "gamma")))
    // FULL member (DuckDB-pinned)
    val got2 = DuckDialect.sql(spark,
      "SELECT t.sym, t.tts, q.qts, f.f FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "FULL JOIN fills2 f ON f.sym = t.sym " +
        "ORDER BY t.tts NULLS LAST, f.f NULLS LAST").collect()
      .map(r => (if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3)))
    assert(got2.toSeq == Seq((2, 1, 7), (5, 5, 7), (7, 6, 8),
      (null, null, 9)))
    // ASOF steps AFTER a RIGHT member see the NULLed accumulated
    // columns: LEFT null-extends, INNER drops (both DuckDB-pinned)
    Seq(("A", "alpha"), ("B", "beta"), ("C", "gamma"))
      .toDF("sym", "nm").createOrReplaceTempView("dims3")
    val got3 = DuckDialect.sql(spark,
      "SELECT d.sym, d.nm, t.tts, q.qts FROM trades t " +
        "RIGHT JOIN dims3 d ON d.sym = t.sym " +
        "ASOF LEFT JOIN quotes q ON q.sym = d.sym AND q.qts <= t.tts " +
        "ORDER BY d.nm, t.tts NULLS LAST, q.qts NULLS LAST").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3)))
    assert(got3.toSeq == Seq(("A", "alpha", 2, 1), ("A", "alpha", 5, 5),
      ("B", "beta", 7, 6), ("C", "gamma", null, null)))
    val got4 = DuckDialect.sql(spark,
      "SELECT d.sym, d.nm, t.tts, q.qts FROM trades t " +
        "RIGHT JOIN dims3 d ON d.sym = t.sym " +
        "ASOF JOIN quotes q ON q.sym = d.sym AND q.qts <= t.tts " +
        "ORDER BY d.nm, t.tts").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(got4.toSeq == Seq(("A", "alpha", 2, 1), ("A", "alpha", 5, 5),
      ("B", "beta", 7, 6)))
    // ASOF RIGHT/FULL are not DuckDB syntax — refuse to guidance
    for (k <- Seq("RIGHT", "FULL"))
      intercept[Exception](DuckDialect.sql(spark,
        s"SELECT t.sym FROM trades t " +
          s"ASOF $k JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
          "JOIN dims3 d ON d.sym = t.sym").collect())
  }

  test("wrapped COLUMNS REPLACE: CAST and unary-minus spellings render " +
    "DuckDB's derived names (r15 — every name and value DuckDB-pinned)") {
    import spark.implicits._
    Seq((1, 2, "x")).toDF("aa", "ab", "c").createOrReplaceTempView("wr")
    def run(q: String): (Seq[String], Seq[Any]) = {
      val df = DuckDialect.sql(spark, q)
      (df.columns.toSeq, df.collect().head.toSeq)
    }
    // CAST re-rendering: lowercase/:: spellings canonicalize, the arg
    // renders as an expression (parenthesized when binary)
    assert(run("SELECT max(COLUMNS(* REPLACE (cast(aa as double) AS aa))) FROM wr") ==
      ((Seq("max(aa := CAST(aa AS DOUBLE))", "ab", "c"), Seq(1.0, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (CAST(aa AS long) AS aa))) FROM wr") ==
      ((Seq("max(aa := CAST(aa AS BIGINT))", "ab", "c"), Seq(1L, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (cast(aa + 1 as double) AS aa))) FROM wr") ==
      ((Seq("max(aa := CAST((aa + 1) AS DOUBLE))", "ab", "c"),
        Seq(2.0, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (abs(cast(aa as double)) AS aa))) FROM wr") ==
      ((Seq("max(aa := abs(CAST(aa AS DOUBLE)))", "ab", "c"),
        Seq(1.0, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (cast(aa as double) / 2 AS aa))) FROM wr") ==
      ((Seq("max(aa := (CAST(aa AS DOUBLE) / 2))", "ab", "c"),
        Seq(0.5, 2, "x"))))
    // unary minus: verbatim on a literal, -(atom), -((expr)), and as a
    // binary operand
    assert(run("SELECT max(COLUMNS(* REPLACE (-5 AS aa))) FROM wr") ==
      ((Seq("max(aa := -5)", "ab", "c"), Seq(-5, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (- aa AS aa))) FROM wr") ==
      ((Seq("max(aa := -(aa))", "ab", "c"), Seq(-1, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (-(aa+1) AS aa))) FROM wr") ==
      ((Seq("max(aa := -((aa + 1)))", "ab", "c"), Seq(-2, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (-aa + 1 AS aa))) FROM wr") ==
      ((Seq("max(aa := (-(aa) + 1))", "ab", "c"), Seq(0, 2, "x"))))
    // r15 third pass: the DuckDB-only type spellings BRIDGE now — the
    // derived NAME uses DuckDB's canonicalization and the EXECUTED
    // expression rewrites to a Spark-parseable twin
    // (DuckCompatMatrixR15bSpec pins the full matrix); the old refusal
    // rows assert the bridged behavior instead
    assert(run("SELECT max(COLUMNS(* REPLACE (cast(aa as int4) AS aa))) FROM wr") ==
      ((Seq("max(aa := CAST(aa AS INTEGER))", "ab", "c"), Seq(1, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (cast(aa as float8) AS aa))) FROM wr") ==
      ((Seq("max(aa := CAST(aa AS DOUBLE))", "ab", "c"), Seq(1.0, 2, "x"))))
    assert(run("SELECT max(COLUMNS(* REPLACE (cast(aa as double precision) AS aa))) FROM wr") ==
      ((Seq("max(aa := CAST(aa AS DOUBLE))", "ab", "c"), Seq(1.0, 2, "x"))))
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
