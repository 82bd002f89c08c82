package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential matrix for the r15 compression closure: transparent
  * `.zst` CSV/JSON sniffing (DuckDB auto-detects gzip AND zstd; the gz
  * half landed earlier in r15), the `.gzip`/`.zstd` extension guards
  * (Spark decompresses those, DuckDB reads them as raw bytes — a
  * silent-divergence class that previously slipped through with
  * explicit options), and the read-side `compression` option policy
  * (DuckDB honors the option over the extension; Spark IGNORES it on
  * read — only redundant spellings bridge, everything else refuses).
  * Every expected row/behavior was pinned against the installed DuckDB
  * on identical fixture bytes while writing this spec. */
class DuckCompatMatrixR15bSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duckcompat-r15b-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def render(df: org.apache.spark.sql.DataFrame): String =
    df.columns.mkString(";") + "#" + df.collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else String.valueOf(r.get(i)))
        .mkString(",")
    }.mkString("|")

  private def writeZst(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    // zstd-jni — the SAME library Spark 4's read fallback
    // (HadoopCodecStreams.createZstdInputStream) decodes with
    val out = new com.github.luben.zstd.ZstdOutputStream(
      java.nio.file.Files.newOutputStream(p))
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def writeGz(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(p))
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def writePlain(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  test("zst CSV sniff: option-free read_csv on .csv.zst parses exactly " +
    "as DuckDB's transparent zstd sniff (dialects, headerless, " +
    "partial-sample whole-file scan, ambiguity, mislabeled bytes)") {
    graft.functions.DuckCompat.register(spark)
    // DuckDB-pinned on the same decompressed bytes — identical answers
    // to the plain/gz rows (the codec is transparent to the dialect)
    val cases = Seq(
      ("/tmp/sniffzst15/z1.csv.zst",
        "id,name\n54.8,795\n53.3,732\n11.3,525\n",
        "id;name#54.8,795|53.3,732|11.3,525"),
      ("/tmp/sniffzst15/z3.csv.zst", "city\tqty\n136\t46\n669\t655\n",
        "city;qty#136,46|669,655"),
      ("/tmp/sniffzst15/z4.csv.zst", "77.7,64.3,20.7\n74.8,13.8,39.9\n",
        "column0;column1;column2#77.7,64.3,20.7|74.8,13.8,39.9"))
    cases.foreach { case (path, content, want) =>
      writeZst(path, content)
      val got = render(DuckDialect.sql(spark,
        s"SELECT * FROM read_csv('$path')"))
      assert(got == want, s"\nfile: $path\n want: $want\n  got: $got")
    }
    // single-column fallback with a PARTIAL (>64 KB decompressed)
    // sample: the whole-file separator scan must stream DECOMPRESSED
    // zstd bytes end to end. Same contract as the gz row: ['w0'],
    // 8999 rows, w1 first, w8999 last.
    val big = (0 until 9000).map(i => s"w$i").mkString("", "\n", "\n")
    writeZst("/tmp/sniffzst15/big_sc.csv.zst", big)
    val df = DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/big_sc.csv.zst')")
    assert(df.columns.toSeq == Seq("w0"))
    val vals = df.collect().map(_.getString(0))
    assert(vals.length == 8999 && vals.head == "w1" && vals.last == "w8999")
    // ambiguous dialect inside the zst: same refusal as plain/gz
    writeZst("/tmp/sniffzst15/amb.csv.zst", "a,b;c\nd,e;f\n")
    val e1 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/amb.csv.zst')").collect())
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    // mislabeled .zst (plain bytes) refuses loudly, never misparses —
    // DuckDB-pinned twin: "IO Error: Unknown frame descriptor"
    writePlain("/tmp/sniffzst15/fake.csv.zst", "a,b\n1,2\n")
    val e2 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/fake.csv.zst')").collect())
    assert(e2.getMessage.contains("cannot decompress"), e2.getMessage)
    // read_json on .ndjson.zst: Spark's zstd-jni read fallback and
    // DuckDB's transparent sniff agree (DuckDB-pinned rows)
    writeZst("/tmp/sniffzst15/j1.ndjson.zst",
      "{\"k\":1,\"name\":\"a\"}\n{\"k\":2,\"name\":\"b\"}\n")
    val j = DuckDialect.sql(spark,
      "SELECT k, name FROM read_json('/tmp/sniffzst15/j1.ndjson.zst') " +
        "ORDER BY k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(j.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test(".gzip/.zstd extension guard: Spark decompresses them, DuckDB " +
    "reads raw bytes (pinned) — every bridged form refuses, even with " +
    "explicit options") {
    graft.functions.DuckCompat.register(spark)
    writeGz("/tmp/sniffzst15/d.csv.gzip", "id,name\n1,a\n")
    writeZst("/tmp/sniffzst15/d.csv.zstd", "id,name\n1,a\n")
    writeZst("/tmp/sniffzst15/d.ndjson.zstd", "{\"k\":1}\n")
    for (q <- Seq(
      "SELECT * FROM read_csv('/tmp/sniffzst15/d.csv.gzip')",
      "SELECT * FROM read_csv('/tmp/sniffzst15/d.csv.gzip', " +
        "header = true, delim = ',')",
      "SELECT * FROM read_csv('/tmp/sniffzst15/d.csv.zstd', " +
        "header = true, delim = ',')",
      "SELECT * FROM read_json('/tmp/sniffzst15/d.ndjson.zstd')")) {
      val e = intercept[Exception](DuckDialect.sql(spark, q).collect())
      assert(e.getMessage.contains(".gzip/.zstd"), s"$q -> ${e.getMessage}")
    }
    // COPY FROM carries the same guard
    spark.sql("DROP TABLE IF EXISTS graft_r15b_t")
    val wh = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, "graft_r15b_t")
    if (wh.exists()) { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }; rm(wh) }
    spark.sql("CREATE TABLE graft_r15b_t (id BIGINT, name STRING) " +
      "USING parquet")
    val ce = intercept[Exception](DuckDialect.sql(spark,
      "COPY graft_r15b_t FROM '/tmp/sniffzst15/d.csv.gzip' " +
        "(FORMAT CSV, HEADER, DELIMITER ',')"))
    assert(ce.getMessage.contains(".gzip/.zstd"), ce.getMessage)
    // and a positive control: COPY FROM a real .gz loads (both engines
    // decompress .gz transparently)
    writeGz("/tmp/sniffzst15/load.csv.gz", "id,name\n7,eta\n8,theta\n")
    val c = DuckDialect.sql(spark,
      "COPY graft_r15b_t FROM '/tmp/sniffzst15/load.csv.gz' " +
        "(FORMAT CSV, HEADER, DELIMITER ',')")
    assert(c.head.getLong(0) == 2)
    assert(spark.table("graft_r15b_t").count() == 2)
  }

  test("compression read option: redundant spellings bridge (DuckDB " +
    "honors the option, Spark ignores it — same bytes either way); " +
    "non-redundant ones refuse (DuckDB-pinned divergences)") {
    graft.functions.DuckCompat.register(spark)
    writeGz("/tmp/sniffzst15/c1.csv.gz", "id,name\n1,a\n2,b\n")
    writeZst("/tmp/sniffzst15/c1.csv.zst", "id,name\n1,a\n2,b\n")
    writePlain("/tmp/sniffzst15/c1.csv", "id,name\n1,a\n2,b\n")
    writeGz("/tmp/sniffzst15/noext", "id,name\n1,a\n2,b\n")
    def rows(q: String): Seq[(Long, String)] =
      DuckDialect.sql(spark, q).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = Seq((1L, "a"), (2L, "b"))
    // redundant: option matches what the extension already implies
    assert(rows("SELECT CAST(id AS BIGINT) AS id, name FROM read_csv(" +
      "'/tmp/sniffzst15/c1.csv.gz', compression = 'gzip', " +
      "header = true, delim = ',')") == want)
    assert(rows("SELECT CAST(id AS BIGINT) AS id, name FROM read_csv(" +
      "'/tmp/sniffzst15/c1.csv.zst', compression = 'zstd', " +
      "header = true, delim = ',')") == want)
    assert(rows("SELECT CAST(id AS BIGINT) AS id, name FROM read_csv(" +
      "'/tmp/sniffzst15/c1.csv', compression = 'none', " +
      "header = true, delim = ',')") == want)
    assert(rows("SELECT CAST(id AS BIGINT) AS id, name FROM read_csv(" +
      "'/tmp/sniffzst15/c1.csv.gz', compression = 'auto', " +
      "header = true, delim = ',')") == want)
    // redundant option + OPTION-FREE dialect: the sniffer still runs
    assert(rows("SELECT CAST(id AS BIGINT) AS id, name FROM read_csv(" +
      "'/tmp/sniffzst15/c1.csv.zst', compression = 'zstd')") == want)
    // non-redundant: DuckDB DECOMPRESSES a noext file under 'gzip'
    // (pinned) — Spark would read raw gzip bytes; refuse
    val e1 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/noext', " +
        "compression = 'gzip', header = true, delim = ',')").collect())
    assert(e1.getMessage.contains("not redundant"), e1.getMessage)
    // DuckDB reads a .zst RAW under 'none' (pinned) — Spark decompresses
    val e2 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/c1.csv.zst', " +
        "compression = 'none', header = true, delim = ',')").collect())
    assert(e2.getMessage.contains("not redundant"), e2.getMessage)
    // DuckDB decompresses a .csv under 'zstd' (pinned) — Spark reads raw
    val e3 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/c1.csv', " +
        "compression = 'zstd', header = true, delim = ',')").collect())
    assert(e3.getMessage.contains("not redundant"), e3.getMessage)
    // unknown spelling: DuckDB parser-errors on 'gz' (pinned) — so do we
    val e4 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffzst15/c1.csv.gz', " +
        "compression = 'gz', header = true, delim = ',')").collect())
    assert(e4.getMessage.contains("compression type"), e4.getMessage)
    // read_json: same policy
    writeZst("/tmp/sniffzst15/c1.ndjson.zst", "{\"id\":1}\n{\"id\":2}\n")
    writePlain("/tmp/sniffzst15/c1.ndjson", "{\"id\":1}\n{\"id\":2}\n")
    assert(DuckDialect.sql(spark,
      "SELECT id FROM read_json('/tmp/sniffzst15/c1.ndjson.zst', " +
        "compression = 'zstd') ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val e5 = intercept[Exception](DuckDialect.sql(spark,
      "SELECT * FROM read_json('/tmp/sniffzst15/c1.ndjson', " +
        "compression = 'zstd')").collect())
    assert(e5.getMessage.contains("not redundant"), e5.getMessage)
  }

  private def chainFixtures(): Unit = {
    import spark.implicits._
    Seq(("A", 2, 100), ("A", 5, 101), ("B", 7, 200))
      .toDF("sym", "tts", "qty").createOrReplaceTempView("trades")
    Seq(("A", 1, 10), ("A", 3, 11), ("A", 5, 12), ("B", 2, 20), ("B", 6, 21))
      .toDF("sym", "qts", "px").createOrReplaceTempView("quotes")
    Seq(("A", "tech"), ("B", "energy"))
      .toDF("sym", "sector").createOrReplaceTempView("syminfo")
    Seq(("A", "tech"))
      .toDF("sym", "sector").createOrReplaceTempView("syminfo2")
    Seq(("A", "tech"), ("C", "bio"))
      .toDF("sym", "sector").createOrReplaceTempView("syminfo3")
    Seq(Tuple1(9)).toDF("z").createOrReplaceTempView("nocommon")
  }

  test("NATURAL chain members (r15 second pass): implied equalities " +
    "synthesized from live schemas — INNER/LEFT/RIGHT/FULL rows equal " +
    "DuckDB's; ambiguity and empty intersections refuse where DuckDB " +
    "binder-errors") {
    chainFixtures()
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // NATURAL mid-chain before an ASOF step (DuckDB-pinned rows)
    assert(run(
      "SELECT t.sym, t.tts, si.sector, q.qts, q.px FROM trades t " +
        "NATURAL JOIN syminfo si " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ORDER BY t.sym, t.tts") == Seq(
      Seq("A", 2, "tech", 1, 10), Seq("A", 5, "tech", 5, 12),
      Seq("B", 7, "energy", 6, 21)))
    // NATURAL INNER spelling — same rows
    assert(run(
      "SELECT t.sym, t.tts, si.sector, q.qts, q.px FROM trades t " +
        "NATURAL INNER JOIN syminfo si " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ORDER BY t.sym, t.tts") == Seq(
      Seq("A", 2, "tech", 1, 10), Seq("A", 5, "tech", 5, 12),
      Seq("B", 7, "energy", 6, 21)))
    // NATURAL LEFT [OUTER]: unmatched left rows keep NULL sector
    for (spelling <- Seq("NATURAL LEFT JOIN", "NATURAL LEFT OUTER JOIN"))
      assert(run(
        s"SELECT t.sym, t.tts, si.sector, q.qts FROM trades t " +
          s"$spelling syminfo2 si " +
          "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
          "ORDER BY t.sym, t.tts") == Seq(
        Seq("A", 2, "tech", 1), Seq("A", 5, "tech", 5),
        Seq("B", 7, null, 6)), spelling)
    // qualified refs to BOTH sides of the natural join resolve (DuckDB
    // keeps both; the prefixed flattening does too)
    assert(run(
      "SELECT t.sym, si.sym AS ssym, q.px FROM trades t " +
        "NATURAL JOIN syminfo si " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ORDER BY t.sym, q.px") == Seq(
      Seq("A", "A", 10), Seq("A", "A", 12), Seq("B", "B", 21)))
    // NATURAL RIGHT: null-extends the accumulated side; the later ASOF
    // LEFT sees the NULLed t.sym and null-extends those rows (pinned)
    assert(run(
      "SELECT t.sym, si.sym AS ssym, si.sector, q.px FROM trades t " +
        "NATURAL RIGHT JOIN syminfo3 si " +
        "ASOF LEFT JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ORDER BY si.sym NULLS LAST, t.tts") == Seq(
      Seq("A", "A", "tech", 10), Seq("A", "A", "tech", 12),
      Seq(null, "C", "bio", null)))
    // NATURAL FULL: rows on both sides survive (pinned)
    assert(run(
      "SELECT t.sym, si.sym AS ssym, si.sector FROM trades t " +
        "NATURAL FULL JOIN syminfo3 si " +
        "ASOF LEFT JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ORDER BY t.sym NULLS LAST, si.sym NULLS LAST, t.tts NULLS LAST"
    ) == Seq(
      Seq("A", "A", "tech"), Seq("A", "A", "tech"),
      Seq("B", null, null), Seq(null, "C", "bio")))
    // no shared columns: DuckDB binder-errors ("No columns found to
    // join on") — the bridge refuses to guidance, never a product
    val e1 = intercept[Exception](run(
      "SELECT t.sym, n.z FROM trades t NATURAL JOIN nocommon n " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts"))
    assert(e1.getMessage.contains("ASOF"), e1.getMessage)
    // shared name under TWO earlier aliases (t.sym and q.sym): DuckDB
    // binder-errors ("Ambiguous reference") — the bridge refuses
    val e2 = intercept[Exception](run(
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "NATURAL JOIN syminfo si ORDER BY t.sym"))
    assert(e2.getMessage.contains("ASOF"), e2.getMessage)
    // single (non-chain) NATURAL JOIN goes to Spark natively with the
    // same semantics — pinned control row
    assert(run("SELECT t.sym, si.sector FROM trades t " +
      "NATURAL JOIN syminfo si ORDER BY t.sym, t.tts") == Seq(
      Seq("A", "tech"), Seq("A", "tech"), Seq("B", "energy")))
  }

  test("ALIASED tree members (r15 second pass): `(r1 ASOF JOIN r2 ON c) x` " +
    "— the outer alias hides the inners, duplicate names resolve " +
    "first-occurrence, rows equal DuckDB's (pinned)") {
    chainFixtures()
    import spark.implicits._
    // fills with only an A row: the B branch exercises the inner
    // LEFT's null-extension AND the dup-name (sym) first-occurrence
    // resolution (x.sym must be p.sym = 'B', not r.sym = NULL)
    Seq(("A", 4, 7))
      .toDF("sym", "fts", "f").createOrReplaceTempView("fills1")
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    assert(run(
      "SELECT t.sym, t.tts, x.qts, x.px, x.f, x.sym AS xs FROM trades t " +
        "ASOF JOIN (quotes p ASOF LEFT JOIN fills1 r " +
        "ON r.sym = p.sym AND r.fts >= p.qts) x " +
        "ON x.sym = t.sym AND x.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(
      Seq("A", 2, 1, 10, 7, "A"), Seq("A", 5, 5, 12, null, "A"),
      Seq("B", 7, 6, 21, null, "B")))
    // ASOF LEFT over an aliased INNER tree: the inner plain-ASOF drops
    // quotes without a qualifying fill BEFORE the outer pick (pinned —
    // A@5 picks px 11, not 12)
    assert(run(
      "SELECT t.sym, t.tts, x.px FROM trades t " +
        "ASOF LEFT JOIN (quotes p ASOF JOIN fills1 r " +
        "ON r.sym = p.sym AND r.fts >= p.qts) x " +
        "ON x.sym = t.sym AND x.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10), Seq("A", 5, 11), Seq("B", 7, null)))
    // inner aliases are HIDDEN: referencing p through the outer scope
    // fails loudly here exactly as DuckDB binder-errors
    val e = intercept[Exception](run(
      "SELECT t.sym, p.px FROM trades t " +
        "ASOF JOIN (quotes p ASOF LEFT JOIN fills1 r " +
        "ON r.sym = p.sym AND r.fts >= p.qts) x " +
        "ON x.sym = t.sym AND x.qts <= t.tts"))
    assert(e != null)
  }

  test("PLAIN-join tree members (r15 second pass): `(r1 JOIN r2 ON c) " +
    "[x]` evaluates inner-first — rows equal DuckDB's; equi-free inner " +
    "products refuse; asof-free plain trees stay native") {
    chainFixtures()
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // unaliased plain-inner tree: aliases leak, inner join runs first
    assert(run(
      "SELECT t.sym, t.tts, q.px, si.sector FROM trades t " +
        "ASOF JOIN (quotes q JOIN syminfo si ON si.sym = q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10, "tech"), Seq("A", 5, 12, "tech"),
      Seq("B", 7, 21, "energy")))
    // aliased inner-LEFT tree: null-extended sector for B (syminfo2
    // has only A), x hides the inners
    assert(run(
      "SELECT t.sym, t.tts, x.px, x.sector FROM trades t " +
        "ASOF JOIN (quotes q LEFT JOIN syminfo2 si ON si.sym = q.sym) x " +
        "ON x.sym = t.sym AND x.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10, "tech"), Seq("A", 5, 12, "tech"),
      Seq("B", 7, 21, null)))
    // inner-first is observable: the inner INNER join drops B quotes
    // (no B in syminfo2) BEFORE the outer ASOF LEFT picks — B
    // null-extends where a left-deep respelling would still match
    assert(run(
      "SELECT t.sym, t.tts, q.px FROM trades t " +
        "ASOF LEFT JOIN (quotes q JOIN syminfo2 si ON si.sym = q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10), Seq("A", 5, 12), Seq("B", 7, null)))
    // equi-free plain inner tree: the nested-loop class the pair gate
    // cannot bound — refuses to guidance
    val e = intercept[Exception](run(
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN (quotes q JOIN syminfo si ON si.sector <> q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts"))
    assert(e.getMessage.contains("ASOF"), e.getMessage)
  }

  test("inner RIGHT/FULL tree members (r15 third pass): the inner " +
    "join null-extends INSIDE the member before the outer step — " +
    "rows equal DuckDB's (pinned)") {
    chainFixtures()
    import spark.implicits._
    Seq(("A", "tech"), ("C", "bio"))
      .toDF("sym", "sector").createOrReplaceTempView("syminfo2b")
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // inner RIGHT: all syminfo2b rows survive inside the member (C has
    // no quotes — its member rows carry NULL q cols, so the outer ASOF
    // equi never matches them and B's trades null-extend)
    assert(run(
      "SELECT t.sym, t.tts, q.px, si.sym AS ssym, si.sector " +
        "FROM trades t " +
        "ASOF LEFT JOIN (quotes q RIGHT JOIN syminfo2b si " +
        "ON si.sym = q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10, "A", "tech"), Seq("A", 5, 12, "A", "tech"),
      Seq("B", 7, null, null, null)))
    // inner FULL: both unmatched sides survive inside the member —
    // B's quotes (no syminfo2b row) still reach the outer pick
    assert(run(
      "SELECT t.sym, t.tts, q.px, si.sector FROM trades t " +
        "ASOF LEFT JOIN (quotes q FULL JOIN syminfo2b si " +
        "ON si.sym = q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10, "tech"), Seq("A", 5, 12, "tech"),
      Seq("B", 7, 21, null)))
  }

  test("MULTI-JOIN tree members (r15 third pass): a parenthesized " +
    "inner CHAIN (asof + plain steps) evaluates inner-first, aliased " +
    "or unaliased — rows equal DuckDB's (pinned); no-asof groups " +
    "keep refusing") {
    chainFixtures()
    import spark.implicits._
    Seq(("A", 4, 7), ("B", 5, 8))
      .toDF("sym", "fts", "f").createOrReplaceTempView("fills")
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // unaliased: every inner alias leaks (q, f, si all referenced)
    assert(run(
      "SELECT t.sym, t.tts, q.px, f.fts, si.sector FROM trades t " +
        "ASOF JOIN (quotes q ASOF LEFT JOIN fills f " +
        "ON f.sym = q.sym AND f.fts >= q.qts " +
        "JOIN syminfo si ON si.sym = q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10, 4, "tech"), Seq("A", 5, 12, null, "tech"),
      Seq("B", 7, 21, null, "energy")))
    // aliased: x hides the inners, first-occurrence dedup on sym
    assert(run(
      "SELECT t.sym, t.tts, x.px, x.fts, x.sector FROM trades t " +
        "ASOF JOIN (quotes q ASOF LEFT JOIN fills f " +
        "ON f.sym = q.sym AND f.fts >= q.qts " +
        "JOIN syminfo si ON si.sym = q.sym) x " +
        "ON x.sym = t.sym AND x.qts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10, 4, "tech"), Seq("A", 5, 12, null, "tech"),
      Seq("B", 7, 21, null, "energy")))
    // a multi-join group with NO asof inside keeps refusing when the
    // statement needs the chain machinery
    val e = intercept[Exception](run(
      "SELECT t.sym FROM trades t " +
        "ASOF JOIN (quotes q JOIN syminfo si ON si.sym = q.sym " +
        "JOIN fills f ON f.sym = q.sym) " +
        "ON q.sym = t.sym AND q.qts <= t.tts"))
    assert(e.getMessage.contains("ASOF") || e.getMessage.contains("asof"),
      e.getMessage)
  }

  test("NESTED asof pre-pass (r15 third pass): ASOF inside derived " +
    "tables, CTE bodies, scalar subqueries and chain subquery members " +
    "bridges — rows equal DuckDB's (pinned)") {
    chainFixtures()
    import spark.implicits._
    Seq(("A", 4, 7), ("B", 5, 8))
      .toDF("sym", "fts", "f").createOrReplaceTempView("fills")
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // derived table over a single asof, aggregated outside — the
    // wrap-then-aggregate shape that previously died on a raw parse
    assert(run(
      "SELECT s.sym, CAST(SUM(s.px) AS BIGINT) AS spx FROM " +
        "(SELECT t.sym, q.px FROM trades t ASOF JOIN quotes q " +
        "ON q.sym = t.sym AND q.qts <= t.tts) s " +
        "GROUP BY s.sym ORDER BY s.sym"
    ) == Seq(Seq("A", 22L), Seq("B", 21L)))
    // CTE body carrying a full asof CHAIN
    assert(run(
      "WITH c AS (SELECT t.sym, t.tts, q.px, f.fts FROM trades t " +
        "ASOF JOIN quotes q ON q.sym = t.sym AND q.qts <= t.tts " +
        "ASOF LEFT JOIN fills f ON f.sym = q.sym AND f.fts >= q.qts) " +
        "SELECT sym, tts, px, fts FROM c ORDER BY sym, tts"
    ) == Seq(Seq("A", 2, 10, 4), Seq("A", 5, 12, null),
      Seq("B", 7, 21, null)))
    // a chain subquery MEMBER whose own body contains an asof: the
    // pre-pass expands the member body first, then the outer chain
    // bridges over the clean subquery
    assert(run(
      "SELECT t.sym, t.tts, m.px2 FROM trades t " +
        "ASOF JOIN (SELECT t2.sym, t2.tts AS mts, q2.px * 2 AS px2 " +
        "FROM trades t2 ASOF JOIN quotes q2 " +
        "ON q2.sym = t2.sym AND q2.qts <= t2.tts) m " +
        "ON m.sym = t.sym AND m.mts <= t.tts ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 20), Seq("A", 5, 24), Seq("B", 7, 42)))
    // scalar subquery with a ROW-WISE asof inside (pinned)
    assert(run(
      "SELECT t.sym, t.tts, (SELECT q3.px FROM trades t3 " +
        "ASOF JOIN quotes q3 ON q3.sym = t3.sym AND q3.qts <= t3.tts " +
        "ORDER BY t3.sym, t3.tts LIMIT 1) AS firstpx " +
        "FROM trades t ORDER BY t.sym, t.tts"
    ) == Seq(Seq("A", 2, 10), Seq("A", 5, 10), Seq("B", 7, 10)))
    // an AGGREGATE select over the inner asof is a shape the single
    // bridge cannot host (the pick's row_number would mix with the
    // aggregate — MISSING_GROUP_BY): the pre-pass validates by
    // analysis and falls back to guidance, never a broken rewrite
    val e = intercept[Exception](run(
      "SELECT t.sym, (SELECT CAST(COUNT(*) AS BIGINT) FROM trades t3 " +
        "ASOF JOIN quotes q3 ON q3.sym = t3.sym AND q3.qts <= t3.tts) " +
        "AS nasof FROM trades t"))
    assert(e.getMessage.contains("ASOF") || e.getMessage.contains("asof"),
      e.getMessage)
  }

  test("wrapped COLUMNS REPLACE nested binaries (r15 second pass): " +
    "DuckDB renders its parse tree — precedence, left associativity, " +
    "one paren pair per node, unary minus — every name and value " +
    "DuckDB-pinned") {
    import spark.implicits._
    Seq((1, 2, "x")).toDF("aa", "ab", "c").createOrReplaceTempView("wrb")
    def run(q: String): (Seq[String], Seq[Any]) = {
      val df = DuckDialect.sql(spark, q)
      (df.columns.toSeq, df.collect().head.toSeq)
    }
    val rows = Seq(
      // precedence: * binds under + on the right
      ("aa+ab*2", "max(aa := (aa + (ab * 2)))", 5),
      // left associativity: - chains from the left
      ("2-aa-ab", "max(aa := ((2 - aa) - ab))", -1),
      // leading unary minus renders -(aa)
      ("-aa+ab", "max(aa := (-(aa) + ab))", 1),
      // post-operator minus is a literal sign, not a split point
      ("aa*-2", "max(aa := (aa * -2))", -2),
      // function arg keeps its node parens inside the call
      ("aa + abs(ab*2)", "max(aa := (aa + abs((ab * 2))))", 5),
      // explicit parens collapse to the same tree spelling
      ("(aa+1)*(ab-2)", "max(aa := ((aa + 1) * (ab - 2)))", 0))
    rows.foreach { case (expr, wantName, wantVal) =>
      val (names, vals) = run(
        s"SELECT max(COLUMNS(* REPLACE ($expr AS aa))) FROM wrb")
      assert(names == Seq(wantName, "ab", "c"), expr)
      assert(vals == Seq(wantVal, 2, "x"), expr)
    }
    // || chain (lowest precedence, left-assoc; DuckDB-pinned '1yx')
    val (n2, v2) = run(
      "SELECT max(COLUMNS(* EXCLUDE (ab) REPLACE (aa || 'y' || c AS aa))) FROM wrb")
    assert(n2 == Seq("max(aa := ((aa || 'y') || c))", "c"))
    assert(v2 == Seq("1yx", "x"))
    // comparisons joined the mechanical subset in the third pass —
    // the dedicated renderer test below pins the matrix
    val (n3, _) = run(
      "SELECT max(COLUMNS(* EXCLUDE (ab, c) REPLACE (aa > 1 AS aa))) FROM wrb")
    assert(n3 == Seq("max(aa := (aa > 1))"))
  }

  test("ASOF USING (r15 third pass): equality on all but the last " +
    "column, INCLUSIVE inequality on the last — single joins and " +
    "chain members, rows equal DuckDB's (pinned)") {
    import spark.implicits._
    Seq(("A", 2, 100), ("A", 5, 101), ("B", 7, 200))
      .toDF("sym", "ts", "qty").createOrReplaceTempView("utrades")
    Seq(("A", 1, 10), ("A", 3, 11), ("A", 5, 12), ("B", 2, 20), ("B", 6, 21))
      .toDF("sym", "ts", "px").createOrReplaceTempView("uquotes")
    Seq(("A", 4, 7), ("B", 5, 8))
      .toDF("sym", "ts", "f").createOrReplaceTempView("ufills")
    def run(q: String): Seq[Seq[Any]] =
      DuckDialect.sql(spark, q).collect().map(_.toSeq).toSeq
    // two-column USING: sym equality + ts inclusive inequality —
    // A@5 matches the ts=5 quote (inclusive, pinned)
    assert(run(
      "SELECT t.sym, t.ts, q.ts AS qts, q.px FROM utrades t " +
        "ASOF JOIN uquotes q USING (sym, ts) ORDER BY t.sym, t.ts"
    ) == Seq(Seq("A", 2, 1, 10), Seq("A", 5, 5, 12), Seq("B", 7, 6, 21)))
    // ASOF LEFT USING
    assert(run(
      "SELECT t.sym, t.ts, q.px FROM utrades t " +
        "ASOF LEFT JOIN uquotes q USING (sym, ts) ORDER BY t.sym, t.ts"
    ) == Seq(Seq("A", 2, 10), Seq("A", 5, 12), Seq("B", 7, 21)))
    // ONE-column USING: pure inequality, cross-sym (pinned — t@2 picks
    // B's ts=2 quote)
    assert(run(
      "SELECT t.ts, q.ts AS qts, q.px FROM utrades t " +
        "ASOF JOIN uquotes q USING (ts) ORDER BY t.ts"
    ) == Seq(Seq(2, 2, 20), Seq(5, 5, 12), Seq(7, 6, 21)))
    // USING member inside a CHAIN (owners resolve against the base;
    // DuckDB-pinned single row)
    assert(run(
      "SELECT t.sym, t.ts, q.ts AS qts FROM utrades t " +
        "ASOF LEFT JOIN uquotes q USING (sym, ts) " +
        "ASOF JOIN ufills f ON f.sym = t.sym AND f.ts >= t.ts " +
        "ORDER BY t.sym, t.ts"
    ) == Seq(Seq("A", 2, 1)))
  }

  test("derived-name renderer third pass: comparisons/AND/OR render " +
    "the precedence tree (<> canonicalizes to !=), DuckDB-only cast " +
    "spellings bridge with canonical names and Spark-twin execution — " +
    "all DuckDB-pinned; NOT/BETWEEN/chained comparisons keep refusing") {
    import spark.implicits._
    Seq((1, 2, "x")).toDF("aa", "ab", "c").createOrReplaceTempView("wrc")
    def run(q: String): (Seq[String], Seq[Any]) = {
      val df = DuckDialect.sql(spark, q)
      (df.columns.toSeq, df.collect().head.toSeq)
    }
    val rows = Seq(
      ("aa > 1", "max(aa := (aa > 1))", false),
      ("aa <> ab", "max(aa := (aa != ab))", true),
      ("aa < 2 AND ab > 1", "max(aa := ((aa < 2) AND (ab > 1)))", true),
      ("aa < 2 AND ab > 1 OR aa = 9",
        "max(aa := (((aa < 2) AND (ab > 1)) OR (aa = 9)))", true),
      ("aa = 9 OR aa < 2 AND ab > 1",
        "max(aa := ((aa = 9) OR ((aa < 2) AND (ab > 1))))", true),
      ("aa + 1 > ab * 2", "max(aa := ((aa + 1) > (ab * 2)))", false),
      ("aa > -1", "max(aa := (aa > -1))", true))
    rows.foreach { case (expr, wantName, wantVal) =>
      val (names, vals) = run(
        s"SELECT max(COLUMNS(* EXCLUDE (ab, c) REPLACE ($expr AS aa))) " +
          "FROM wrc")
      assert(names == Seq(wantName), expr)
      assert(vals == Seq(wantVal), expr)
    }
    // string comparison operand
    val (n1, v1) = run("SELECT min(COLUMNS(* EXCLUDE (ab) REPLACE " +
      "(c = 'x' AND aa <= ab AS aa))) FROM wrc")
    assert(n1 == Seq("min(aa := ((c = 'x') AND (aa <= ab)))", "c"))
    assert(v1 == Seq(true, "x"))
    // cast spellings: canonical NAME + value-identical execution
    val casts = Seq(
      ("cast(aa as int4)", "CAST(aa AS INTEGER)", 1),
      ("cast(aa as int8)", "CAST(aa AS BIGINT)", 1L),
      ("cast(aa as signed)", "CAST(aa AS INTEGER)", 1),
      ("cast(aa as float4)", "CAST(aa AS FLOAT)", 1.0f),
      ("cast(aa as real)", "CAST(aa AS FLOAT)", 1.0f),
      ("cast(aa as float8)", "CAST(aa AS DOUBLE)", 1.0),
      ("cast(aa as double precision)", "CAST(aa AS DOUBLE)", 1.0),
      ("cast(c as text)", "CAST(c AS VARCHAR)", "x"),
      ("cast(c as varchar)", "CAST(c AS VARCHAR)", "x"),
      ("cast(aa as decimal(10,2))", "CAST(aa AS DECIMAL(10,2))",
        new java.math.BigDecimal("1.00")),
      // bare numeric: DuckDB defaults to DECIMAL(18,3) — Spark's bare
      // NUMERIC is DECIMAL(10,0) and would silently differ without
      // the execution-side mapping
      ("cast(aa as numeric)", "CAST(aa AS DECIMAL(18,3))",
        new java.math.BigDecimal("1.000")))
    casts.foreach { case (expr, wantName, wantVal) =>
      val (names, vals) = run(
        s"SELECT min(COLUMNS(* EXCLUDE (ab, c) REPLACE ($expr AS aa))) " +
          "FROM wrc")
      assert(names == Seq(s"min(aa := $wantName)"), expr)
      assert(vals == Seq(wantVal), s"$expr -> ${vals.head} (${
        vals.head.getClass})")
    }
    // plain-statement execution of a DuckDB-only spelling (aliased —
    // only the VALUE is contracted here)
    val plain = DuckDialect.sql(spark,
      "SELECT CAST(aa AS int4) AS x, CAST(aa AS numeric) AS y FROM wrc")
      .collect().head
    assert(plain.getInt(0) == 1 &&
      plain.getDecimal(1) == new java.math.BigDecimal("1.000"))
    // semantic re-renders and chained comparisons keep refusing
    for (expr <- Seq("NOT aa > 1", "aa BETWEEN 1 AND 2", "aa < ab < 2"))
      intercept[Exception](DuckDialect.sql(spark,
        s"SELECT max(COLUMNS(* REPLACE ($expr AS aa))) FROM wrc")
        .collect())
  }

  test("COPY TO compressed extensions: .gz writes gzip-compressed " +
    "parts (DuckDB writes gzip bytes for .gz — pinned); .zst refuses " +
    "(no Spark text zstd codec); .gzip/.zstd write plain in BOTH " +
    "engines and pass through") {
    graft.functions.DuckCompat.register(spark)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete() }
    rmTree(new java.io.File("/tmp/graft_r15b_copy"))
    val c = DuckDialect.sql(spark,
      "COPY (SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'b') TO " +
        "'/tmp/graft_r15b_copy/out.csv.gz' (FORMAT CSV, HEADER)")
    assert(c.head.getLong(0) == 2)
    val parts = new java.io.File("/tmp/graft_r15b_copy/out.csv.gz")
      .listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".csv.gz")))
    // the parts carry REAL gzip bytes (magic 1f 8b), like DuckDB's file
    val magic = java.nio.file.Files.readAllBytes(
      parts.head.toPath).take(2).map(_ & 0xff)
    assert(magic.sameElements(Array(0x1f, 0x8b)))
    val back = spark.read.option("header", true)
      .csv("/tmp/graft_r15b_copy/out.csv.gz")
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq == Seq(("1", "a"), ("2", "b")))
    // .zst text output refuses — DuckDB writes zstd bytes there and
    // Spark's text writers cannot (CODEC_NOT_AVAILABLE); plain bytes
    // under a compressed name would be the silent alternative
    val e = intercept[Exception](DuckDialect.sql(spark,
      "COPY (SELECT 1 AS k) TO '/tmp/graft_r15b_copy/out.csv.zst' " +
        "(FORMAT CSV, HEADER)"))
    assert(e.getMessage.contains("zstd"), e.getMessage)
    // .gzip: BOTH engines write plain bytes under that name (pinned:
    // DuckDB compresses only .gz/.zst) — passes through uncompressed
    val c2 = DuckDialect.sql(spark,
      "COPY (SELECT 1 AS k) TO '/tmp/graft_r15b_copy/out.csv.gzip' " +
        "(FORMAT CSV, HEADER)")
    assert(c2.head.getLong(0) == 1)
    val parts2 = new java.io.File("/tmp/graft_r15b_copy/out.csv.gzip")
      .listFiles().filter(_.getName.startsWith("part-"))
    val head2 = java.nio.file.Files.readAllBytes(
      parts2.head.toPath).take(2).map(_ & 0xff)
    assert(!head2.sameElements(Array(0x1f, 0x8b))) // plain, not gzip
  }
}
