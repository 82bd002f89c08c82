package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Specs for the Tier A API surface: DeltaScanner semantics, SCD2 merge
  * invariants, graph MERGE idempotency, multimodal plumbing. */
class TierASpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tiera-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scanner = new DeltaScanner(spark, new TableResolver {
    override def resolve(s: SparkSession, ref: String) = Tables.load(s, sf, ref)
  })

  // ---- DeltaScanner (A2/A7/A8/A9/A10 truth tables) ----

  test("name classification matches the reference truth table") {
    val r = new PathResolver()
    assert(r.isCatalogName("cat.schema.table"))
    assert(!r.isCatalogName("abfss://c@a.dfs.core.windows.net/p"))
    assert(!r.isCatalogName("s3://bucket/path"))
    assert(!r.isCatalogName("/local/path"))
    assert(!r.isCatalogName("two.parts"))
    assert(!r.isCatalogName("a.b.c.d"))
  }

  test("$TABLE substitution is global (self-join resolves)") {
    val df = scanner.query("nation",
      Some("SELECT COUNT(*) AS n FROM $TABLE a JOIN $TABLE b ON a.n_nationkey = b.n_nationkey"))
    val nations = Tables.load(spark, sf, "nation").count()
    assert(df.head.getLong(0) == nations)
  }

  test("default limit applies only without SQL; ignored with SQL") {
    assert(scanner.query("lineitem").count() == 10)
    assert(scanner.query("lineitem", limit = 3).count() == 3)
    // limit ignored when SQL present (reference quirk)
    val n = scanner.query("lineitem",
      Some("SELECT * FROM $TABLE"), limit = 3).count()
    assert(n > 3)
  }

  // ---- A6 DuckDB-dialect shim (VERDICT r7 item 2) ----

  test("DuckDialect.rewrite: the text-level divergence table") {
    import graft.DuckDialect.rewrite
    // function renames fire at call sites only
    assert(rewrite("SELECT list_contains(list_value(1,2), 2)") ==
      "SELECT array_contains(array(1,2), 2)")
    assert(rewrite("SELECT quantile_cont(x, 0.5), arg_max(a, b) FROM t") ==
      "SELECT percentile(x, 0.5), max_by(a, b) FROM t")
    // NOT a call site: bare word and dot-qualified stay untouched
    assert(rewrite("SELECT strlen FROM t") == "SELECT strlen FROM t")
    assert(rewrite("SELECT s.list_value(1)") == "SELECT s.list_value(1)")
    // `//` floor division -> div; untouched inside literals and comments
    assert(rewrite("SELECT a // b").contains(" div "))
    assert(rewrite("SELECT 'a // b'") == "SELECT 'a // b'")
    assert(rewrite("-- list_value(\nSELECT 1") == "-- list_value(\nSELECT 1")
    assert(rewrite("/* list_value( */ SELECT 1") == "/* list_value( */ SELECT 1")
    // double-quoted identifiers (always identifiers in DuckDB) -> backticks
    assert(rewrite("SELECT \"col name\" FROM t") == "SELECT `col name` FROM t")
    // DuckDB literals are escape-free: backslashes double for Spark
    assert(rewrite("SELECT '\\s+'") == "SELECT '\\\\s+'")
    assert(rewrite("SELECT 'it''s \\n'") == "SELECT 'it''s \\\\n'")
    // read_parquet single-literal form -> Spark's parquet.`path` scan;
    // list/option forms stay untouched (they fail into guidance)
    assert(rewrite("SELECT * FROM read_parquet('/data/t.parquet') x") ==
      "SELECT * FROM parquet.`/data/t.parquet` x")
    // the file LIST form keeps its unknown function name → guidance
    // (the inner list literal itself now bridges to array())
    assert(rewrite("SELECT * FROM read_parquet(['a','b'])") ==
      "SELECT * FROM read_parquet(array('a', 'b'))")
    // arg-aware forms (bare renames would change semantics):
    // 1-arg string_agg gets DuckDB's ',' default separator injected
    assert(rewrite("SELECT string_agg(x)") == "SELECT listagg(x, ',')")
    assert(rewrite("SELECT string_agg(x, '-')") == "SELECT listagg(x, '-')")
    // list_distinct drops NULL elements in DuckDB — filter injected
    assert(rewrite("SELECT list_distinct(x)") ==
      "SELECT array_distinct(filter(x, _graft_e -> _graft_e IS NOT NULL))")
    // nested duckisms inside arg-aware calls still rewrite (recursion);
    // array_to_string gets the GUARDED arg-aware form, not an
    // array_join rename (r11: DuckDB's empty-list→NULL edge and
    // implicit element cast must hold on the pure-rewrite path too —
    // q151/q158 exercise rewrite() without the session natives)
    assert(rewrite("SELECT string_agg(array_to_string(list_value('a'), '-'))")
      == "SELECT listagg((CASE WHEN size(filter(array('a'), " +
        "_graft_a2s -> _graft_a2s IS NOT NULL)) = 0 THEN " +
        "CAST(NULL AS STRING) ELSE array_join(CAST(array('a') AS " +
        "ARRAY<STRING>), '-') END), ',')")
    // list_sort -> array_sort (NULLs LAST, matching DuckDB), not sort_array
    assert(rewrite("SELECT list_sort(x)") == "SELECT array_sort(x)")
    // list_unique (r11): DuckDB's COUNT of distinct non-NULL elements
    assert(rewrite("SELECT list_unique(x)") ==
      "SELECT CAST(size(array_distinct(filter(x, " +
        "_graft_e -> _graft_e IS NOT NULL))) AS BIGINT)")
    assert(graft.DuckDialect.sql(spark,
      "SELECT list_unique(list_value(1, 1, 2, NULL, NULL)) AS x")
      .head.getLong(0) == 2L) // DuckDB-verified
    // list_reverse (r11): safe rename — reverse covers arrays in both
    assert(rewrite("SELECT list_reverse(x)") == "SELECT reverse(x)")
    // r8 additions: try_element_at (NULL out of range like DuckDB, where
    // ANSI element_at throws), 1-arg array_length, string positioning
    assert(rewrite("SELECT list_extract(x, -1)") ==
      "SELECT try_element_at(x, -1)")
    assert(rewrite("SELECT array_length(x)") == "SELECT array_size(x)")
    // 2-arg (list, dim) array_length has no Spark twin: untouched
    assert(rewrite("SELECT array_length(x, 1)") == "SELECT array_length(x, 1)")
    assert(rewrite("SELECT strpos(s, 'll'), starts_with(s, 'a')") ==
      "SELECT instr(s, 'll'), startswith(s, 'a')")
    // * EXCLUDE (both forms) bridges to Spark's * EXCEPT; REPLACE doesn't
    assert(rewrite("SELECT * EXCLUDE city FROM t") ==
      "SELECT * EXCEPT (city) FROM t")
    assert(rewrite("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(rewrite("SELECT t.* EXCLUDE t.\"a b\" FROM t") ==
      "SELECT t.* EXCEPT (t.`a b`) FROM t")
    // NOT after a star: a column actually named exclude stays a column
    assert(rewrite("SELECT exclude FROM t") == "SELECT exclude FROM t")
    assert(graft.DuckDialect.unbridgeable("SELECT * REPLACE (a AS b) FROM t"))
    // strftime/strptime: literal C formats translate (letter runs get
    // JDK-quoted); unsupported codes (%U week-of-year) stay untouched
    assert(rewrite("SELECT strftime(ts, '%Y-%m-%dT%H:%M')") ==
      "SELECT date_format(ts, 'yyyy-MM-dd''T''HH:mm')")
    assert(rewrite("SELECT strftime('%-H h', ts)") == // either arg order
      "SELECT date_format(ts, 'H'' h''')")
    assert(rewrite("SELECT strptime(s, '%d/%m/%Y')") ==
      "SELECT to_timestamp(s, 'dd/MM/yyyy')")
    assert(rewrite("SELECT strftime(ts, '%U')") == "SELECT strftime(ts, '%U')")
    // %U no longer routes to guidance: the registered DuckStrftime
    // resolves it and raises AT EVAL with the JDK-pattern hint (probed
    // in the DuckCompat test below) — still loud, never silent garbage
    // list_slice: literal bounds of one sign become slice()'s length form
    assert(rewrite("SELECT list_slice(x, 2, 4)") == "SELECT slice(x, 2, 3)")
    // both-negative bounds clamp the start at runtime (ADVICE r8: DuckDB
    // clamps a start past the list head; a bare slice(x,-5,5) would
    // return [] where DuckDB returns the whole list)
    assert(rewrite("SELECT list_slice(x, -2, -1)") ==
      "SELECT slice(x, least(greatest(-2, -size(x)), -1), " +
        "greatest(-1 - least(greatest(-2, -size(x)), -1) + 1, 0))")
    assert(rewrite("SELECT list_slice(x, 4, 2)") == "SELECT slice(x, 4, 0)")
    assert(rewrite("SELECT list_slice(x, 2, -1)") == // mixed signs: no twin
      "SELECT list_slice(x, 2, -1)")
    assert(rewrite("SELECT list_slice(x, i, j)") == "SELECT list_slice(x, i, j)")
    // struct_pack's := pairs become named_struct; nested duckisms rewrite
    assert(rewrite("SELECT struct_pack(a := 1, b := list_value(2))") ==
      "SELECT named_struct('a', 1, 'b', array(2))")
    assert(rewrite("SELECT struct_pack(x)") == "SELECT struct_pack(x)")
    // epoch keeps DuckDB's fractional seconds via unix_micros
    assert(rewrite("SELECT epoch(ts)") ==
      "SELECT (unix_micros(ts) / 1e6)")
    // list_prepend: DuckDB's (elem, list) args swap into array_prepend
    assert(rewrite("SELECT list_prepend(0, list_value(1,2))") ==
      "SELECT array_prepend(array(1,2), 0)")
    // regexp_full_match: literal patterns wrap into anchored regexp_like
    assert(rewrite("SELECT regexp_full_match(s, '[0-9]+')") ==
      "SELECT regexp_like(s, '\\\\A(?:[0-9]+)\\\\z')")
    assert(rewrite("SELECT regexp_full_match(s, p)") == // non-literal
      "SELECT regexp_full_match(s, p)")
    assert(rewrite("SELECT epoch_us(ts)") == "SELECT unix_micros(ts)")
    // string_split: literal separators regex-escape into split()
    assert(rewrite("SELECT string_split(s, '.')") ==
      "SELECT split(s, '\\\\.')") // the regex \. as a Spark literal
    assert(rewrite("SELECT string_to_array(s, ',')") ==
      "SELECT split(s, '\\\\,')")
    assert(rewrite("SELECT string_split(s, 'xx')") ==
      "SELECT split(s, 'xx')")
    // empty separator bridges too (r12): Spark's split(s, '') is the
    // identical per-char form (verified on both engines — unicode
    // chars, [''] on '', NULL propagation)
    assert(rewrite("SELECT string_split(s, '')") ==
      "SELECT split(s, '')")
    assert(rewrite("SELECT string_split(s, sep)") == // expression sep
      "SELECT string_split(s, sep)")
    // quantile_disc/quantile → the ANSI WITHIN GROUP form (same values;
    // the type widens to DOUBLE — documented in guidance)
    assert(rewrite("SELECT quantile_disc(x, 0.25) FROM t") ==
      "SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY x) FROM t")
    assert(rewrite("SELECT quantile(x) FROM t") ==
      "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY x) FROM t")
    // len/list_sum left the guidance table in r9 — they are REGISTERED
    // FUNCTIONS now (DuckCompat), so unbridgeable() must not flag them
    // (it would mask the working path with a guidance error)
    assert(!graft.DuckDialect.unbridgeable("SELECT len(x) FROM t"))
    assert(!graft.DuckDialect.unbridgeable("SELECT list_sum(x) FROM t"))
    assert(!graft.DuckDialect.unbridgeable("SELECT datediff(a, b) FROM t"))
    // date_diff('part'…) TEXT-bridges for mapped parts (so unbridgeable
    // is never consulted — the rewrite changed the text); the quoted-part
    // clause stays in the regex as the guidance guard for UNMAPPED parts
    // (century/decade/…), where the text passes through unchanged
    assert(rewrite("SELECT date_diff('month', a, b)") ==
      "SELECT timestampdiff(MONTH, date_trunc('MONTH', a), " +
        "date_trunc('MONTH', b))")
    assert(rewrite("SELECT date_diff('days', a, b)") == // plural spelling
      "SELECT timestampdiff(DAY, date_trunc('DAY', a), " +
        "date_trunc('DAY', b))")
    assert(rewrite("SELECT date_diff('century', a, b)") ==
      "SELECT date_diff('century', a, b)") // unmapped part → guidance
    assert(graft.DuckDialect.unbridgeable(
      "SELECT date_diff('century', a, b) FROM t"))
    // date_sub left the unbridgeable list in r10 — it is a registered
    // clamped-interval expression now; struct_pack still routes there
    assert(!graft.DuckDialect.unbridgeable(
      "SELECT date_sub('month', a, b) FROM t"))
    // r9: bracket constructs. List literals → array(); comprehensions
    // → transform/filter; struct literals (quoted OR bare keys) →
    // named_struct. Subscripts (a '[' glued to an identifier/)/]/
    // literal) and the INT[] type suffix pass through untouched.
    assert(rewrite("SELECT [1, 2, 3]") == "SELECT array(1, 2, 3)")
    assert(rewrite("SELECT []") == "SELECT array()")
    assert(rewrite("SELECT [x*2 FOR x IN [1,2,3]]") ==
      "SELECT transform(array(1, 2, 3), x -> x*2)")
    assert(rewrite("SELECT [x FOR x IN l IF x > 1]") ==
      "SELECT transform(filter(l, x -> x > 1), x -> x)")
    assert(rewrite("SELECT [[y*x FOR y IN [1,2]] FOR x IN [1,2]]") ==
      "SELECT transform(array(1, 2), x -> transform(array(1, 2), y -> y*x))")
    // keywords case-insensitive; 'for' inside a literal is not a keyword
    assert(rewrite("SELECT [x+1 for x in l]") == "SELECT transform(l, x -> x+1)")
    assert(rewrite("SELECT ['for' FOR x IN [1]]") ==
      "SELECT transform(array(1), x -> 'for')")
    // malformed comprehensions (non-identifier var, missing IN) stay
    // untouched → Spark fails → guidance, never silently misparsed
    assert(rewrite("SELECT [x FOR x.y IN l]") == "SELECT [x FOR x.y IN l]")
    assert(rewrite("SELECT [x FOR x]") == "SELECT [x FOR x]")
    assert(rewrite("SELECT {'a': 1, 'b': 'x'}") ==
      "SELECT named_struct('a', 1, 'b', 'x')")
    assert(rewrite("SELECT {a: 1+1}") == "SELECT named_struct('a', 1+1)")
    assert(rewrite("SELECT {'a b': [1]}") ==
      "SELECT named_struct('a b', array(1))")
    // NOT struct entries: empty braces / a `::` cast right after the key
    assert(rewrite("SELECT {}") == "SELECT {}")
    assert(rewrite("SELECT l[1] + f(x)[2] FROM t") ==
      "SELECT l[1] + f(x)[2] FROM t") // subscripts untouched (0-based in
    // Spark vs DuckDB's 1-based — documented in guidance; list_extract
    // is the bridged 1-based spelling)
    assert(rewrite("SELECT CAST(NULL AS INT[])") ==
      "SELECT CAST(NULL AS INT[])") // type suffix untouched
  }

  test("DuckDialect statement bridges: QUALIFY, DISTINCT ON, unnest, " +
    "generate_series (r9)") {
    import graft.DuckDialect.rewrite
    // QUALIFY → wrapped post-window filter; pred computes in the inner
    // select list, * EXCEPT drops the helper, ORDER/LIMIT stay outside
    assert(rewrite("SELECT x, row_number() OVER (ORDER BY x) rn FROM t QUALIFY rn = 1") ==
      "SELECT * EXCEPT (__graft_qualify) FROM (SELECT x, row_number() OVER (ORDER BY x) rn, " +
        "(rn = 1) AS __graft_qualify FROM t) WHERE __graft_qualify")
    // an ORDER BY expression becomes a HIDDEN inner column — outer
    // ORDER BY may reference base columns the projection drops (DuckDB
    // resolves those against the base relation; a plain wrap would not)
    assert(rewrite("SELECT x FROM t QUALIFY row_number() OVER (ORDER BY x) <= 2 ORDER BY x DESC LIMIT 1") ==
      "SELECT * EXCEPT (__graft_qualify, __graft_q_ob0) FROM (SELECT x, " +
        "(row_number() OVER (ORDER BY x) <= 2) AS __graft_qualify, " +
        "x AS __graft_q_ob0 FROM t) " +
        "WHERE __graft_qualify ORDER BY __graft_q_ob0 DESC LIMIT 1")
    // WITH prefix passes through; the duckisms inside still rewrite
    assert(rewrite("WITH c AS (SELECT 1 a) SELECT a FROM c QUALIFY len(list_value(a)) = 1") ==
      "WITH c AS (SELECT 1 a) SELECT * EXCEPT (__graft_qualify) FROM (SELECT a, " +
        "(len(array(a)) = 1) AS __graft_qualify FROM c) WHERE __graft_qualify")
    // refusals → untouched → Spark error → guidance: set ops, DISTINCT
    assert(rewrite("SELECT x FROM a QUALIFY rn = 1 UNION SELECT x FROM b")
      .contains("QUALIFY"))
    assert(rewrite("SELECT DISTINCT x FROM t QUALIFY rn = 1")
      .contains("QUALIFY"))
    // a commented-out `qualify` is NOT a clause — no bridge triggers
    assert(rewrite("SELECT x FROM t -- qualify rn = 1") ==
      "SELECT x FROM t -- qualify rn = 1")
    assert(rewrite("SELECT x /* qualify */ FROM t") ==
      "SELECT x /* qualify */ FROM t")
    // DISTINCT ON → row_number per key; ORDER BY drives the pick and is
    // kept outside; without ORDER BY the keys order the window
    assert(rewrite("SELECT DISTINCT ON (x) x, y FROM t ORDER BY y") ==
      "SELECT * EXCEPT (__graft_rn, __graft_d_ob0) FROM (SELECT x, y, " +
        "row_number() OVER (PARTITION BY x ORDER BY y) AS __graft_rn, " +
        "y AS __graft_d_ob0 FROM t) " +
        "WHERE __graft_rn = 1 ORDER BY __graft_d_ob0")
    assert(rewrite("SELECT DISTINCT ON (k1, k2) v FROM t") ==
      "SELECT * EXCEPT (__graft_rn) FROM (SELECT v, row_number() OVER " +
        "(PARTITION BY k1, k2 ORDER BY k1, k2) AS __graft_rn FROM t) " +
        "WHERE __graft_rn = 1")
    // refusals: positional / ALL order items would become constants
    assert(rewrite("SELECT DISTINCT ON (x) x, y FROM t ORDER BY 2")
      .contains("DISTINCT ON"))
    assert(rewrite("SELECT DISTINCT ON (x) x, y FROM t ORDER BY ALL")
      .contains("DISTINCT ON"))
    // plain DISTINCT is valid Spark — untouched
    assert(rewrite("SELECT DISTINCT x FROM t") == "SELECT DISTINCT x FROM t")
    // unnest → explode (select list and FROM); generate_series →
    // sequence, explode(sequence(…)) after FROM/JOIN, 1-arg = 0..stop
    assert(rewrite("SELECT unnest(l) FROM t") == "SELECT explode(l) FROM t")
    assert(rewrite("SELECT * FROM unnest([10, 20]) t(u)") ==
      "SELECT * FROM explode(array(10, 20)) t(u)")
    assert(rewrite("SELECT generate_series(1, 7, 3)") ==
      "SELECT sequence(1, 7, 3)")
    assert(rewrite("SELECT generate_series(3)") == "SELECT sequence(0, 3)")
    assert(rewrite("SELECT * FROM generate_series(1, 3) t(i)") ==
      "SELECT * FROM explode(sequence(1, 3)) t(i)")
    // comma-lateral series (r12): FROM-clause commas whose right item is
    // a series call become LATERAL VIEW explode(sequence(…)); DuckDB's
    // default column name is `generate_series` (bare and bare-alias
    // forms), `AS g(i)` maps to g AS i, the 1-arg TVF is 0..stop
    assert(rewrite("SELECT * FROM t, generate_series(1, 3)") ==
      "SELECT * FROM t LATERAL VIEW explode(sequence(1, 3)) " +
        "generate_series AS generate_series")
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) g") ==
      "SELECT * FROM t LATERAL VIEW explode(sequence(1, 3)) " +
        "g AS generate_series")
    assert(rewrite("SELECT * FROM t, generate_series(2) AS g(i) WHERE i > 0") ==
      "SELECT * FROM t LATERAL VIEW explode(sequence(0, 2)) g AS i " +
        "WHERE i > 0")
    // correlated spelling: unnest(generate_series(expr)) — the inner
    // series rewrites scalar (DuckDB 1.0 refuses lateral column params
    // on the bare TVF, so this IS the correlated form in the wild)
    assert(rewrite("SELECT k, j FROM t, unnest(generate_series(1, t.n)) AS u(j)") ==
      "SELECT k, j FROM t LATERAL VIEW explode(sequence(1, t.n)) u AS j")
    // chained series items bridge in turn
    assert(rewrite("SELECT * FROM t, generate_series(1, 2) AS a(i), " +
      "unnest(generate_series(1, t.n)) AS b(j) WHERE i = j") ==
      "SELECT * FROM t LATERAL VIEW explode(sequence(1, 2)) a AS i " +
        "LATERAL VIEW explode(sequence(1, t.n)) b AS j WHERE i = j")
    // mid-list series (r12, second session): DEFERRED to the
    // FROM-clause end — comma items commute, series order preserved
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) g(i), u").trim ==
      "SELECT * FROM t, u LATERAL VIEW explode(sequence(1, 3)) g AS i")
    assert(rewrite("SELECT * FROM t, generate_series(2) AS g(i), u WHERE i > 0")
      .replaceAll("\\s+", " ") ==
      "SELECT * FROM t, u LATERAL VIEW explode(sequence(0, 2)) g AS i " +
        "WHERE i > 0")
    // mixed mid + trailing: the deferred item flushes FIRST, so the
    // trailing item's correlation on it stays bound
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) AS g(i), u, " +
      "unnest(generate_series(1, i)) AS w(j)").replaceAll("\\s+", " ").trim ==
      "SELECT * FROM t, u LATERAL VIEW explode(sequence(1, 3)) g AS i " +
        "LATERAL VIEW explode(sequence(1, i)) w AS j")
    assert(rewrite("SELECT * FROM (SELECT 1 AS k FROM u, " +
      "generate_series(1, 2) g(i), v) s WHERE k > 0")
      .replaceAll("\\s+", " ") ==
      "SELECT * FROM (SELECT 1 AS k FROM u, v LATERAL VIEW " +
        "explode(sequence(1, 2)) g AS i ) s WHERE k > 0")
    // a series CHAIN followed by a plain table defers the WHOLE chain
    // (ADVICE r12: in-place vs deferred is decided by the chain's LAST
    // item — the old per-item check emitted the first LATERAL VIEW in
    // place, leaving an unparseable `, u` after it), order preserved
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) g(i), " +
      "generate_series(1, 4) h(j), u").replaceAll("\\s+", " ").trim ==
      "SELECT * FROM t, u LATERAL VIEW explode(sequence(1, 3)) g AS i " +
        "LATERAL VIEW explode(sequence(1, 4)) h AS j")
    // unaliased comma-unnest of a PLAIN COLUMN (r13, VERDICT r12 item
    // 8): DuckDB names the column after the argument's leaf, qualified
    // by the table alias (default `unnest`) — verified: `FROM t,
    // unnest(tags) [u]` → column `tags`, refs `unnest.tags` / `u.tags`
    assert(rewrite("SELECT id, unnest.tags FROM t, unnest(tags)") ==
      "SELECT id, unnest.tags FROM t LATERAL VIEW explode(tags) " +
        "unnest AS tags")
    assert(rewrite("SELECT id, u.tags FROM t, unnest(tags) u") ==
      "SELECT id, u.tags FROM t LATERAL VIEW explode(tags) u AS tags")
    assert(rewrite("SELECT id, unnest.tags FROM t, unnest(t.tags)") ==
      "SELECT id, unnest.tags FROM t LATERAL VIEW explode(t.tags) " +
        "unnest AS tags")
    // NOT bridged (pass through → Spark error → guidance): select-list
    // commas, a JOIN after the series (DuckDB can bind the series as
    // the join's LEFT operand — moving it past an outer join would
    // change the null-extension side), and multi-column aliases
    assert(rewrite("SELECT a, generate_series(1, 3) FROM t") ==
      "SELECT a, sequence(1, 3) FROM t")
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) JOIN u ON x = y")
      .contains(", sequence(1, 3) JOIN"))
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) g(i), u " +
      "LEFT JOIN v ON a = b").contains(", sequence(1, 3) g(i), u"))
    // r14: the unaliased comma-unnest of a renderable EXPRESSION bridges
    // with DuckDB's rendered-expression column name (duckdb-verified:
    // `unnest(generate_series(1, t.n))` → column `generate_series(1,
    // t.n)`); non-mechanical spellings still pass through to guidance
    assert(rewrite("SELECT * FROM t, unnest(generate_series(1, t.n))") ==
      "SELECT * FROM t LATERAL VIEW explode(sequence(1, t.n)) unnest " +
        "AS `generate_series(1, t.n)`")
    assert(rewrite("SELECT * FROM t, generate_series(1, 3) AS g(i, j)")
      .contains(", sequence(1, 3) AS g(i, j)"))
    // a FROM inside a subquery gets its own depth-scoped bridge
    assert(rewrite("SELECT * FROM (SELECT 1 AS k FROM u, generate_series(1, 2) g(i)) s") ==
      "SELECT * FROM (SELECT 1 AS k FROM u LATERAL VIEW " +
        "explode(sequence(1, 2)) g AS i) s")
    // engine-level: the bridged statements return DuckDB's answers
    // (expected values verified against the installed DuckDB)
    def rows(duck: String): Seq[Seq[Any]] =
      graft.DuckDialect.sql(spark, duck).collect()
        .map(r => (0 until r.length).map(r.get)).toSeq
    assert(rows("SELECT x, count(*) c FROM (VALUES (1),(1),(2)) t(x) GROUP BY x " +
      "QUALIFY rank() OVER (ORDER BY count(*) DESC) = 1") == Seq(Seq(1, 2L)))
    assert(rows("SELECT x FROM (VALUES (3),(1),(2)) t(x) " +
      "QUALIFY row_number() OVER (ORDER BY x) <= 2 ORDER BY x DESC LIMIT 1") ==
      Seq(Seq(2)))
    assert(rows("SELECT DISTINCT ON (x) x, y FROM (VALUES (1,5),(1,3),(2,7),(2,9)) " +
      "t(x,y) ORDER BY y") == Seq(Seq(1, 3), Seq(2, 7)))
    assert(rows("SELECT DISTINCT ON (x) x, y FROM (VALUES (1,5),(1,3),(2,7),(2,9)) " +
      "t(x,y) ORDER BY y DESC") == Seq(Seq(2, 9), Seq(1, 5)))
    // the outer ORDER BY may reference a column the projection DROPS —
    // DuckDB resolves it against the base relation (verified: picks the
    // max-y row per x and orders the output by that hidden y)
    assert(rows("SELECT DISTINCT ON (x) x FROM (VALUES (1,5),(1,3),(2,7),(2,9)) " +
      "t(x,y) ORDER BY y DESC, x") == Seq(Seq(2), Seq(1)))
    assert(rows("SELECT x FROM (VALUES (1,5),(2,3)) t(x,y) " +
      "QUALIFY row_number() OVER (ORDER BY y) <= 2 ORDER BY y DESC") ==
      Seq(Seq(1), Seq(2)))
    assert(rows("SELECT x, unnest([1,2]) u FROM (VALUES (9)) t(x)") ==
      Seq(Seq(9, 1), Seq(9, 2)))
    assert(rows("SELECT i FROM generate_series(1, 3) t(i)") ==
      Seq(Seq(1), Seq(2), Seq(3)))
    // engine-level unaliased comma-unnest (both reference spellings) —
    // expected rows verified against the installed DuckDB
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cu_t AS " +
      "SELECT 1 AS id, array(10, 20) AS tags UNION ALL " +
      "SELECT 2, array(30)")
    assert(rows("SELECT id, unnest.tags AS v FROM cu_t, unnest(tags) " +
      "ORDER BY id, v") == Seq(Seq(1, 10), Seq(1, 20), Seq(2, 30)))
    assert(rows("SELECT id, u.tags AS v FROM cu_t, unnest(tags) u " +
      "ORDER BY id, v") == Seq(Seq(1, 10), Seq(1, 20), Seq(2, 30)))
    assert(rows("SELECT generate_series(3)").head.head
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(0, 1, 2, 3))
    assert(rows("SELECT * FROM range(2, 5)") == Seq(Seq(2L), Seq(3L), Seq(4L)))
    // comma-lateral series end-to-end (r12): constant TVF, correlated
    // unnest spelling, and the chained form — expected rows are the
    // installed DuckDB 1.0's own answers
    assert(rows("SELECT x, generate_series FROM (VALUES (9)) t(x), " +
      "generate_series(1, 2)") == Seq(Seq(9, 1), Seq(9, 2)))
    assert(rows("SELECT x, j FROM (VALUES (2), (3)) t(x), " +
      "unnest(generate_series(1, x)) AS u(j) WHERE j >= x - 1 " +
      "ORDER BY x, j") ==
      Seq(Seq(2, 1), Seq(2, 2), Seq(3, 2), Seq(3, 3)))
    assert(rows("SELECT x, i, j FROM (VALUES (1)) t(x), " +
      "generate_series(4, 5) AS a(i), unnest(generate_series(1, x)) AS b(j)") ==
      Seq(Seq(1, 4, 1), Seq(1, 5, 1)))
    // list_slice as a REGISTERED function (arbitrary/mixed-sign/
    // expression bounds — the text bridge reaches only one-sign
    // literals). Every expected value is the installed DuckDB's.
    def sl(duck: String): Seq[Integer] =
      rows(duck).head.head match {
        case null => null
        case s => s.asInstanceOf[scala.collection.Seq[Integer]].toSeq
      }
    assert(sl("SELECT list_slice([1,2,3,4,5], 2, 4)") == Seq(2, 3, 4))
    assert(sl("SELECT list_slice([1,2,3,4,5], 2, -1)") == Seq(2, 3, 4, 5))
    assert(sl("SELECT list_slice([1,2,3,4,5], -3, -2)") == Seq(3, 4))
    assert(sl("SELECT list_slice([1,2,3,4,5], -10, 2)") == Seq(1, 2))
    assert(sl("SELECT list_slice([1,2,3,4,5], 0, 3)") == Seq(1, 2, 3))
    assert(sl("SELECT list_slice([1,2,3,4,5], 4, 2)") == Seq())
    assert(sl("SELECT list_slice([1,2,3,4,5], 3, 99)") == Seq(3, 4, 5))
    assert(sl("SELECT list_slice([1,2,3,4,5], -1, -5)") == Seq())
    assert(sl("SELECT list_slice([1,2,3,4,5], 6, 8)") == Seq())
    assert(sl("SELECT list_slice([1,2,3,4,5], -10, -7)") == Seq())
    assert(sl("SELECT array_slice([1,2], 1, 2)") == Seq(1, 2))
    // NULL list/bounds propagate (CaseWhen-else, not Greatest — a
    // fabricated bound was the failure mode this form avoids)
    assert(sl("SELECT list_slice([1,2,3,4,5], CAST(NULL AS INT), 3)") == null)
    assert(sl("SELECT list_slice([1,2,3,4,5], 1, CAST(NULL AS INT))") == null)
    assert(sl("SELECT list_slice(CAST(NULL AS ARRAY<INT>), 1, 2)") == null)
    // expression bounds — the case the literal-only text bridge refused
    assert(rows("SELECT list_slice(l, s, -1) FROM (VALUES (array(1,2,3), 2)) " +
      "t(l, s)").head.head
      .asInstanceOf[scala.collection.Seq[Integer]].toSeq == Seq(2, 3))
    // USING SAMPLE: percent forms bridge to TABLESAMPLE; the rows form
    // and join-USING stay untouched (rows would silently change from a
    // random reservoir to a plain limit)
    import graft.DuckDialect.rewrite
    assert(rewrite("SELECT * FROM t USING SAMPLE 10%") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    assert(rewrite("SELECT * FROM t USING SAMPLE 2.5 PERCENT") ==
      "SELECT * FROM t TABLESAMPLE (2.5 PERCENT)")
    // the ROWS form bridges since r10: a true uniform random-n via
    // ORDER BY rand() LIMIT n (TakeOrdered), never a plain limit
    assert(rewrite("SELECT * FROM t USING SAMPLE 10") ==
      "SELECT * FROM (SELECT * FROM t ORDER BY rand() LIMIT 10) t ")
    assert(rewrite("SELECT * FROM a JOIN b USING (k)") ==
      "SELECT * FROM a JOIN b USING (k)")
    // and it executes (TABLESAMPLE attaches to named relations, not
    // VALUES aliases): sampling 100 percent keeps every row
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW smp_t AS " +
      "SELECT * FROM VALUES (1),(2),(3) t(x)")
    assert(rows("SELECT count(*) c FROM (SELECT * FROM smp_t " +
      "USING SAMPLE 100%)") == Seq(Seq(3L)))
  }

  test("DuckDialect statement bridges: the PIVOT and UNPIVOT statements " +
    "(dynamic column discovery / INTO NAME-VALUE) — every expected " +
    "answer is the installed DuckDB's") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW pv_tnull AS SELECT * FROM " +
      "VALUES ('a', CAST(NULL AS STRING), 1),('a','x',2),('b','y',3) t(g, p, v)")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW pv_tint AS SELECT * FROM " +
      "VALUES ('a', 1, 10),('a',2,20),('b',1,30) t(g, p, v)")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW up_w AS SELECT * FROM " +
      "VALUES ('a', 1, 2, CAST(NULL AS INT)),('b',3,CAST(NULL AS INT),5) " +
      "t(g, c1, c2, c3)")
    def run(duck: String): (Seq[String], Seq[Seq[Any]]) = {
      val df = graft.DuckDialect.sql(spark, duck)
      (df.columns.toSeq,
        df.collect().map(r => (0 until r.length).map(r.get)).toSeq)
    }
    // dynamic discovery: columns = sorted distinct non-null values;
    // count(*) default fills absent combos with 0 (NULL p row dropped)
    assert(run("PIVOT pv_tnull ON p GROUP BY g ORDER BY g") ==
      (Seq("g", "x", "y"), Seq(Seq("a", 1L, 0L), Seq("b", 0L, 1L))))
    // real aggregate: absent combos are NULL; alias → value_alias names
    assert(run("PIVOT pv_tnull ON p USING sum(v) AS total GROUP BY g ORDER BY g") ==
      (Seq("g", "x_total", "y_total"), Seq(Seq("a", 2L, null), Seq("b", null, 3L))))
    // explicit IN list skips discovery and keeps the listed columns
    assert(run("PIVOT pv_tnull ON p IN ('x') USING sum(v) GROUP BY g ORDER BY g") ==
      (Seq("g", "x"), Seq(Seq("a", 2L), Seq("b", null))))
    // non-string pivot values name their columns str(value)
    assert(run("PIVOT pv_tint ON p USING sum(v) GROUP BY g ORDER BY g") ==
      (Seq("g", "1", "2"), Seq(Seq("a", 10L, 20L), Seq("b", 30L, null))))
    // omitted GROUP BY: DuckDB groups by every column the ON col and the
    // aggregate don't use (here: g — v is consumed by sum)
    assert(run("PIVOT pv_tnull ON p USING sum(v) ORDER BY g") ==
      (Seq("g", "x", "y"), Seq(Seq("a", 2L, null), Seq("b", null, 3L))))
    // aliased multi-agg: DuckDB's value_alias columns, value-major
    assert(run("PIVOT pv_tnull ON p USING sum(v) AS s, count(*) AS c " +
      "GROUP BY g ORDER BY g") ==
      (Seq("g", "x_s", "x_c", "y_s", "y_c"),
        Seq(Seq("a", 2L, 1L, null, 0L), Seq("b", null, 0L, 3L, 1L))))
    // multi-ON: DuckDB's CROSS-PRODUCT columns v1_v2 (even combos that
    // never co-occur), NULL ON-values drop the row — all verified
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW pv_multi AS SELECT * FROM " +
      "VALUES ('a','x','p',1),('a','y','q',2),('b','x','q',3)," +
      "('b',CAST(NULL AS STRING),'p',4) t(g, k1, k2, v)")
    assert(run("PIVOT pv_multi ON k1, k2 USING sum(v) GROUP BY g ORDER BY g") ==
      (Seq("g", "x_p", "x_q", "y_p", "y_q"),
        Seq(Seq("a", 1L, null, null, 2L), Seq("b", null, 3L, null, null))))
    assert(run("PIVOT pv_multi ON k1, k2 GROUP BY g ORDER BY g") ==
      (Seq("g", "x_p", "x_q", "y_p", "y_q"),
        Seq(Seq("a", 1L, 0L, 0L, 1L), Seq("b", 0L, 1L, 0L, 0L))))
    // UNALIASED multi-agg (r12): simple fn(ident)/count(*) aggregates
    // bridge with DuckDB's value_fn(ident)/value_count_star() names
    assert(run("PIVOT pv_tnull ON p USING sum(v), count(*) GROUP BY g ORDER BY g") ==
      (Seq("g", "x_sum(v)", "x_count_star()", "y_sum(v)", "y_count_star()"),
        Seq(Seq("a", 2L, 1L, null, 0L), Seq("b", null, 0L, 3L, 1L))))
    // refusals → guidance, never a silent subset: unaliased multi-agg
    // with an EXPRESSION argument (DuckDB's name there is an internal
    // expression rendering this bridge refuses to guess)
    for (bad <- Seq("PIVOT pv_tnull ON p USING sum(v + 1), count(*) GROUP BY g")) {
      val e = intercept[IllegalArgumentException](
        graft.DuckDialect.sql(spark, bad))
      assert(e.getMessage.contains("PIVOT statement outside"))
    }
    // UNPIVOT ON aliases (r12): AS 'label' renames the NAME entry
    // (expected rows are DuckDB's: NULL values excluded, c3 kept)
    assert(run("UNPIVOT up_w ON c1 AS 'one', c2 INTO NAME k VALUE v ORDER BY g, k") ==
      (Seq("g", "c3", "k", "v"),
        Seq(Seq("a", null, "c2", 2), Seq("a", null, "one", 1),
          Seq("b", 5, "one", 3))))
    // UNPIVOT multi-VALUE (r12): grouped items, unaliased group names
    // c1_c2, and DuckDB's ANY-null row drop — ('a', 3, 30, NULL, 7)'s
    // (z, w) = (NULL, 7) group is dropped even though w is present
    // (Spark's EXCLUDE NULLS alone would keep it; the bridge filters)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW up_m AS SELECT * FROM " +
      "VALUES ('a', 1, 10, 100, 5), ('b', 2, 20, 200, 6), " +
      "('a', 3, 30, CAST(NULL AS INT), 7) t(g, x, y, z, w)")
    assert(run("UNPIVOT up_m ON (x, y) AS 'xy', (z, w) INTO NAME k " +
      "VALUE v1, v2 ORDER BY g, k, v1") ==
      (Seq("g", "k", "v1", "v2"),
        Seq(Seq("a", "xy", 1, 10), Seq("a", "xy", 3, 30),
          Seq("a", "z_w", 100, 5), Seq("b", "xy", 2, 20),
          Seq("b", "z_w", 200, 6))))
    // COLUMNS star expressions expand from the live schema — DuckDB's
    // find-anywhere regex matching ('a' also matches 'ba', verified),
    // wrapped forms replicate per column and NAME BY the source column
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cols_t AS " +
      "SELECT 1 AS aa, 2 AS ab, 3 AS ba")
    assert(run("SELECT COLUMNS('a.*') FROM cols_t") ==
      (Seq("aa", "ab", "ba"), Seq(Seq(1, 2, 3))))
    assert(run("SELECT COLUMNS('a') FROM cols_t") ==
      (Seq("aa", "ab", "ba"), Seq(Seq(1, 2, 3))))
    assert(run("SELECT COLUMNS('b') FROM cols_t") ==
      (Seq("ab", "ba"), Seq(Seq(2, 3))))
    assert(run("SELECT COLUMNS(*) FROM cols_t") ==
      (Seq("aa", "ab", "ba"), Seq(Seq(1, 2, 3))))
    assert(run("SELECT max(COLUMNS('a.*')) FROM cols_t") ==
      (Seq("aa", "ab", "ba"), Seq(Seq(1, 2, 3))))
    // other duckisms in the same statement still bridge after expansion
    assert(run("SELECT len(list_value(COLUMNS('^a'))) FROM cols_t") ==
      (Seq("aa", "ab"), Seq(Seq(1L, 1L))))
    // unnest(struct_col) (r12): expands the fields IN PLACE — DuckDB's
    // verified shape (SELECT k, unnest(s) → k, a, b); the LIST form in
    // the same session keeps exploding (q165's path)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW su_t AS " +
      "SELECT 1 AS k, named_struct('a', 10, 'b', 'x') AS s " +
      "UNION ALL SELECT 2, named_struct('a', 20, 'b', 'y')")
    assert(run("SELECT unnest(s) FROM su_t ORDER BY a") ==
      (Seq("a", "b"), Seq(Seq(10, "x"), Seq(20, "y"))))
    assert(run("SELECT k, unnest(s) FROM su_t ORDER BY k") ==
      (Seq("k", "a", "b"), Seq(Seq(1, 10, "x"), Seq(2, 20, "y"))))
    // unnest(s, recursive := true) (r12): nested structs expand
    // depth-first by LEAF name, collisions suffix _N — both shapes
    // DuckDB-verified ({'x', 'n':{'a','b'}} → x, a, b; {'a', 'n':{'a'}}
    // → a, a_1); recursive := false is the one-level form
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW sur_t AS " +
      "SELECT 1 AS k, named_struct('x', 10, 'n', " +
      "named_struct('a', 1, 'b', 'p')) AS s " +
      "UNION ALL SELECT 2, named_struct('x', 20, 'n', " +
      "named_struct('a', 2, 'b', 'q'))")
    assert(run("SELECT k, unnest(s, recursive := true) FROM sur_t ORDER BY k") ==
      (Seq("k", "x", "a", "b"),
        Seq(Seq(1, 10, 1, "p"), Seq(2, 20, 2, "q"))))
    assert(run("SELECT k, unnest(s, recursive := false) FROM sur_t ORDER BY k") ==
      (Seq("k", "x", "n"),
        Seq(Seq(1, 10, org.apache.spark.sql.Row(1, "p")),
          Seq(2, 20, org.apache.spark.sql.Row(2, "q")))))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW suc_t AS " +
      "SELECT named_struct('a', 1, 'n', named_struct('a', 9)) AS s")
    assert(run("SELECT unnest(s, recursive := true) FROM suc_t") ==
      (Seq("a", "a_1"), Seq(Seq(1, 9))))
    // aliased LIST-recursive unnest: full flatten + explode (DuckDB
    // verified incl. triple nesting); struct-bearing lists refuse —
    // DuckDB names those by FIELD, ignoring the alias
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW lur_t AS " +
      "SELECT 1 AS k, array(array(1, 2), array(3)) AS l " +
      "UNION ALL SELECT 2, array(array(4))")
    assert(run("SELECT k, unnest(l, recursive := true) AS v FROM lur_t " +
      "ORDER BY k, v") ==
      (Seq("k", "v"), Seq(Seq(1, 1), Seq(1, 2), Seq(1, 3), Seq(2, 4))))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW lur3_t AS " +
      "SELECT array(array(array(1, 2), array(3)), array(array(4))) AS l")
    assert(run("SELECT unnest(l, recursive := true) AS v FROM lur3_t " +
      "ORDER BY v") ==
      (Seq("v"), Seq(Seq(1), Seq(2), Seq(3), Seq(4))))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW lus_t AS " +
      "SELECT array(named_struct('a', 1)) AS l")
    intercept[Exception](
      run("SELECT unnest(l, recursive := true) AS v FROM lus_t"))
    // an alias on the STRUCT forms is accepted and DISCARDED — DuckDB
    // ignores it and names by field (verified)
    assert(run("SELECT unnest(s) AS v FROM su_t ORDER BY a") ==
      (Seq("a", "b"), Seq(Seq(10, "x"), Seq(20, "y"))))
    assert(run("SELECT unnest(s, recursive := true) AS v FROM suc_t") ==
      (Seq("a", "a_1"), Seq(Seq(1, 9))))
    // COLUMNS(* EXCLUDE (…)) (r12): schema minus the listed columns,
    // case-insensitive binding (DuckDB verified: EXCLUDE ("AA") → ab, ba)
    assert(run("SELECT COLUMNS(* EXCLUDE (ab)) FROM cols_t") ==
      (Seq("aa", "ba"), Seq(Seq(1, 3))))
    assert(run("SELECT max(COLUMNS(* EXCLUDE (ab, ba))) FROM cols_t") ==
      (Seq("aa"), Seq(Seq(1))))
    assert(run("SELECT COLUMNS(* EXCLUDE (\"AA\")) FROM cols_t") ==
      (Seq("ab", "ba"), Seq(Seq(2, 3))))
    // COLUMNS(c -> predicate) (r12): the lambda binds each column NAME
    // as VARCHAR — every expectation below is DuckDB-verified verbatim
    assert(run("SELECT COLUMNS(c -> c LIKE 'a%') FROM cols_t") ==
      (Seq("aa", "ab"), Seq(Seq(1, 2))))
    assert(run("SELECT max(COLUMNS(c -> regexp_full_match(c, '[ab]a'))) FROM cols_t") ==
      (Seq("aa", "ba"), Seq(Seq(1, 3))))
    // a SIMILAR TO lambda body refuses with guidance (the operator has
    // no Spark twin — same stance as bare SIMILAR TO statements)
    intercept[IllegalArgumentException](
      run("SELECT COLUMNS(c -> c SIMILAR TO '[ab]a') FROM cols_t"))
    // DuckDB truthiness: a nonzero-int lambda keeps the column (len-1
    // is 1 for every 2-char name → all three survive, verified)
    assert(run("SELECT COLUMNS(c -> len(c) - 1) FROM cols_t") ==
      (Seq("aa", "ab", "ba"), Seq(Seq(1, 2, 3))))
    // duckisms in the surrounding item AND in the lambda body both
    // bridge (list_value/len outside, LIKE on the bound name inside)
    assert(run("SELECT len(list_value(COLUMNS(c -> c LIKE '%b%'))) FROM cols_t") ==
      (Seq("ab", "ba"), Seq(Seq(1L, 1L))))
    // zero lambda matches refuse like zero regex matches (DuckDB errors)
    intercept[Exception](run("SELECT COLUMNS(c -> c LIKE 'z%') FROM cols_t"))
    // aliased COLUMNS (r12, second session): `AS z` names the expansion
    // z, z_1, z_2 (DuckDB's _N dedup); a 'single-quoted' alias is a
    // regex template where \N substitutes match group N — every
    // expectation DuckDB-verified
    assert(run("SELECT COLUMNS('a') AS z FROM cols_t") ==
      (Seq("z", "z_1", "z_2"), Seq(Seq(1, 2, 3))))
    assert(run("SELECT COLUMNS(*) AS z FROM cols_t") ==
      (Seq("z", "z_1", "z_2"), Seq(Seq(1, 2, 3))))
    assert(run("SELECT max(COLUMNS('^a')) AS m FROM cols_t") ==
      (Seq("m", "m_1"), Seq(Seq(1, 2))))
    assert(run("SELECT COLUMNS(c -> c LIKE 'a%') AS q FROM cols_t") ==
      (Seq("q", "q_1"), Seq(Seq(1, 2))))
    assert(run("SELECT COLUMNS('^a(.)') AS 'x_\\1' FROM cols_t") ==
      (Seq("x_a", "x_b"), Seq(Seq(1, 2))))
    // alias dedup is GLOBAL across the statement in positional order
    // (duckdb .df() semantics, ADVICE r12 — every expectation below is
    // the installed duckdb's .df() column list, verified this round)
    assert(run("SELECT COLUMNS('a') AS z, COLUMNS('b') AS z FROM cols_t") ==
      (Seq("z", "z_1", "z_2", "z_3", "z_4"), Seq(Seq(1, 2, 3, 2, 3))))
    assert(run("SELECT ba AS z, COLUMNS('^a') AS z FROM cols_t") ==
      (Seq("z", "z_1", "z_2"), Seq(Seq(3, 1, 2))))
    assert(run("SELECT COLUMNS('^a') AS z, ba AS z FROM cols_t") ==
      (Seq("z", "z_1", "z_2"), Seq(Seq(1, 2, 3))))
    assert(run("SELECT COLUMNS('^a'), COLUMNS('^a') FROM cols_t") ==
      (Seq("aa", "ab", "aa_1", "ab_1"), Seq(Seq(1, 2, 1, 2))))
    assert(run("SELECT aa, COLUMNS('^a') FROM cols_t") ==
      (Seq("aa", "aa_1", "ab"), Seq(Seq(1, 1, 2))))
    assert(run("SELECT COLUMNS('^a') AS z, ab AS q, COLUMNS('^b') AS z " +
      "FROM cols_t") ==
      (Seq("z", "z_1", "q", "z_2"), Seq(Seq(1, 2, 2, 3))))
    // a template alias needs a regex match to template from — * and
    // lambda args refuse
    intercept[Exception](run("SELECT COLUMNS(*) AS 'x_\\0' FROM cols_t"))
    // refusals: zero matches (DuckDB errors too), joins, and an
    // EXCLUDE column absent from the schema (DuckDB binder error)
    intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT COLUMNS('zzz') FROM cols_t"))
    val exMiss = intercept[IllegalArgumentException](graft.DuckDialect.sql(
      spark, "SELECT COLUMNS(* EXCLUDE (zz)) FROM cols_t"))
    assert(exMiss.getMessage.contains("EXCLUDE list not found"))
    // UNPIVOT statement → Spark's UNPIVOT clause (pure text rewrite)
    assert(graft.DuckDialect.rewrite(
      "UNPIVOT w ON c1, c2 INTO NAME k VALUE v ORDER BY g") ==
      "SELECT * FROM w UNPIVOT (v FOR k IN (c1, c2)) ORDER BY g")
    // NULL cells dropped, remaining columns kept — DuckDB's exact rows
    assert(run("UNPIVOT up_w ON c1, c2, c3 INTO NAME k VALUE v ORDER BY g, k") ==
      (Seq("g", "k", "v"), Seq(Seq("a", "c1", 1), Seq("a", "c2", 2),
        Seq("b", "c1", 3), Seq("b", "c3", 5))))
    assert(run("UNPIVOT up_w ON c1, c2 INTO NAME k VALUE v ORDER BY g, k") ==
      (Seq("g", "c3", "k", "v"), Seq(Seq("a", null, "c1", 1),
        Seq("a", null, "c2", 2), Seq("b", 5, "c1", 3))))
    // aliased ON items bridge into the clause's IN-list aliases (r12)
    assert(graft.DuckDialect.rewrite(
      "UNPIVOT w ON c1 AS 'one' INTO NAME k VALUE v") ==
      "SELECT * FROM w UNPIVOT (v FOR k IN (c1 AS `one`))")
    // still refused (→ untouched → guidance): ragged item widths, and
    // a multi-VALUE statement with a WHERE tail (null filter + user
    // predicate would need a merge)
    assert(graft.DuckDialect.rewrite(
      "UNPIVOT w ON (c1, c2), c3 INTO NAME k VALUE v1, v2")
      .startsWith("UNPIVOT"))
    assert(graft.DuckDialect.rewrite(
      "UNPIVOT w ON (c1, c2) INTO NAME k VALUE v1, v2 WHERE v1 > 0")
      .startsWith("UNPIVOT"))
  }

  test("DuckDialect statement bridges: ASOF [LEFT] JOIN — every expected " +
    "answer is the installed DuckDB's") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW asof_l AS SELECT * FROM " +
      "VALUES ('a', 10),('a', 20),('b', 15),('c', 5) t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW asof_r AS SELECT * FROM " +
      "VALUES ('a', 8, 100),('a', 10, 200),('a', 18, 300),('b', 20, 400) " +
      "t(k, ts, v)")
    def run(duck: String): Seq[Seq[Any]] =
      graft.DuckDialect.sql(spark, duck).collect()
        .map(r => (0 until r.length).map(r.get)).toSeq
    // inner: per left row the LARGEST right ts <= left ts (inclusive);
    // left rows with no match drop
    assert(run("SELECT l.k, l.ts, r.ts, r.v FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 10, 200), Seq("a", 20, 18, 300)))
    // LEFT keeps unmatched rows with NULL right columns
    assert(run("SELECT l.k, l.ts, r.v FROM asof_l l ASOF LEFT JOIN asof_r r " +
      "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 200), Seq("a", 20, 300),
        Seq("b", 15, null), Seq("c", 5, null)))
    // strict inequality; flipped operand order; the >= direction
    assert(run("SELECT l.k, l.ts, r.v FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.ts > r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 100), Seq("a", 20, 300)))
    assert(run("SELECT l.k, l.ts, r.v FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND r.ts <= l.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 200), Seq("a", 20, 300)))
    assert(run("SELECT l.k, l.ts, r.v FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.ts <= r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 200), Seq("b", 15, 400)))
    // bare * pulls the synthesized id through — EXCEPT drops it
    assert(run("SELECT * FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, "a", 10, 200), Seq("a", 20, "a", 18, 300)))
    // grouped (subquery) relations bridge since r11, on either side —
    // both expected answers are the installed DuckDB's
    assert(run("SELECT l.k, l.ts, r.v FROM (SELECT * FROM asof_l " +
      "WHERE ts > 6) l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 200), Seq("a", 20, 300)))
    assert(run("SELECT l.k, l.ts, r.v FROM asof_l l ASOF JOIN " +
      "(SELECT k, ts, v*10 AS v FROM asof_r) r " +
      "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts") ==
      Seq(Seq("a", 10, 2000), Seq("a", 20, 3000)))
    // a grouped relation WITHOUT an alias refuses (Spark needs one and
    // there is no ident to default from)
    val ae = intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT v FROM (SELECT * FROM asof_l WHERE ts > 6) ASOF JOIN " +
        "asof_r r ON k = r.k AND ts >= r.ts"))
    assert(ae.getMessage.contains("ASOF") || ae.getMessage.contains("asof"))
    // refusal: WHERE — DuckDB filters AFTER the asof pick, the wrap
    // would filter candidate matches BEFORE it (silently different)
    val e = intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT l.k FROM asof_l l ASOF JOIN asof_r r " +
        "ON l.k = r.k AND l.ts >= r.ts WHERE r.v > 150"))
    assert(e.getMessage.contains("ASOF"))
  }

  test("ASOF bridge scale gate (VERDICT r9): the probed equi-group pair " +
    "count is exact, the refusal carries the q51 guidance, -1 disables") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW asof_l AS SELECT * FROM " +
      "VALUES ('a', 10),('a', 20),('b', 15),('c', 5) t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW asof_r AS SELECT * FROM " +
      "VALUES ('a', 8, 100),('a', 10, 200),('a', 18, 300),('b', 20, 400) " +
      "t(k, ts, v)")
    val q = "SELECT l.k, l.ts, r.v FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts"
    // equi-group pair sum: k=a 2x3 + k=b 1x1 = 7 (c has no right group)
    def withMax[T](v: String)(body: => T): T = {
      spark.conf.set("spark.graft.asof.maxPairs", v)
      try body finally spark.conf.unset("spark.graft.asof.maxPairs")
    }
    val e = intercept[IllegalArgumentException](
      withMax("6")(graft.DuckDialect.sql(spark, q)))
    assert(e.getMessage.contains("7 candidate pairs"), e.getMessage)
    assert(e.getMessage.contains("q51_asof_join"))
    assert(withMax("7")(graft.DuckDialect.sql(spark, q)).count() == 2)
    // no clean equi conjunct -> |l| x |r| = 16 is the (over)estimate
    val q2 = "SELECT l.ts, r.v FROM asof_l l ASOF JOIN asof_r r " +
      "ON l.ts >= r.ts ORDER BY l.ts"
    val e2 = intercept[IllegalArgumentException](
      withMax("15")(graft.DuckDialect.sql(spark, q2)))
    assert(e2.getMessage.contains("16 candidate pairs"), e2.getMessage)
    // -1 disables the gate entirely
    assert(withMax("-1")(graft.DuckDialect.sql(spark, q)).count() == 2)
  }

  test("DuckDialect statement bridges r10: USING SAMPLE n ROWS, COPY TO, " +
    "read_csv/read_json table functions") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW smp AS " +
      "SELECT id AS k FROM range(100)")
    def one(q: String): Long =
      graft.DuckDialect.sql(spark, q).head.getLong(0)
    // sample: exact n, real distinct rows, min(n, |input|)
    val r = graft.DuckDialect.sql(spark, "SELECT count(*) AS n, " +
      "count(DISTINCT k) AS d FROM (SELECT * FROM smp USING SAMPLE 10 ROWS)")
      .head
    assert(r.getLong(0) == 10 && r.getLong(1) == 10)
    assert(one("SELECT count(*) FROM " +
      "(SELECT * FROM smp USING SAMPLE 1000 ROWS)") == 100)
    // sample BEFORE the WHERE (DuckDB-verified order): 50 sampled rows
    // then k >= 90 keeps at most the 10 matching rows, never 50
    assert(one("SELECT count(*) AS n FROM smp WHERE k >= 90 " +
      "USING SAMPLE 50 ROWS") <= 10)
    // alias survives the wrap; tail ORDER BY/LIMIT stays outer
    assert(graft.DuckDialect.sql(spark, "SELECT s.k FROM smp s " +
      "USING SAMPLE 5 ROWS ORDER BY s.k LIMIT 3").count() == 3)
    // method/seed spellings bridge since r11 (DuckDB-verified grammar:
    // the paren forms below all parse there; bernoulli with a ROWS
    // count is a DuckDB error and refuses here too)
    assert(one("SELECT count(*) FROM (SELECT * FROM smp " +
      "USING SAMPLE reservoir(10 ROWS))") == 10)
    assert(one("SELECT count(*) FROM (SELECT * FROM smp " +
      "USING SAMPLE 10 ROWS (reservoir, 42))") == 10)
    // a SEED pins the draw within Spark: same seed twice = same rows
    def seededSum() = one("SELECT sum(k) FROM (SELECT * FROM smp " +
      "USING SAMPLE 10 ROWS (reservoir, 42))")
    assert(seededSum() == seededSum())
    // percent + method/seed → TABLESAMPLE REPEATABLE; seeded draws are
    // stable within Spark, and counts stay within the population
    def pctCount(q: String) = one(s"SELECT count(*) FROM (SELECT * FROM smp $q)")
    val p1 = pctCount("USING SAMPLE 20% (bernoulli, 377)")
    assert(p1 == pctCount("USING SAMPLE 20% (bernoulli, 377)") && p1 <= 100)
    assert(pctCount("USING SAMPLE bernoulli(20%, 377)") == p1)
    assert(pctCount("USING SAMPLE 20 PERCENT (system)") <= 100)
    // reservoir(p%) bridges session-aware since r12: exact-count via
    // one bounded count job, k = round-half-up(count·p/100) (DuckDB-
    // verified: 10% of 95 → 10, 1.5 → 2, decimal percents allowed)
    assert(graft.DuckDialect.sql(spark,
      "SELECT * FROM smp USING SAMPLE reservoir(10%)").count() == 10)
    assert(graft.DuckDialect.sql(spark,
      "SELECT * FROM smp USING SAMPLE 12.5% (reservoir, 7)").count() == 13)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW smp10 AS " +
      "SELECT id AS k FROM range(10)")
    assert(graft.DuckDialect.sql(spark,
      "SELECT * FROM smp10 USING SAMPLE reservoir(15%)").count() == 2)
    // sample-before-WHERE holds for the percent form too
    assert(one("SELECT count(*) AS n FROM smp WHERE k >= 90 " +
      "USING SAMPLE reservoir(50%)") <= 10)
    // subquery placement still refuses (top-level-only bridge: the
    // count pass needs the session; guidance says use the ROWS form)
    val se = intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT count(*) FROM (SELECT * FROM smp USING SAMPLE reservoir(10%))"))
    assert(se.getMessage.contains("SAMPLE"))
    // COPY (query) TO: DuckDB's one-row Count shape, written data real
    val out = "/tmp/graft_copy_spec"
    val c = graft.DuckDialect.sql(spark,
      s"COPY (SELECT k FROM smp WHERE k < 7) TO '$out' (FORMAT PARQUET)")
    assert(c.columns.toSeq == Seq("Count") && c.head.getLong(0) == 7)
    assert(spark.read.parquet(out).count() == 7)
    // overwrite semantics (DuckDB overwrites too — verified)
    assert(one(s"COPY (SELECT k FROM smp WHERE k < 3) TO '$out' " +
      "(FORMAT PARQUET)") == 3)
    assert(spark.read.parquet(out).count() == 3)
    // COPY table TO csv + read_csv round trip with header and delim
    assert(one("COPY smp TO '/tmp/graft_copy_spec_csv' " +
      "(FORMAT CSV, HEADER, DELIMITER ';')") == 100)
    assert(one("SELECT count(*) FROM read_csv('/tmp/graft_copy_spec_csv'," +
      " header = true, delim = ';')") == 100)
    // headerless CSV names columns column0..N as DuckDB does; the
    // names= option overrides; list-of-paths parses via the bracket
    // bridge
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_spec_nh.csv"),
      "1,x\n2,y\n".getBytes("UTF-8"))
    val nh = graft.DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/graft_spec_nh.csv', header = false)")
    assert(nh.columns.toSeq == Seq("column0", "column1"))
    val named = graft.DuckDialect.sql(spark, "SELECT * FROM read_csv(" +
      "['/tmp/graft_spec_nh.csv'], header = false, names = ['a', 'b'])")
    assert(named.columns.toSeq == Seq("a", "b"))
    // read_json: NDJSON default and format='array' (multiLine)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_spec_arr.json"),
      """[{"a": 1}, {"a": 2}]""".getBytes("UTF-8"))
    assert(one("SELECT count(*) FROM read_json(" +
      "'/tmp/graft_spec_arr.json', format = 'array')") == 2)
    // review follow-ups, all DuckDB-verified spellings:
    // header = 0 (numeric boolean) is valid and means no-header
    assert(graft.DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/graft_spec_nh.csv', header = 0)")
      .columns.toSeq == Seq("column0", "column1"))
    // all_varchar = 1 disables inference — every column lands STRING
    assert(graft.DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/graft_spec_nh.csv', header = false," +
        " all_varchar = 1)").schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))
    // COPY option values may CONTAIN commas — quote-aware split
    assert(one("COPY (SELECT k FROM smp WHERE k < 4) TO " +
      "'/tmp/graft_copy_spec_d' (FORMAT CSV, HEADER, DELIMITER ',')") == 4)
    assert(one("SELECT count(*) FROM read_csv('/tmp/graft_copy_spec_d'," +
      " header = true, delim = ',')") == 4)
    // records = false changes DuckDB's result SHAPE (struct-per-value)
    // and has no spark.read twin — must refuse, never silently unpack
    val re = intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT * FROM read_json('/tmp/graft_spec_arr.json', " +
        "records = false)"))
    assert(re.getMessage.contains("records"))
    // option-free read_csv SNIFFS since r13 (DuckCompatMatrixR13b pins
    // the dialect rules against the installed DuckDB): this fixture is
    // ','-delimited with a type-conforming first row → headerless,
    // exactly DuckDB's detection; ambiguous dialects still refuse
    val af = graft.DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/graft_spec_nh.csv')")
    assert(af.columns.toSeq == Seq("column0", "column1"))
    assert(af.count() == 2)
    // names list LONGER than the file's width truncates to the width,
    // exactly as DuckDB does (verified; was an opaque toDF arity error)
    assert(graft.DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/graft_spec_nh.csv', header = false," +
        " names = ['a', 'b', 'c', 'd'])").columns.toSeq == Seq("a", "b"))
    // loud refusals: unknown read option, unbridged COPY format,
    // COPY FROM shapes
    val oe = intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/graft_spec_nh.csv', skip = 2)"))
    assert(oe.getMessage.contains("not bridged"))
    val fe = intercept[Exception](graft.DuckDialect.sql(spark,
      "COPY (SELECT 1) TO '/tmp/x' (FORMAT ORC)"))
    assert(fe.getMessage.contains("ORC") || fe.getMessage.contains("orc"))
  }

  test("DuckDialect statement bridges r11: COPY table FROM 'path' — " +
    "positional schema load, Count return, loud edges") {
    def one(q: String): Long = graft.DuckDialect.sql(spark, q).head.getLong(0)
    spark.sql("DROP TABLE IF EXISTS graft_cf_t")
    val wh = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, "graft_cf_t")
    if (wh.exists()) { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }; rm(wh) }
    spark.sql("CREATE TABLE graft_cf_t (k BIGINT, name STRING) USING parquet")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_cf1.csv"),
      "k,name\n1,alpha\n2,beta\n".getBytes("UTF-8"))
    // headered CSV: Count = rows loaded (DuckDB-verified return shape)
    val c1 = graft.DuckDialect.sql(spark, "COPY graft_cf_t FROM " +
      "'/tmp/graft_cf1.csv' (FORMAT CSV, HEADER, DELIMITER ',')")
    assert(c1.columns.toSeq == Seq("Count") && c1.head.getLong(0) == 2)
    // headerless, non-comma delim — positional into the table schema
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_cf2.csv"),
      "3|gamma\n".getBytes("UTF-8"))
    assert(one("COPY graft_cf_t FROM '/tmp/graft_cf2.csv' " +
      "(FORMAT CSV, HEADER false, DELIMITER '|')") == 1)
    assert(spark.table("graft_cf_t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // parquet round trip through the TO half
    assert(one("COPY (SELECT CAST(9 AS BIGINT) AS k, 'iota' AS name) TO " +
      "'/tmp/graft_cf_p' (FORMAT PARQUET)") == 1)
    assert(one("COPY graft_cf_t FROM '/tmp/graft_cf_p' (FORMAT PARQUET)") == 1)
    assert(spark.table("graft_cf_t").count() == 4)
    // temp VIEW target refuses — read-only here where DuckDB's is a table
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_cf_v AS SELECT 1 AS x")
    val ve = intercept[Exception](graft.DuckDialect.sql(spark,
      "COPY graft_cf_v FROM '/tmp/graft_cf1.csv' (FORMAT CSV, HEADER, " +
        "DELIMITER ',')"))
    assert(ve.getMessage.contains("read-only"))
    // CSV without explicit HEADER+DELIMITER refuses (DuckDB sniffs both;
    // a wrong default under the forced schema would corrupt silently)
    val he = intercept[Exception](graft.DuckDialect.sql(spark,
      "COPY graft_cf_t FROM '/tmp/graft_cf1.csv' (FORMAT CSV)"))
    assert(he.getMessage.contains("HEADER"))
    // column lists (r12): file columns map POSITIONALLY onto the listed
    // columns (header names are IGNORED — DuckDB-verified with a
    // mismatching header), unlisted columns fill NULL
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_cf4.csv"),
      "zz,ww\ndelta,4\n".getBytes("UTF-8"))
    assert(one("COPY graft_cf_t (name, k) FROM '/tmp/graft_cf4.csv' " +
      "(FORMAT CSV, HEADER true, DELIMITER ',')") == 1)
    assert(spark.table("graft_cf_t").filter("k = 4")
      .head.getString(1) == "delta")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_cf5.csv"),
      "5\n".getBytes("UTF-8"))
    assert(one("COPY graft_cf_t (k) FROM '/tmp/graft_cf5.csv' " +
      "(FORMAT CSV, HEADER false, DELIMITER ',')") == 1)
    assert(spark.table("graft_cf_t").filter("k = 5").head.isNullAt(1))
    // column-list refusals: non-CSV formats, unknown and repeated names
    val pe = intercept[Exception](graft.DuckDialect.sql(spark,
      "COPY graft_cf_t (k) FROM '/tmp/graft_cf_p' (FORMAT PARQUET)"))
    assert(pe.getMessage.contains("FORMAT CSV only"))
    val ue = intercept[Exception](graft.DuckDialect.sql(spark,
      "COPY graft_cf_t (zz) FROM '/tmp/graft_cf5.csv' " +
        "(FORMAT CSV, HEADER false, DELIMITER ',')"))
    assert(ue.getMessage.contains("not a column"))
    val de = intercept[Exception](graft.DuckDialect.sql(spark,
      "COPY graft_cf_t (k, k) FROM '/tmp/graft_cf5.csv' " +
        "(FORMAT CSV, HEADER false, DELIMITER ',')"))
    assert(de.getMessage.contains("repeats"))
    // arity mismatch raises (FAILFAST), never loads nulls silently
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_cf3.csv"),
      "7,x,extra\n".getBytes("UTF-8"))
    intercept[Exception] {
      graft.DuckDialect.sql(spark, "COPY graft_cf_t FROM " +
        "'/tmp/graft_cf3.csv' (FORMAT CSV, HEADER false, DELIMITER ',')")
        .collect()
    }
    assert(spark.table("graft_cf_t").count() == 6) // nothing half-loaded
    spark.sql("DROP TABLE graft_cf_t")
  }

  test("DuckCompat registered functions: the analyze-level bridges " +
    "(VERDICT r8 item 1) return the installed DuckDB's answers") {
    // through the REAL entry point (DuckDialect.sql registers + runs)
    def one(duck: String): Any =
      graft.DuckDialect.sql(spark, duck).head.get(0)
    // len: type-ambiguous in a text rewrite — CHARS for strings (BIGINT,
    // as DuckDB), element count for lists; both in ONE statement (the
    // analyze-retry cascade the VERDICT sketched cannot do this)
    assert(one("SELECT len('héllo') + len(list_value(1,2,3))") == 8L)
    // r11 registered natives — every expected value DuckDB-verified:
    // list_prepend swaps (elem, list) into array_prepend and mirrors
    // the NULL-list → [elem] edge (array_prepend returns NULL there)
    assert(one("SELECT array_to_string(list_prepend(0, list_value(1,2)), '-')")
      == "0-1-2")
    assert(one("SELECT array_to_string(list_prepend(9, " +
      "CAST(NULL AS ARRAY<INT>)), '-')") == "9")
    // string_split: literal separator splits LITERALLY (metachars too),
    // trailing empties kept; NULL separator = no split
    assert(one("SELECT array_to_string(string_split('a,b,,', ','), '|')")
      == "a|b||")
    assert(one("SELECT array_to_string(string_split('a.b', '.'), '|')")
      == "a|b")
    assert(one("SELECT array_to_string(string_to_array('x||y', '||'), '-')")
      == "x-y")
    assert(one("SELECT array_to_string(string_split('x', NULL), '|')") == "x")
    // array_to_string itself (r11): NULL elements skipped, empty → NULL
    assert(one("SELECT array_to_string(list_value(1, NULL, 3), ',')")
      == "1,3")
    assert(one("SELECT array_to_string(list_filter(list_value(1), x -> x > 9), ',')")
      == null)
    assert(one("SELECT len(NULL)") == null)
    // list_sum / list_avg / list_aggregate: NULL elements skipped,
    // empty/all-NULL → NULL (DuckDB-verified values)
    assert(one("SELECT list_sum(list_value(1, NULL, 3))") == 4L)
    assert(one("SELECT list_sum(CAST(array() AS ARRAY<INT>))") == null)
    assert(one("SELECT list_sum(list_value(1.5, 2.5))") == 4.0)
    assert(one("SELECT list_avg(list_value(1, NULL, 2))") == 1.5)
    assert(one("SELECT list_aggregate(list_value(1,2,3), 'sum')") == 6L)
    assert(one("SELECT list_aggregate(list_value(1,NULL,3), 'count')") == 2L)
    assert(one("SELECT list_aggregate(list_value('b','a'), 'min')") == "a")
    assert(one("SELECT list_aggregate(list_value(1,2), 'avg')") == 1.5)
    // date_diff 3-arg: BOUNDARY CROSSINGS, not complete intervals —
    // the month case is the classic divergence (DuckDB-verified)
    assert(one("SELECT date_diff('month', DATE '2021-01-31', " +
      "DATE '2021-02-01')") == 1L)
    assert(one("SELECT date_diff('month', DATE '2021-02-01', " +
      "DATE '2021-01-31')") == -1L)
    assert(one("SELECT date_diff('hour', TIMESTAMP '2021-01-01 01:59:00'," +
      " TIMESTAMP '2021-01-01 02:01:00')") == 1L)
    assert(one("SELECT date_diff('day', TIMESTAMP '2021-01-01 23:59:59', " +
      "TIMESTAMP '2021-01-02 00:00:01')") == 1L)
    assert(one("SELECT date_diff('years', DATE '2020-12-31', " +
      "DATE '2021-01-01')") == 1L) // plural spelling
    // 2-arg form keeps Spark's own semantics (days, end-start)
    assert(one("SELECT date_diff(DATE '2021-01-03', DATE '2021-01-01')") == 2)
    // array_length: 1-arg and Postgres-style (list, 1); BIGINT as DuckDB
    assert(one("SELECT array_length(list_value(1,2,3))") == 3L)
    assert(one("SELECT array_length(list_value(1,2,3), 1)") == 3L)
    // regexp_full_match with a NON-LITERAL pattern (text bridge can't)
    assert(one("SELECT regexp_full_match('ab12', p) FROM " +
      "(SELECT '[a-z]+[0-9]+' AS p)") == true)
    assert(one("SELECT regexp_full_match('ab' || chr(10), p) FROM " +
      "(SELECT 'ab' AS p)") == false)
    // unsupported spellings fail LOUDLY with a hand-rewrite hint
    val e = intercept[Exception](one(
      "SELECT list_aggregate(list_value(1), 'median')"))
    assert(e.getMessage.contains("not bridged"))
    // list_reduce: seedless fold, seed = first element (DuckDB-verified:
    // (x,y) -> x - y over [1,2,3] folds left to -4; singleton passes
    // through)
    assert(one("SELECT list_reduce(list_value(1,2,3), (x, y) -> x - y)") == -4)
    assert(one("SELECT list_reduce(list_value(5), (x, y) -> x - y)") == 5)
    // strftime/strptime with NON-LITERAL formats — beyond DuckDB itself,
    // which raises 'format must be a constant' (verified); the
    // registered expressions accept both orders and expression formats
    assert(one("SELECT strftime(ts, f) FROM (SELECT TIMESTAMP " +
      "'2021-08-03 14:05:04' AS ts, '%Y/%m' AS f)") == "2021/08")
    assert(one("SELECT strftime(f, ts) FROM (SELECT TIMESTAMP " +
      "'2021-08-03 14:05:04' AS ts, 'at %-H h' AS f)") == "at 14 h")
    assert(one("SELECT strptime(s, f) FROM (SELECT '03/08/2021' AS s, " +
      "'%d/%m/%Y' AS f)").toString.startsWith("2021-08-03"))
    val badFmt = intercept[Exception](one("SELECT strftime(TIMESTAMP " +
      "'2021-01-01 00:00:00', '%U')"))
    assert(badFmt.getMessage.contains("JDK"))
  }

  test("DuckCompat r10 bridges: date_sub / list_extract strings / " +
    "list_slice string + step forms — every expected answer is the " +
    "installed DuckDB's") {
    def one(duck: String): Any =
      graft.DuckDialect.sql(spark, duck).head.get(0)
    // date_sub: COMPLETE CLAMPED INTERVALS, start-anchored (all values
    // DuckDB-verified): Jan-31 + 1 clamped month = Feb-28
    assert(one("SELECT date_sub('month', DATE '2021-01-31', " +
      "DATE '2021-02-28')") == 1L)
    assert(one("SELECT date_sub('month', DATE '2021-01-31', " +
      "DATE '2021-02-27')") == 0L)
    assert(one("SELECT date_sub('month', DATE '2021-01-31', " +
      "DATE '2021-03-01')") == 1L)
    assert(one("SELECT date_sub('year', DATE '2020-02-29', " +
      "DATE '2021-02-28')") == 1L)
    // backward = negated forward (NOT floor): -1, not -2
    assert(one("SELECT date_sub('month', DATE '2021-02-28', " +
      "DATE '2021-01-31')") == -1L)
    assert(one("SELECT date_sub('month', DATE '2021-03-31', " +
      "DATE '2021-01-31')") == -2L)
    assert(one("SELECT date_sub('hour', TIMESTAMP '2021-01-01 12:29:00'," +
      " TIMESTAMP '2021-01-01 10:30:00')") == -1L)
    // time-of-day rides along the clamped month walk
    assert(one("SELECT date_sub('month', TIMESTAMP '2021-01-31 05:00:00'," +
      " TIMESTAMP '2021-02-28 04:59:59')") == 0L)
    assert(one("SELECT date_sub('month', TIMESTAMP '2021-01-31 05:00:00'," +
      " TIMESTAMP '2021-02-28 05:00:00')") == 1L)
    // fixed-width parts truncate toward zero; month multiples clamp
    assert(one("SELECT date_sub('day', TIMESTAMP '2021-01-01 12:00:00', " +
      "TIMESTAMP '2021-01-03 11:59:59')") == 1L)
    assert(one("SELECT date_sub('week', DATE '2021-01-01', " +
      "DATE '2021-01-15')") == 2L)
    assert(one("SELECT date_sub('quarter', DATE '2021-01-31', " +
      "DATE '2021-04-30')") == 1L)
    assert(one("SELECT date_sub('decade', DATE '2000-06-15', " +
      "DATE '2021-06-14')") == 2L)
    assert(one("SELECT date_sub('minute', TIMESTAMP '2021-01-01 00:00:30'," +
      " TIMESTAMP '2021-01-01 00:02:29')") == 1L)
    assert(one("SELECT date_sub('millisecond', " +
      "TIMESTAMP '2021-01-01 00:00:00.0015', " +
      "TIMESTAMP '2021-01-01 00:00:00.0041')") == 2L)
    // 2-arg form keeps Spark's own date_sub(date, days)
    assert(one("SELECT date_sub(DATE '2021-01-03', 2)").toString ==
      "2021-01-01")
    // list_extract: STRING form = 1-based character access, '' out of
    // range / at 0 (NOT NULL); arrays keep try_element_at semantics
    assert(one("SELECT list_extract('DuckDB', 2)") == "u")
    assert(one("SELECT list_extract('DuckDB', -1)") == "B")
    assert(one("SELECT list_extract('DuckDB', 0)") == "")
    assert(one("SELECT list_extract('DuckDB', 99)") == "")
    assert(one("SELECT list_extract('DuckDB', -99)") == "")
    assert(one("SELECT array_extract('abc', 2)") == "b")
    assert(one("SELECT list_extract('DuckDB', NULL)") == null)
    assert(one("SELECT list_extract(list_value(1,2,3), -1)") == 3)
    assert(one("SELECT list_extract(list_value(1,2,3), 0)") == null)
    assert(one("SELECT list_extract(list_value(1,2,3), 5)") == null)
    // list_slice STRING form: same clamp matrix over characters
    assert(one("SELECT list_slice('DuckDB', 2, 4)") == "uck")
    assert(one("SELECT list_slice('DuckDB', -3, -1)") == "kDB")
    assert(one("SELECT list_slice('DuckDB', 0, 3)") == "Duc")
    assert(one("SELECT list_slice('DuckDB', 4, 2)") == "")
    assert(one("SELECT list_slice('DuckDB', -100, 100)") == "DuckDB")
    assert(one("SELECT list_slice('DuckDB', 5, NULL)") == null)
    // list_slice 4-arg STEP form (DuckDB-verified walk matrix)
    def arr(duck: String): Seq[Any] =
      one(duck).asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 1, 5, 2)") ==
      Seq(1, 3, 5))
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 5, 1, -2)") ==
      Seq(5, 3, 1))
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), -100, 100, 2)") ==
      Seq(1, 3, 5))
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 100, -100, -2)") ==
      Seq(5, 3, 1))
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 3, 0, -1)") ==
      Seq(3, 2, 1))
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 3, -100, -2)") ==
      Seq(3, 1))
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 4, 2, 1)") ==
      Seq())
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 2, 4, -1)") ==
      Seq())
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 0, 5, -1)") ==
      Seq())
    assert(arr("SELECT list_slice(list_value(1,2,3,4,5), 2, -1, 1)") ==
      Seq(2, 3, 4, 5))
    assert(one("SELECT list_slice(list_value(1,2), NULL, 1, 1)") == null)
    assert(one("SELECT list_slice(list_value(1,2), 1, 2, NULL)") == null)
    // step 0 raises (DuckDB: Invalid Input), string+step refused
    intercept[Exception](one(
      "SELECT list_slice(list_value(1,2,3), 1, 3, 0)"))
    val se = intercept[Exception](one(
      "SELECT list_slice('DuckDB', 1, 5, 2)"))
    assert(se.getMessage.toLowerCase.contains("string"))
  }

  test("delta_scan('path') is a real SQL table function: Delta fixture " +
    "through the public-protocol reader, parquet fallback, literal-only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dscan").toString
    val t = s"$dir/t"
    graft.sources.DeltaWrite.write(spark.range(7).toDF("id"), t)
    // Delta path: log replay (incl. a DELETE so the scan is not a bare
    // parquet glob — removed files must disappear)
    graft.sources.DeltaDml.delete(spark, t, col("id") >= 5)
    val n = graft.DuckDialect.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta_scan('$t')").head.getLong(0)
    assert(n == 5, s"delta_scan read $n rows (DELETE not applied?)")
    // the reference's own $TABLE emission shape: join/filter over it
    val m = graft.DuckDialect.sql(spark,
      s"SELECT CAST(SUM(id) AS BIGINT) AS s FROM delta_scan('$t') WHERE id >= 2")
      .head.getLong(0)
    assert(m == 2 + 3 + 4)
    // non-Delta path: plain parquet fallback
    spark.range(3).toDF("x").write.parquet(s"$dir/p")
    assert(graft.DuckDialect.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta_scan('$dir/p')").head.getLong(0) == 3)
    // non-literal path refuses loudly
    val e = intercept[Exception](graft.DuckDialect.sql(spark,
      "SELECT * FROM delta_scan(concat('a', 'b'))").collect())
    assert(e.getMessage.contains("string-literal"))
  }

  test("DuckDialect: * REPLACE bridges to * EXCEPT + appended aliases " +
    "(values match DuckDB; replaced columns move to the end)") {
    import graft.DuckDialect.rewrite
    assert(rewrite("SELECT * REPLACE (a + 1 AS a) FROM t") ==
      "SELECT * EXCEPT (a), a + 1 AS a FROM t")
    assert(rewrite("SELECT t.* REPLACE (upper(b) AS b, c // 2 AS c) FROM t") ==
      "SELECT t.* EXCEPT (b, c), upper(b) AS b, c  div  2 AS c FROM t")
    // non-`expr AS ident` items stay untouched → guidance
    assert(rewrite("SELECT * REPLACE (a + 1) FROM t") ==
      "SELECT * REPLACE (a + 1) FROM t")
    assert(graft.DuckDialect.unbridgeable("SELECT * REPLACE (a + 1) FROM t"))
    // "double-quoted" replace targets bridge since r11 (DuckDB accepts
    // them — verified) and re-emit backticked, Spark's quoting
    assert(rewrite("SELECT * REPLACE (k*2 AS \"odd name\") FROM t") ==
      "SELECT * EXCEPT (`odd name`), k*2 AS `odd name` FROM t")
    val rq = graft.DuckDialect.sql(spark,
      "SELECT * REPLACE (k*2 AS \"odd name\") FROM " +
        "(SELECT 1 AS \"odd name\", 2 AS k)").head
    assert(rq.getInt(1) == 4 || rq.getInt(0) == 4) // replaced value = 4
    // executed values match the installed DuckDB's ((2,2) and (1,'X'))
    val r1 = graft.DuckDialect.sql(spark,
      "SELECT * REPLACE (a + 1 AS a) FROM (SELECT 1 AS a, 2 AS b)").head
    assert(r1.getAs[Int]("a") == 2 && r1.getAs[Int]("b") == 2)
    val r2 = graft.DuckDialect.sql(spark,
      "SELECT t.* REPLACE (upper(b) AS b) FROM (SELECT 1 AS a, 'x' AS b) t")
      .head
    assert(r2.getAs[Int]("a") == 1 && r2.getAs[String]("b") == "X")
  }

  test("SUMMARIZE (DuckDB's profile statement) returns the per-column " +
    "summary; non-$TABLE targets are refused") {
    val s = scanner.query("region", Some("SUMMARIZE"))
    assert(s.columns.head == "summary" && s.columns.contains("r_name"))
    val stats = s.collect().map(_.getString(0)).toSet
    assert(Set("count", "mean", "min", "max").subsetOf(stats))
    assert(scanner.query("region", Some("SUMMARIZE $TABLE")).count() == s.count())
    intercept[IllegalArgumentException] {
      scanner.query("region", Some("SUMMARIZE other_table"))
    }
  }

  test("DuckDialect: read_parquet('path') runs as a Spark parquet scan") {
    val n = spark.sql(graft.DuckDialect.rewrite(
      s"SELECT COUNT(*) AS n FROM read_parquet('$sf/region.parquet')"))
      .head.getLong(0)
    assert(n == Tables.load(spark, sf, "region").count())
  }

  test("DuckDialect: rewritten snippets evaluate to DuckDB's answers") {
    def one(duck: String): Any =
      spark.sql(graft.DuckDialect.rewrite(duck)).head.get(0)
    assert(one("SELECT list_contains(list_value(1,2,3), 2)") == true)
    assert(one("SELECT list_transform(list_value(1,2), x -> x + 1)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(2, 3))
    assert(one("SELECT list_filter(list_value(1,2,3), x -> x > 1)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(2, 3))
    assert(one("SELECT list_sort(list_distinct(list_value(3,1,3)))")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 3))
    assert(one("SELECT array_to_string(list_value('a','b'), '|')") == "a|b")
    assert(one("SELECT list_position(list_value(7,8,9), 8)") == 2)
    assert(one("SELECT list_has_any(list_value(1,2), list_value(2,9))") == true)
    assert(one("SELECT list_max(list_value(4,9,2)) + list_min(list_value(4,9,2))") == 11)
    assert(one("SELECT list_append(list_value(0, 1), 2)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(0, 1, 2))
    assert(one("SELECT list_concat(list_value(1), list_value(2))")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2))
    assert(one("SELECT strlen('héllo')") == 6) // octet semantics, not chars
    assert(one("SELECT 17 // 5") == 3)
    assert(one("SELECT quantile_cont(CAST(v AS DOUBLE), 0.5) " +
      "FROM VALUES (1),(2),(3),(4) AS t(v)") == 2.5)
    assert(one("SELECT arg_max(k, v) FROM VALUES ('a',1),('b',9) AS t(k,v)") == "b")
    assert(one("SELECT arg_min(k, v) FROM VALUES ('a',1),('b',9) AS t(k,v)") == "a")
    assert(one("SELECT regexp_matches('ab12', '[0-9]+')") == true)
    assert(one("SELECT string_agg(k, ',') FROM VALUES ('x') AS t(k)") == "x")
    // 1-arg form: DuckDB's default ',' separator must appear
    assert(Set("a,b", "b,a")(one(
      "SELECT string_agg(k) FROM VALUES ('a'),('b') AS t(k)").asInstanceOf[String]))
    // NULL semantics: list_distinct drops NULLs; list_sort puts them LAST
    assert(one("SELECT list_sort(list_distinct(list_value(1, NULL, 1, 2)))")
      .asInstanceOf[scala.collection.Seq[Integer]].toSeq == Seq(1, 2))
    assert(one("SELECT list_sort(list_value(3, NULL, 1))")
      .asInstanceOf[scala.collection.Seq[Integer]].toSeq ==
      Seq[Integer](1, 3, null))
    assert(one("SELECT epoch_ms(TIMESTAMP '1970-01-01 00:00:01')") == 1000L)
    // r8 additions, expected values verified against DuckDB 1.x:
    assert(one("SELECT regexp_split_to_array('a1b2c', '[0-9]')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", "c"))
    assert(one("SELECT strpos('hello', 'll')") == 3)
    assert(one("SELECT strpos('hello', 'zz')") == 0)
    assert(one("SELECT list_extract(list_value(1,2,3), -1)") == 3)
    assert(one("SELECT list_extract(list_value(1,2,3), 9)") == null)
    assert(one("SELECT array_length(list_value(1,2,3))") == 3)
    assert(one("SELECT starts_with('abc', 'ab')") == true)
    assert(one("SELECT ends_with('abc', 'bc')") == true)
    // r8 conditional bridges — expected values are the installed DuckDB's:
    assert(one("SELECT strftime(TIMESTAMP '2021-08-03 14:05:04', " +
      "'%Y-%m-%dT%H:%M')") == "2021-08-03T14:05")
    assert(one("SELECT strftime(TIMESTAMP '2021-08-03 14:05:04', " +
      "'at %-H h on %A')") == "at 14 h on Tuesday")
    assert(one("SELECT strptime('03/08/2021', '%d/%m/%Y')").toString
      .startsWith("2021-08-03"))
    assert(one("SELECT list_slice(list_value(1,2,3,4,5), 2, 4)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(2, 3, 4))
    assert(one("SELECT list_slice(list_value(1,2,3,4,5), 2, 10)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(2, 3, 4, 5))
    assert(one("SELECT list_slice(list_value(1,2,3,4,5), -2, -1)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(4, 5))
    assert(one("SELECT list_slice(list_value(1,2,3,4,5), 4, 2)")
      .asInstanceOf[scala.collection.Seq[Int]].isEmpty)
    // both-negative start-clamp edges (ADVICE r8, values = installed
    // DuckDB's): start past the head clamps, not empties; a 1-element
    // list still yields its element for the 'last two' idiom; both
    // bounds past the head → []
    assert(one("SELECT list_slice(list_value(1,2,3), -5, -1)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2, 3))
    assert(one("SELECT list_slice(list_value(1), -2, -1)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1))
    assert(one("SELECT list_slice(list_value(1,2,3), -5, -4)")
      .asInstanceOf[scala.collection.Seq[Int]].isEmpty)
    assert(one("SELECT struct_pack(a := 1, b := 'x').b") == "x")
    assert(one("SELECT epoch(TIMESTAMP '2021-08-03 11:59:44.123456')")
      == 1627991984.123456) // a DOUBLE, as DuckDB returns
    assert(one("SELECT * EXCLUDE a FROM (SELECT 1 AS a, 2 AS b)") == 2)
    assert(one("SELECT * EXCLUDE (a, c) FROM (SELECT 1 a, 2 b, 3 c)") == 2)
    assert(one("SELECT list_prepend(0, list_value(1,2))")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(0, 1, 2))
    assert(one("SELECT regexp_full_match('ab12', '[a-z]+[0-9]+')") == true)
    assert(one("SELECT regexp_full_match('ab12x', '[a-z]+[0-9]+')") == false)
    // trailing-newline edge (ADVICE r8): DuckDB's full match rejects
    // "ab\n" for pattern 'ab'; Java's $ would accept it, \z does not
    assert(one("SELECT regexp_full_match('ab' || chr(10), 'ab')") == false)
    assert(one("SELECT epoch_us(TIMESTAMP '1970-01-01 00:00:01.5')") == 1500000L)
    // string_split edge semantics — DuckDB's values, verified: trailing/
    // leading/adjacent empties kept, no-match → whole, multi-char sep
    assert(one("SELECT string_split('a,b,', ',')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", ""))
    assert(one("SELECT string_split('a.b.c', '.')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", "c"))
    assert(one("SELECT string_split('a,,b', ',')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "", "b"))
    assert(one("SELECT string_to_array('axxbxxc', 'xx')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", "c"))
    // quantile_disc: DuckDB's values are 1,2,3,3 at p=0.25/0.5/0.51/0.75
    // over (1,2,3,4) — the smallest value with cume_dist ≥ p
    assert(one("SELECT quantile_disc(v, 0.5) FROM VALUES (1),(2),(3),(4) AS t(v)") == 2.0)
    assert(one("SELECT quantile_disc(v, 0.51) FROM VALUES (1),(2),(3),(4) AS t(v)") == 3.0)
    assert(one("SELECT quantile(v) FROM VALUES (10),(20),(30),(40),(50) AS t(v)") == 30.0)
    // r9 bracket constructs — every expected value is the installed
    // DuckDB's: NULL elements flow through the head (transform), a
    // NULL/false IF predicate drops the element (filter), a NULL list
    // yields NULL, nesting and lowercase keywords work
    assert(one("SELECT [x*2 FOR x IN [1,2,3]]")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(2, 4, 6))
    assert(one("SELECT [x FOR x IN [1,2,3,NULL] IF x > 1]")
      .asInstanceOf[scala.collection.Seq[Integer]].toSeq ==
      Seq[Integer](2, 3))
    assert(one("SELECT [x+1 for x in [1,NULL,3]]")
      .asInstanceOf[scala.collection.Seq[Integer]].toSeq ==
      Seq[Integer](2, null, 4))
    assert(one("SELECT [UPPER(s) FOR s IN ['a','b'] IF s <> 'b']")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("A"))
    assert(one("SELECT [[y*x FOR y IN [1,2]] FOR x IN [1,2]]")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]]
      .map(_.toSeq).toSeq == Seq(Seq(1, 2), Seq(2, 4)))
    assert(one("SELECT [1,2,3]")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2, 3))
    assert(one("SELECT {'a': 1, 'b': 'x'}.b") == "x")
    assert(one("SELECT {a: 1+1}.a") == 2) // bare keys: {a: 1} ≡ {'a': 1}
    assert(one("SELECT {'k': [v FOR v IN [1,2] IF v > 1]}.k")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(2))
  }

  test("A6 fallback: DuckDB-dialect SQL runs through query() after the " +
    "Spark parse fails; unbridgeable SQL fails WITH the divergence table") {
    // fails Spark analysis (list_contains unknown), succeeds rewritten
    val n = scanner.query("documents", Some(
      "SELECT CAST(SUM(CAST(list_contains(" +
        "string_split_regex(lower(text), '\\s+'), 'the') AS BIGINT)) AS BIGINT) " +
        "AS n FROM $TABLE")).head.getLong(0)
    val want = Tables.load(spark, sf, "documents")
      .select(array_contains(split(lower(col("text")), "\\s+"), "the")
        .cast("long").as("x"))
      .agg(sum("x")).head.getLong(0)
    assert(n == want && n > 0)
    // valid Spark SQL is never rewritten (backslash escapes intact)
    assert(scanner.query("documents",
      Some("SELECT 'a\\tb' AS s FROM $TABLE LIMIT 1")).head.getString(0) == "a\tb")
    // struct_pack's := syntax is bridged since r8 — runs through query()
    assert(scanner.query("documents",
      Some("SELECT struct_pack(a := 1, b := 'x').b AS b FROM $TABLE LIMIT 1"))
      .head.getString(0) == "x")
    // list_sum is a REGISTERED FUNCTION since r9 — runs through query()
    assert(scanner.query("documents",
      Some("SELECT CAST(SUM(list_sum(list_value(CAST(n_chars AS BIGINT))))" +
        " AS BIGINT) AS s FROM $TABLE")).head.getLong(0) > 0)
    // list_reduce bridged in r9 too (registered seedless fold)
    assert(scanner.query("documents",
      Some("SELECT CAST(SUM(list_reduce(list_value(CAST(n_chars AS BIGINT)" +
        ", 1), (a, b) -> a + b)) AS BIGINT) AS s FROM $TABLE"))
      .head.getLong(0) > 0)
    // date_sub bridged in r10 (clamped complete intervals): Jan-31 +
    // one CLAMPED month = Feb-28, so the pair is 1 month apart — the
    // value java.time's MONTHS.between disagrees with (it says 0)
    assert(scanner.query("documents",
      Some("SELECT date_sub('month', DATE '2021-01-31', " +
        "DATE '2021-02-28') AS d FROM $TABLE LIMIT 1")).head.getLong(0) == 1L)
    // still-unbridgeable constructs keep the guidance surface alive:
    // date_diff's century part has no timestampdiff twin (the rewrite
    // leaves it untouched -> guidance with the derive-from-extract hint)
    val e = intercept[IllegalArgumentException] {
      scanner.query("documents",
        Some("SELECT date_diff('century', DATE '1900-01-01', " +
          "DATE '2021-01-01') FROM $TABLE"))
    }
    assert(e.getMessage.contains("century"))
  }

  test("stats and schema mirror count()/schema") {
    assert(scanner.getTableStats("region") ==
      Tables.load(spark, sf, "region").count())
    assert(scanner.getTableSchema("region").fieldNames.toSeq ==
      Seq("r_regionkey", "r_name"))
  }

  test("toJsonLines renders int64 as strings (BigInt-safe CLI boundary)") {
    val lines = scanner.toJsonLines(
      scanner.query("orders", Some("SELECT o_orderkey FROM $TABLE ORDER BY o_orderkey LIMIT 1")))
    assert(lines.head.contains("\"o_orderkey\":\""))
  }

  // ---- SCD2 merge invariants (SURVEY §5.2.3) ----

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkBatch(rows: Seq[(Int, String, String)]) = {
    import spark.implicits._
    rows.toDF("mission_id", "status", "name")
  }

  test("SCD2: first sync inserts all as current; re-sync is a no-op") {
    val b1 = mkBatch(Seq((1, "open", "alpha"), (2, "open", "beta")))
    val empty = ScdPipeline.emptyTarget(b1)
    val (t1, s1) = ScdPipeline.sync(empty, b1, Seq("mission_id"), now = ts("2024-01-01 00:00:00"))
    assert(s1.insertedNew == 2 && s1.closedChanged == 0)
    val t1c = t1.cache()
    assert(t1c.filter(col("is_current")).count() == 2)

    val (t2, s2) = ScdPipeline.sync(t1c, b1, Seq("mission_id"), now = ts("2024-01-02 00:00:00"))
    assert(s2.insertedNew == 0 && s2.closedChanged == 0 && s2.unchanged == 2)
    assert(t2.count() == 2) // identical re-sync changes nothing
  }

  test("SCD2: change closes old version and inserts new current") {
    val b1 = mkBatch(Seq((1, "open", "alpha"), (2, "open", "beta")))
    val (t1, _) = ScdPipeline.sync(ScdPipeline.emptyTarget(b1), b1,
      Seq("mission_id"), now = ts("2024-01-01 00:00:00"))
    val b2 = mkBatch(Seq((1, "closed", "alpha"), (2, "open", "beta"), (3, "open", "gamma")))
    val (t2, s2) = ScdPipeline.sync(t1.cache(), b2, Seq("mission_id"),
      now = ts("2024-02-01 00:00:00"))
    val t2c = t2.cache()
    assert(s2.closedChanged == 1 && s2.insertedNew == 2 && s2.unchanged == 1)
    // exactly one current row per key
    assert(t2c.filter(col("is_current")).groupBy("mission_id").count()
      .filter(col("count") =!= 1).count() == 0)
    // end_date set iff not current
    assert(t2c.filter(col("is_current") && col("end_date").isNotNull).count() == 0)
    assert(t2c.filter(!col("is_current") && col("end_date").isNull).count() == 0)
    // scd_ids unique
    assert(t2c.select("scd_id").distinct().count() == t2c.count())
    // key 1 history: closed 'open' + current 'closed'
    val k1 = t2c.filter(col("mission_id") === 1).collect()
    assert(k1.length == 2)
  }

  test("SCD2: NULL folds to '' — NULL→'' transition is NOT a change") {
    import spark.implicits._
    val b1 = Seq((1, null.asInstanceOf[String], "x")).toDF("mission_id", "status", "name")
    val (t1, _) = ScdPipeline.sync(ScdPipeline.emptyTarget(b1), b1,
      Seq("mission_id"), now = ts("2024-01-01 00:00:00"))
    val b2 = Seq((1, "", "x")).toDF("mission_id", "status", "name")
    val (_, s2) = ScdPipeline.sync(t1.cache(), b2, Seq("mission_id"),
      now = ts("2024-02-01 00:00:00"))
    assert(s2.closedChanged == 0 && s2.unchanged == 1)
  }

  test("SCD2: column mapping renames before merge") {
    import spark.implicits._
    val b1 = Seq((1, "open")).toDF("id_src", "status")
    val (t1, s1) = ScdPipeline.sync(
      ScdPipeline.emptyTarget(b1.withColumnRenamed("id_src", "mission_id")),
      b1, Seq("mission_id"), columnMapping = Map("id_src" -> "mission_id"),
      now = ts("2024-01-01 00:00:00"))
    assert(s1.insertedNew == 1)
    assert(t1.columns.contains("mission_id"))
  }

  test("SCD2: in-batch duplicate keys are deduplicated deterministically") {
    val b = mkBatch(Seq((1, "a", "x"), (1, "b", "y")))
    val (t, s) = ScdPipeline.sync(ScdPipeline.emptyTarget(b), b,
      Seq("mission_id"), now = ts("2024-01-01 00:00:00"))
    assert(s.insertedNew == 1 && t.count() == 1)
  }

  // ---- Graph pipeline (A28-A30) ----

  private val block1 =
    """MERGE (parent:Mission {id: 'M1'}) SET parent.mission_number = '001', parent.title = 'Alpha', parent.comments = ['c1', 'c2']
      |MERGE (child:Mission {id: 'M2'}) SET child.mission_number = '002', child.title = 'Beta', child.comments = []
      |MERGE (parent)-[:IS_PARENT_TO]->(child)""".stripMargin
  private val block2 =
    """MERGE (parent:Mission {id: 'M1'}) SET parent.mission_number = '001', parent.title = 'Alpha v2', parent.comments = ['c3']
      |MERGE (child:Mission {id: 'M3'}) SET child.mission_number = '003', child.title = 'Gamma', child.comments = []
      |MERGE (parent)-[:IS_PARENT_TO]->(child)""".stripMargin

  test("graph load: MERGE dedup with last-writer-wins; edges dedup") {
    import spark.implicits._
    val (nodes, edges) = GraphPipeline.load(spark,
      Seq(block1, block2, block1).toDS) // block1 repeated: idempotent
    val n = nodes.cache(); val e = edges.cache()
    assert(n.count() == 3)
    assert(e.count() == 2)
    // last writer (block2, higher index than first block1) wins for M1...
    // but the REPEATED block1 has the highest index, so title reverts.
    val m1 = n.filter(col("id") === "M1").head
    assert(m1.getAs[String]("title") == "Alpha")
    val (stats, sample) = GraphPipeline.verify(n, e)
    assert(stats == GraphStats(3, 2))
    assert(sample.count() == 2)
  }

  test("graph load idempotency: re-loading the same blocks changes nothing") {
    import spark.implicits._
    val once = GraphPipeline.load(spark, Seq(block1, block2).toDS)
    val twice = GraphPipeline.load(spark, Seq(block1, block2, block1, block2).toDS)
    assert(once._1.count() == twice._1.count())
    assert(once._2.count() == twice._2.count())
  }

  test("graph load: the reference's real 3,443-block corpus parses fully") {
    val ref = "/root/reference/cypher_queries_clean.json"
    assume(new java.io.File(ref).exists(), "reference corpus not present")
    val (nodes, edges) = GraphPipeline.loadFromJson(spark, ref)
    val (stats, sample) = GraphPipeline.verify(nodes, edges)
    // 4,532 distinct Mission ids and one parent→child edge per block
    // (measured independently from the raw JSON with regex extraction).
    assert(stats.nodes == 4532, s"nodes: $stats")
    assert(stats.edges > 3000 && stats.edges <= 3443, s"edges: $stats")
    assert(sample.count() == 5)
  }

  test("graph parse: reference statement shape (no-space id, 3-MERGE edge line)") {
    val b = "MERGE (parent:Mission {id:'523490'}) SET parent.mission_number = '00001', parent.title = 'Alpha', parent.comments = []\n" +
      "MERGE (child:Mission {id:'523491'}) SET child.mission_number = '00002', child.title = 'Beta', child.comments = ['x, y]', 'z']\n" +
      "MERGE (parent:Mission {id:'523490'}) MERGE (child:Mission {id:'523491'}) MERGE (parent)-[:IS_PARENT_TO]->(child)"
    val (ns, es) = GraphPipeline.parseBlock(b)
    assert(ns.map(_._2.id).toSet == Set("523490", "523491"))
    // the propless re-MERGEs on the edge line must not clobber the SET props
    assert(ns.toMap.apply("parent").title == "Alpha")
    assert(ns.toMap.apply("child").comments == Seq("x, y]", "z"))
    assert(es == Seq("parent" -> "child"))
  }

  test("graph parse: escaped quotes and comment arrays") {
    val b = """MERGE (parent:Mission {id: 'M\'9'}) SET parent.title = 'It\'s fine', parent.comments = ['a\'b', 'c']
              |MERGE (child:Mission {id: 'M10'})
              |MERGE (parent)-[:IS_PARENT_TO]->(child)""".stripMargin
    val (ns, es) = GraphPipeline.parseBlock(b)
    assert(ns.map(_._2.id).toSet == Set("M'9", "M10"))
    assert(ns.head._2.comments == Seq("a'b", "c"))
    assert(es == Seq("parent" -> "child"))
  }

  test("graph load: CSV ingest (reference Mission_Cypher.csv shape)") {
    // The reference CSV has a cypher_json column holding JSON strings
    // with escaped quotes (load_memgraph.py:17-26).
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("missions.csv")
    def cell(block: String): String = {
      val json = s"""{"cypher": "${block.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")}"}"""
      "\"" + json.replace("\"", "\"\"") + "\""
    }
    java.nio.file.Files.write(f,
      (Seq("cypher_json") ++ Seq(block1, block2).map(cell))
        .mkString("\n").getBytes("UTF-8"))
    val (nodes, edges) = GraphPipeline.loadFromCsv(spark, f.toString)
    assert(nodes.count() == 3)
    assert(edges.count() == 2)
    assert(nodes.filter(col("id") === "M1").head.getAs[String]("title") == "Alpha v2")
  }

  test("graph load parity: the q134 synthesized corpus round-trips " +
    "identically through the JSON and CSV file forms") {
    import spark.implicits._
    // same block synthesis as q134_graph_load, at sf0.001 (~1.5k blocks)
    val q = SparkEntry.queries("q134_graph_load")
    val direct = q(spark, sf).collect()
    // file forms: the reference's JSON array shape and the CSV
    // cypher_json shape, written from the same synthesized blocks
    val cust = Tables.load(spark, sf, "customer")
    val ords = Tables.load(spark, sf, "orders")
    val blocks = ords.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(concat(
        lit("MERGE (parent:Mission {id:'C"), col("c_custkey"),
        lit("'}) SET parent.mission_number = '"), col("c_custkey"),
        lit("', parent.title = 'Customer "), col("c_name"),
        lit("', parent.comments = []\n"),
        lit("MERGE (child:Mission {id:'O"), col("o_orderkey"),
        lit("'}) SET child.mission_number = '"), col("o_orderkey"),
        lit("', child.title = '"), col("o_orderpriority"),
        lit("', child.comments = ["),
        array_join(org.apache.spark.sql.functions.transform(
          split(col("o_orderpriority"), "-"),
          w => concat(lit("'"), w, lit("'"))), ", "),
        lit("]\n"),
        lit("MERGE (parent:Mission {id:'C"), col("c_custkey"),
        lit("'}) MERGE (child:Mission {id:'O"), col("o_orderkey"),
        lit("'}) MERGE (parent)-[:IS_PARENT_TO]->(child)")).as("cypher"))
      .as[String].collect()
    def esc(s: String): String = s.replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\n", "\\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-g134")
    val jf = dir.resolve("blocks.json")
    java.nio.file.Files.write(jf,
      blocks.map(b => s"""{"cypher": "${esc(b)}"}""")
        .mkString("[", ",\n", "]").getBytes("UTF-8"))
    val cf = dir.resolve("blocks.csv")
    java.nio.file.Files.write(cf,
      (Seq("cypher_json") ++ blocks.map { b =>
        val json = s"""{"cypher": "${esc(b)}"}"""
        "\"" + json.replace("\"", "\"\"") + "\""
      }).mkString("\n").getBytes("UTF-8"))
    for ((path, via) <- Seq((jf, "json"), (cf, "csv"))) {
      val (n, e) = if (via == "json") GraphPipeline.loadFromJson(spark, path.toString)
        else GraphPipeline.loadFromCsv(spark, path.toString)
      val fromFile = e
        .join(n.select(col("id").as("src"), col("title").as("parent_title")), "src")
        .join(n.select(col("id").as("dst"), col("title").as("child_title"),
          col("mission_number").as("child_number"),
          col("comments").as("child_comments")), "dst")
        .groupBy("src", "parent_title")
        .agg(count(lit(1)).as("n_children"),
          countDistinct("child_title").as("n_prio"),
          sum(size(col("child_comments"))).cast("long").as("comment_items"),
          sum(col("child_number").cast("long")).cast("long").as("orderkey_sum"))
        .orderBy("src")
        .collect()
      assert(fromFile.sameElements(direct),
        s"$via file form must reproduce the in-memory q134 result")
    }
  }

  // ---- DDL/DML through spark.sql (A26/A27 surface) ----

  test("CREATE SCHEMA + USE qualification (A24 surface)") {
    // The reference qualifies per-session: CREATE SCHEMA IF NOT EXISTS +
    // USE/SET search_path (delta_to_postgres_scd.py:160,
    // query_sync_table.py:106-107). Spark's equivalent surface.
    Tables.registerAll(spark, sf)
    spark.sql("CREATE SCHEMA IF NOT EXISTS graft_scd")
    spark.sql("DROP TABLE IF EXISTS graft_scd.region_snap")
    spark.sql("CREATE TABLE graft_scd.region_snap USING parquet AS " +
      "SELECT * FROM region")
    // qualified access from the default database
    assert(spark.table("graft_scd.region_snap").count() == 5)
    // USE switches the resolution default; unqualified name resolves
    spark.sql("USE graft_scd")
    try {
      assert(spark.sql("SELECT COUNT(*) AS n FROM region_snap").head.getLong(0) == 5)
      assert(spark.catalog.currentDatabase == "graft_scd")
    } finally spark.sql("USE default")
    spark.sql("DROP TABLE graft_scd.region_snap")
    spark.sql("DROP SCHEMA graft_scd")
  }

  test("CREATE OR REPLACE VIEW works as user DDL") {
    Tables.registerAll(spark, sf)
    spark.sql("CREATE OR REPLACE TEMP VIEW big_orders AS " +
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000")
    val n1 = spark.table("big_orders").count()
    assert(n1 == Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 100000).count())
    // REPLACE swaps the definition in place
    spark.sql("CREATE OR REPLACE TEMP VIEW big_orders AS " +
      "SELECT o_orderkey FROM orders WHERE o_totalprice > 200000")
    assert(spark.table("big_orders").columns.toSeq == Seq("o_orderkey"))
    spark.sql("DROP VIEW big_orders")
  }

  test("CTAS and INSERT INTO work through the SQL surface") {
    Tables.registerAll(spark, sf)
    spark.sql("DROP TABLE IF EXISTS region_copy")
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, "region_copy")
    if (wh.exists()) { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }; rm(wh) }
    spark.sql("CREATE TABLE region_copy USING parquet AS SELECT * FROM region")
    assert(spark.table("region_copy").count() == 5)
    spark.sql("INSERT INTO region_copy VALUES (99, 'ATLANTIS')")
    assert(spark.table("region_copy").count() == 6)
    assert(spark.sql("SELECT r_name FROM region_copy WHERE r_regionkey = 99")
      .head.getString(0) == "ATLANTIS")
    spark.sql("DROP TABLE region_copy")
  }

  test("GraftExtensions injects every native function into a fresh context") {
    // getOrCreate returns the active session (ignoring extensions), so
    // clear the active/default pointers to force a NEW SparkSession on
    // the SHARED SparkContext — and never stop it (that would stop the
    // context under the rest of the suite).
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
          "size(graft_minhash_sig(array(1L, 2L))) AS m, " +
          "graft_simhash64(array(7L)) AS sh, " +
          "size(graft_shingles('a b c d', 3)) AS ns, " +
          "size(graft_hplsh(array(1.0D, 2.0D))) AS hp, " +
          "graft_zorder(0, 0) < graft_zorder(1, 1) AS zo, " +
          // PQ round-trip: 2 subspaces × 2 codewords over a 2-dim vector;
          // vector (1,9) encodes to codeword 0 then 1, and the ADC score
          // reads those two table cells back
          "graft_pq_encode(array(1.0D, 9.0D), array(1.0D, 5.0D, 2.0D, 9.0D), 2, 2) AS pq, " +
          "graft_pq_score(array(0, 1), array(10.0D, 20.0D, 30.0D, 40.0D), 2) AS ps, " +
          "size(graft_pq_table(array(1.0D, 9.0D), array(1.0D, 5.0D, 2.0D, 9.0D), 2, 2)) AS pt"
        ).head
      assert(r.getDouble(0) == 1.0)
      assert(r.getInt(1) == graft.functions.MinHashSig.NumPerm)
      assert(r.getLong(2) == 7L)
      assert(r.getInt(3) == 2)
      assert(r.getInt(4) == graft.functions.HyperplaneLsh.NumTables)
      assert(r.getBoolean(5))
      assert(r.getSeq[Int](6) == Seq(0, 1))
      assert(r.getDouble(7) == 10.0 + 40.0)
      assert(r.getInt(8) == 4)
      // the aggregate half of the surface: KMV sketch over a 3-row group
      val kr = s2.sql(
        "SELECT size(graft_kmv(x, 8)) AS n FROM VALUES (1), (2), (2) AS t(x)")
        .head
      assert(kr.getInt(0) == 2, "3 rows, 2 distinct -> 2 sketch entries")
      // bloom membership through the extensions route: a driver-built
      // filter embedded as a hex binary literal
      val bf = org.apache.spark.util.sketch.BloomFilter.create(4L, 0.01)
      bf.putLong(42L)
      val hex = graft.functions.BloomContains.serialize(bf)
        .map(b => f"$b%02X").mkString
      val br = s2.sql(
        s"SELECT graft_bloom_contains(42L, X'$hex') AS hit").head
      assert(br.getBoolean(0), "an inserted key must always hit")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  // ---- Unity Catalog REST client (A2/A3) against an in-process fake ----

  test("UC REST client: 3-part resolution, credential POST body, account " +
    "regex, error surface, per-call re-vending — certified end-to-end " +
    "against an in-process HTTP fake serving the documented JSON shapes") {
    import graft.sources.{UnityCatalogClient, UnityCatalogResolver}
    // a real local Delta table standing in for the vended cloud path
    val dir = java.nio.file.Files.createTempDirectory("graft-uc").toString
    val fixture = s"$dir/t1"
    graft.sources.DeltaWrite.write(
      spark.range(5).toDF("id"), fixture)
    val token = "test-token-123"
    val vendCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val lastPostBody = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/api/2.1/unity-catalog/tables/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        val name = ex.getRequestURI.getPath.split("/").last
        if (auth != s"Bearer $token") reply(ex, 401, """{"message":"bad token"}""")
        else if (name == "main.sales.t1") reply(ex, 200,
          """{"name":"t1","catalog_name":"main","schema_name":"sales",""" +
            """"table_id":"tid-42",""" +
            """"storage_location":"abfss://c@acct1.dfs.core.windows.net/t1"}""")
        else reply(ex, 404, s"""{"message":"table $name not found"}""")
      })
    server.createContext("/api/2.1/unity-catalog/temporary-table-credentials",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        lastPostBody.set(body)
        if (!body.contains("\"table_id\":\"tid-42\""))
          reply(ex, 404, """{"message":"unknown table_id"}""")
        else {
          vendCount.incrementAndGet()
          reply(ex, 200,
            """{"url":"abfss://c@acct1.dfs.core.windows.net/t1",""" +
              """"expiration_time":1893456000000,""" +
              """"azure_user_delegation_sas":{"sas_token":"sig=abc%3D"}}""")
        }
      })
    server.start()
    try {
      val host = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new UnityCatalogClient(host, token)
      // A2: table info over the wire
      val info = client.getTableInfo("main.sales.t1")
      assert(info.tableId == "tid-42")
      assert(info.storageLocation.contains(
        "abfss://c@acct1.dfs.core.windows.net/t1"))
      intercept[IllegalArgumentException](client.getTableInfo("just.two"))
      val nf = intercept[IllegalStateException](
        client.getTableInfo("main.sales.nope"))
      assert(nf.getMessage.contains("404") && nf.getMessage.contains("not found"))
      val bad = intercept[IllegalStateException](
        new UnityCatalogClient(host, "wrong").getTableInfo("main.sales.t1"))
      assert(bad.getMessage.contains("401"))
      // A3: credential vending — POST body shape and the account regex
      val cred = client.generateTempCredentials("tid-42", "read")
      assert(lastPostBody.get.contains("\"table_id\":\"tid-42\"") &&
        lastPostBody.get.contains("\"operation\":\"READ\""), lastPostBody.get)
      assert(cred.storageAccountName == "acct1") // /@([^.]+)\.dfs\./
      assert(cred.sasToken == "sig=abc%3D")
      assert(cred.deltaPath == cred.url)
      assert(cred.expirationTime == 1893456000000L)
      // the resolver: HTTP -> parse -> Hadoop-conf install -> Delta read,
      // with the vended cloud path located to the local fixture
      val resolver = new UnityCatalogResolver(client, locate = _ => fixture)
      val before = vendCount.get
      val df1 = resolver.resolve(spark, "main.sales.t1")
      assert(df1.count() == 5)
      assert(spark.sparkContext.hadoopConfiguration.get(
        "fs.azure.sas.fixed.token.acct1.dfs.core.windows.net") == "sig=abc%3D")
      // per-call re-vending: temporary credentials expire, so resolve()
      // must hit the vending endpoint EVERY time, never cache
      val df2 = resolver.resolve(spark, "main.sales.t1")
      assert(df2.count() == 5)
      assert(vendCount.get == before + 2, s"vended ${vendCount.get - before}x")
      // non-catalog refs bypass the client entirely (classification table)
      assert(resolver.resolve(spark, fixture).count() == 5)
      // a vended url the account regex cannot parse is an error, not a guess
      val noMatch = new UnityCatalogClient(host, token,
        httpCall = (_, _, _, _) => """{"url":"s3://bucket/t1",""" +
          """"azure_user_delegation_sas":{"sas_token":"x"}}""")
      val e2 = intercept[IllegalStateException](
        noMatch.generateTempCredentials("tid-42"))
      assert(e2.getMessage.contains("Could not extract storage account"))
    } finally server.stop(0)
  }

  test("direct ABFSS path + ambient SAS: account parse with the reference's " +
    "regex, env-account fallback, conf install, original-path read (A4/A5)") {
    import graft.sources.{AbfssSasResolver, AzureCredentials}
    val dir = java.nio.file.Files.createTempDirectory("graft-abfss").toString
    val fixture = s"$dir/t"
    graft.sources.DeltaWrite.write(spark.range(4).toDF("id"), fixture)
    // 1. account parsed from the path (delta-unity-duckdb.js:299-303)
    val r1 = new AbfssSasResolver(Some("sig=sas1"), None, locate = _ => fixture)
    assert(r1.resolve(spark,
      "abfss://cont@acct9.dfs.core.windows.net/tables/t").count() == 4)
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.azure.account.auth.type.acct9.dfs.core.windows.net") == "SAS")
    assert(hc.get("fs.azure.sas.fixed.token.acct9.dfs.core.windows.net") == "sig=sas1")
    // 2. unparseable path falls back to the configured account name
    //    (the reference's AZURE_STORAGE_ACCOUNT_NAME branch, :304-305)
    val r2 = new AbfssSasResolver(Some("sig=sas2"), Some("envacct"),
      locate = _ => fixture)
    assert(r2.resolve(spark, "abfss://short-form-path").count() == 4)
    assert(hc.get("fs.azure.sas.fixed.token.envacct.dfs.core.windows.net") == "sig=sas2")
    // 3. neither parseable nor configured: error, not a guess (:306-308)
    val e = intercept[IllegalStateException](
      new AbfssSasResolver(Some("s"), None).resolve(spark, "abfss://nope"))
    assert(e.getMessage.contains("storage account"))
    // 4. re-resolution refreshes the installed token (expiry semantics)
    val r3 = new AbfssSasResolver(Some("sig=sas3"), None, locate = _ => fixture)
    r3.resolve(spark, "abfss://c@acct9.dfs.core.windows.net/t").count()
    assert(hc.get("fs.azure.sas.fixed.token.acct9.dfs.core.windows.net") == "sig=sas3")
    // 5. no ambient SAS, or a non-ABFSS ref: plain path resolution
    assert(new AbfssSasResolver(None, None).resolve(spark, fixture).count() == 4)
    assert(new AbfssSasResolver(Some("s"), None).resolve(spark, fixture)
      .count() == 4)
    // the classification predicate itself (reference :271)
    assert(r1.isAbfssPath("abfss://a@b.dfs.core.windows.net/t"))
    assert(r1.isAbfssPath("https://x.dfs.core.windows.net/c/t"))
    assert(!r1.isAbfssPath("s3://bucket/t") && !r1.isAbfssPath("/local/p"))
    assert(AzureCredentials.accountFromAbfss("s3://bucket/t").isEmpty)
  }

  test("database OAuth credential client: request shape, bearer auth, " +
    "per-call re-vending into JDBC props (A22) — in-process HTTP fake") {
    import graft.sources.DatabaseCredentialClient
    val wsToken = "ws-token-9"
    val vendCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val lastBody = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/api/2.0/database/credentials",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        lastBody.set(body)
        if (auth != s"Bearer $wsToken") reply(ex, 401, """{"message":"denied"}""")
        else {
          val n = vendCount.incrementAndGet()
          reply(ex, 200,
            s"""{"token":"oauth-tok-$n","expiration_time":"2026-09-01T00:00:00Z"}""")
        }
      })
    server.start()
    try {
      val host = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new DatabaseCredentialClient(host, wsToken)
      val cred = client.generateDatabaseCredential("req-uuid-1", Seq("pg-instance-1"))
      assert(cred.token == "oauth-tok-1")
      assert(cred.expirationTime == "2026-09-01T00:00:00Z")
      // request body carries the id and the instance-name ARRAY
      assert(lastBody.get.contains("\"request_id\":\"req-uuid-1\"") &&
        lastBody.get.contains("\"instance_names\":[\"pg-instance-1\"]"),
        lastBody.get)
      // the token is the PG password (pg_connect.py:52), re-vended per call
      val p1 = client.jdbcProps("svc@example.com", "pg-instance-1")
      val p2 = client.jdbcProps("svc@example.com", "pg-instance-1")
      assert(p1("user") == "svc@example.com")
      assert(p1("password") == "oauth-tok-2" && p2("password") == "oauth-tok-3")
      assert(lastBody.get.contains("\"instance_names\":[\"pg-instance-1\"]"))
      // error surface: bad workspace token
      val bad = intercept[IllegalStateException](
        new DatabaseCredentialClient(host, "wrong")
          .generateDatabaseCredential("r", Seq("i")))
      assert(bad.getMessage.contains("401"))
      // malformed response: no token field is an error, not a guess
      val noTok = new DatabaseCredentialClient(host, wsToken,
        httpCall = (_, _, _, _) => """{"expiration_time":"x"}""")
      val e2 = intercept[IllegalStateException](
        noTok.generateDatabaseCredential("r", Seq("i")))
      assert(e2.getMessage.contains("no token"))
      // the diagnostic instance LISTING (test_db_instances.py:17-24):
      // name/id/state rows; an empty or field-less payload degrades to
      // empty strings / no rows, never a crash
      val lister = new DatabaseCredentialClient(host, wsToken,
        httpCall = (url, method, _, _) => {
          assert(url.endsWith("/api/2.0/database/instances") &&
            method == "GET", s"$method $url")
          """{"database_instances":[
            |{"name":"lakebase-test","id":"i-1","state":"AVAILABLE"},
            |{"name":"pg-2"}]}""".stripMargin
        })
      val insts = lister.listDatabaseInstances()
      assert(insts.map(_.name) == Seq("lakebase-test", "pg-2"))
      assert(insts.head.id == "i-1" && insts.head.state == "AVAILABLE")
      assert(insts(1).id == "" && insts(1).state == "")
      val none = new DatabaseCredentialClient(host, wsToken,
        httpCall = (_, _, _, _) => "{}")
      assert(none.listDatabaseInstances().isEmpty)
    } finally server.stop(0)
  }

  // ---- Multimodal plumbing ----

  test("multimodal: resize bounds metadata; frame sampling bounds fan-out") {
    import org.apache.spark.sql.functions.{max => smax}
    val media = Multimodal.syntheticMedia(spark, sf)
    val resized = Multimodal.resize(media, 640, 480).cache()
    assert(resized.count() == 500)
    assert(resized.filter(col("meta.width") > 640 || col("meta.height") > 480).count() == 0)
    // idempotent: resizing an already-small record is a no-op
    val twice = Multimodal.resize(resized, 640, 480)
    assert(twice.toDF().except(resized.toDF()).count() == 0)

    val frames = Multimodal.sampleFrames(media, intervalMs = 500, maxFrames = 8).cache()
    assert(frames.count() > 0)
    assert(frames.groupBy("media_id").count()
      .filter(col("count") > 8).count() == 0) // fan-out bounded
    assert(frames.agg(smax(col("frame_idx"))).head.getInt(0) <= 7)
  }

  test("multimodal: features are deterministic, fixed-dim, metadata prunes") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val f1 = Multimodal.extractFeatures(media).cache()
    assert(f1.count() == 500)
    assert(f1.filter(size(col("features")) =!= 16).count() == 0)
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, sf))
    assert(f1.select("media_id", "features").except(
      again.select("media_id", "features")).count() == 0)
    val pruned = Multimodal.filterByMeta(media.toDF(), 100, 100)
    assert(pruned.count() > 0 && pruned.count() < 500)
  }

  test("multimodal: REAL video containers are refused by the stub path " +
    "(dim = -1), never silently mis-embedded") {
    import spark.implicits._
    def mp4(n: Int): Array[Byte] = // ISO-BMFF: size box then 'ftyp'
      Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII") ++
        Array.fill[Byte](n)(7)
    val avi = "RIFF0000AVI ".getBytes("US-ASCII") ++ Array.fill[Byte](16)(3)
    val mkv = Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 1, 2)
    assert(Multimodal.videoContainerMagic(mp4(4)).contains("mp4"))
    assert(Multimodal.videoContainerMagic(avi).contains("avi"))
    assert(Multimodal.videoContainerMagic(mkv).contains("mkv/webm"))
    assert(Multimodal.videoContainerMagic("plain text".getBytes).isEmpty)
    val media = spark.createDataset(Seq(
      operators.MediaRecord(1L, "video", mp4(8),
        operators.MediaMeta("video/mp4", 0, 0, 1000L)),
      operators.MediaRecord(2L, "video", "fake payload".getBytes,
        operators.MediaMeta("application/x-graft-fake", 0, 0, 1000L))))
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f(0).dim == -1 && f(0).features.isEmpty,
      "a real MP4 must be refused, not stub-embedded")
    assert(f(1).dim == 16 && f(1).features.length == 16,
      "fake payloads still flow through the stub")
  }

  test("multimodal: container METADATA round-trips through the real " +
    "MP4/Matroska/AVI headers; truncated or corrupt boxes are refused " +
    "(VERDICT r8 item 4)") {
    import graft.operators.{AviMeta, MkvMeta, Mp4Meta}
    // writer → parser round trip, exact, for all three containers
    for (id <- 0L until 24L) {
      val ms = 1000L + (id % 997) * 37
      val (w, h) = ((160 + id % 64 * 4).toInt, (120 + id % 48 * 4).toInt)
      val bytes = (id % 3) match {
        case 0 => Mp4Meta.write(ms, w, h)
        case 1 => MkvMeta.write(ms, w, h)
        case _ => AviMeta.write(ms, w, h)
      }
      val m = Multimodal.videoContainerMeta(bytes)
      assert(m.isDefined, s"id=$id: parser refused its own writer")
      assert(m.get.durationMs == ms && m.get.width == w && m.get.height == h,
        s"id=$id: got ${m.get}")
    }
    // truncation at EVERY prefix length must refuse (None), never throw
    // or fabricate — the refusal path the stub embedding relies on
    for (full <- Seq(Mp4Meta.write(5000L, 320, 240),
      MkvMeta.write(5000L, 320, 240), AviMeta.write(5000L, 320, 240))) {
      for (cut <- 0 until full.length) {
        val m = Multimodal.videoContainerMeta(full.take(cut))
        assert(m.isEmpty, s"truncated at $cut of ${full.length}: got $m")
      }
    }
    // corrupt interior size fields must refuse, not mis-parse: blow up
    // the mvhd box's declared size / an EBML size byte / the avih size
    val mp4c = Mp4Meta.write(5000L, 320, 240)
    mp4c(mp4c.length - 205) = 0x7f // moov child box size corrupted
    val mkvc = MkvMeta.write(5000L, 320, 240)
    mkvc(5) = 0xff.toByte
    val avic = AviMeta.write(5000L, 320, 240)
    avic(16 + 4) = 0x7f // LIST size corrupted past EOF
    assert(Multimodal.videoContainerMeta(mkvc).isEmpty ||
      Multimodal.videoContainerMeta(mkvc).exists(_.durationMs == 5000L))
    Seq(mp4c, avic).foreach { c =>
      // either clean refusal or an unharmed parse — never an exception,
      // never a wrong number
      val m = Multimodal.videoContainerMeta(c)
      assert(m.isEmpty || m.exists(v => v.durationMs == 5000L &&
        v.width == 320 && v.height == 240), s"corrupt parse fabricated: $m")
    }
    // a refused payload in the feature path keeps dim = -1
    val media = spark.createDataset(Seq(operators.MediaRecord(9L, "video",
      Mp4Meta.write(5000L, 320, 240).take(30),
      operators.MediaMeta("video/mp4", 0, 0, 0L))))(
      org.apache.spark.sql.Encoders.product[operators.MediaRecord])
    val ff = Multimodal.extractFeatures(media).collect()
    assert(ff.head.dim == -1 && ff.head.features.isEmpty)
  }

  test("multimodal: MP4 SAMPLE TABLES round-trip — frameTable returns " +
    "the exact (offset, size) per frame, slicing reconstructs the frame " +
    "bytes, refusals stay loud (r11)") {
    import graft.operators.Mp4Meta
    for (id <- 0L until 12L) {
      val frames = (0 until (1 + id % 5).toInt).map { i =>
        Array.tabulate[Byte]((3 + (id + i) % 9).toInt)(k =>
          ((id * 31 + i * 7 + k) % 251).toByte)
      }
      val bytes = Mp4Meta.writeWithSamples(1000L + id, 320, 240, frames)
      // metadata parse still works on the sampled layout
      val m = Multimodal.videoContainerMeta(bytes)
      assert(m.exists(v => v.durationMs == 1000L + id && v.width == 320),
        s"id=$id meta: $m")
      val table = Mp4Meta.frameTable(bytes)
      assert(table.isDefined, s"id=$id: parser refused its own writer")
      assert(table.get.length == frames.length)
      table.get.zip(frames).foreach { case ((off, sz), want) =>
        assert(sz == want.length, s"id=$id size")
        val got = bytes.slice(off.toInt, (off + sz).toInt)
        assert(got.sameElements(want), s"id=$id frame bytes at $off")
      }
    }
    // truncation at every prefix refuses (None), never throws
    val full = Mp4Meta.writeWithSamples(5000L, 320, 240,
      Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5)))
    for (cut <- 0 until full.length)
      assert(Mp4Meta.frameTable(full.take(cut)).isEmpty, s"cut $cut")
    // a NON-TRIVIAL stsc (samples packed into shared chunks) refuses
    // instead of mis-slicing: flip the samples-per-chunk entry
    val idx = full.indexOfSlice("stsc".getBytes("US-ASCII"))
    val packed = full.clone()
    // body = idx+4 (after the type): ver/flags(4) count(4) first_chunk(4)
    // samples_per_chunk(4) — flip samples_per_chunk's low byte 1 → 2
    packed(idx + 4 + 4 + 4 + 4 + 3) = 2
    assert(Mp4Meta.frameTable(packed).isEmpty,
      "shared-chunk stsc must refuse, not guess offsets")

    // r12: the stsd codec declaration round-trips; absent stsd (the
    // metadata-only layout above) reads None; the codec-carrying
    // layout leaves frameTable, metadata parse, and frame bytes intact
    assert(Mp4Meta.sampleCodec(full).isEmpty, "no stsd → no codec")
    val pngFrames = Seq(Array[Byte](9, 8, 7), Array[Byte](6, 5))
    val withCodec = Mp4Meta.writeWithSamples(7000L, 64, 48, pngFrames,
      codec = Some("png "))
    assert(Mp4Meta.sampleCodec(withCodec).contains("png "))
    assert(Multimodal.videoContainerMeta(withCodec)
      .exists(v => v.durationMs == 7000L && v.width == 64 && v.height == 48))
    val ct = Mp4Meta.frameTable(withCodec)
    assert(ct.isDefined && ct.get.length == 2)
    ct.get.zip(pngFrames).foreach { case ((off, sz), want) =>
      assert(withCodec.slice(off.toInt, (off + sz).toInt).sameElements(want))
    }
    // and the q190 frame payload: a gray-ramp PNG decodes to exactly
    // base + 31x + 17y through the JDK reader (luma == gray channel)
    val png = Multimodal.grayRampPng(37, 4, 4)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = 37 + 31 * x + 17 * y
      assert((img.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
        s"pixel ($x,$y)")
    }
  }

  test("multimodal: MJPEG ('jpeg' fourcc) frames round-trip pixel-exact " +
    "for the solid-gray class — all 256 levels — and foreign fourccs " +
    "still refuse the q190/q193 dispatch (r13)") {
    import graft.operators.{Mp4Meta, Multimodal}
    // exhaustive: every gray level survives the JDK JPEG encode→decode
    // round-trip bit-exact (single DC-only MCU; the closed-form oracle
    // contract q193 rests on)
    for (v <- 0 until 256) {
      val jb = Multimodal.graySolidJpeg(v, 8, 8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jb))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
      for (y <- 0 until 8; x <- 0 until 8)
        assert((img.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
          s"gray $v pixel ($x,$y) -> ${img.getRGB(x, y) & 0xffffff}")
    }
    // full container: 'jpeg' stsd declaration + frame slices decode
    val frames = Seq(Multimodal.graySolidJpeg(17, 8, 8),
      Multimodal.graySolidJpeg(201, 8, 8))
    val payload = Mp4Meta.writeWithSamples(1234L, 8, 8, frames,
      codec = Some("jpeg"))
    assert(Mp4Meta.sampleCodec(payload).contains("jpeg"))
    val tbl = Mp4Meta.frameTable(payload).get
    tbl.zip(Seq(17, 201)).foreach { case ((off, sz), want) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        payload.slice(off.toInt, (off + sz).toInt)))
      assert((img.getRGB(3, 5) & 0xff) == want)
    }
    // the dispatch gate: a codec this engine cannot decode (h264's
    // 'avc1') is DECLARED, detected, and refused by the q190/q193
    // require — never handed to an image decoder
    val foreign = Mp4Meta.writeWithSamples(99L, 8, 8,
      Seq(Array[Byte](0, 0, 0, 1)), codec = Some("avc1"))
    assert(Mp4Meta.sampleCodec(foreign).contains("avc1"))
    intercept[IllegalArgumentException] {
      val fcc = Mp4Meta.sampleCodec(foreign)
      require(fcc.contains("jpeg"),
        s"stsd declares ${fcc.orNull}, not a decodable codec")
    }
  }

  test("container duration arithmetic on untrusted headers never " +
    "overflows Long — out-of-range values hit the None refusal, and the " +
    "writers refuse durations their 32-bit fields would truncate " +
    "(ADVICE r9)") {
    import graft.operators.{AviMeta, Mp4Meta}
    // ---- AVI: usPerFrame x frames, both uint32 from the wire ----
    def aviWith(usPerFrame: Long, frames: Long): Array[Byte] = {
      val b = AviMeta.write(1000L, 320, 240)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(32, usPerFrame.toInt) // avih body offset 0
      bb.putInt(32 + 16, frames.toInt) // dwTotalFrames
      b
    }
    // boundary: both at the 10^9 bound -> product 10^15, parses fine
    val ok = AviMeta.parse(aviWith(1000000000L, 1000000000L))
    assert(ok.exists(_.durationMs == 1000000000000000L)) // 10^18 us / 1000
    // one past the bound -> refusal (the raw product would be fine here,
    // but the bound is the contract; 0xFFFFFFFF x 0xFFFFFFFF overflows)
    assert(AviMeta.parse(aviWith(1000000001L, 1000L)).isEmpty)
    assert(AviMeta.parse(aviWith(0xFFFFFFFFL, 0xFFFFFFFFL)).isEmpty)
    // ---- MP4 v1 mvhd: 64-bit duration x 1000 ----
    def beI(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .putInt(v).array()
    def beL(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8)
      .putLong(v).array()
    def bx(name: String, body: Array[Byte]): Array[Byte] =
      beI(8 + body.length) ++ name.getBytes("US-ASCII") ++ body
    def mp4V1(duration: Long): Array[Byte] = {
      val mvhd = bx("mvhd", Array[Byte](1, 0, 0, 0) ++ // version 1
        new Array[Byte](16) ++ beI(1000) ++ beL(duration))
      val tkhd = bx("tkhd", new Array[Byte](4) ++
        beI(320 << 16) ++ beI(240 << 16))
      bx("moov", mvhd ++ bx("trak", tkhd))
    }
    val lim = Long.MaxValue / 1000L
    assert(Mp4Meta.parse(mp4V1(lim)).exists(_.durationMs == lim),
      "at the bound the v1 header still parses")
    assert(Mp4Meta.parse(mp4V1(lim + 1)).isEmpty,
      "one past the bound must refuse, not wrap negative")
    // ---- writers refuse what their 32-bit fields would truncate ----
    intercept[IllegalArgumentException](
      Mp4Meta.write(Int.MaxValue.toLong + 1, 320, 240))
    intercept[IllegalArgumentException](
      AviMeta.write(1000000001L, 320, 240))
    // in-range writes still round-trip
    assert(Mp4Meta.parse(Mp4Meta.write(Int.MaxValue.toLong, 320, 240))
      .exists(_.durationMs == Int.MaxValue.toLong))
  }

  test("multimodal: REAL PNG payloads decode through javax.imageio — " +
    "pixel-exact grid features, header dims match metadata, stub only " +
    "for non-image kinds") {
    // solid-color hand check: encode a PNG of known gray, decode, and
    // every grid cell must be exactly that luminance, normalized
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, 0x808080))) // r=g=b=128 -> luma 128.0 exactly
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val gray = Multimodal.decodeImage(bos.toByteArray, dim = 16).get
    val expected = ((128.0 / 127.5) - 1.0).toFloat
    assert(gray.forall(v => math.abs(v - expected) < 1e-6f),
      s"solid gray must decode to uniform $expected: ${gray.toSeq}")

    // distributed path: 60 real PNG fixtures through extractFeatures
    val media = Multimodal.syntheticImageMedia(spark, 60).cache()
    assert(media.filter(r =>
      Multimodal.imageDims(r.payload) != Some((r.meta.width, r.meta.height)))
      .count() == 0, "header dims must verify declared metadata")
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 60)
    assert(feats.filter(f => f.features.length != 16).count() == 0)
    // real decode, not the stub: the stub on the same bytes differs
    val viaStub = media.collect()
      .map(r => r.media_id -> Multimodal.decodeStub(r.payload)).toMap
    val real = feats.collect().map(f => f.media_id -> f.features).toMap
    assert(real.keySet.forall(id => !real(id).sameElements(viaStub(id))),
      "image kind must take the imageio path")
    // deterministic across re-generation and distinct across images
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticImageMedia(spark, 60)).collect()
      .map(f => f.media_id -> f.features).toMap
    assert(real.forall { case (id, v) => v.sameElements(again(id)) })
    assert(real.values.map(_.toSeq).toSet.size == 60,
      "distinct images must embed distinctly")
    // and the vectors feed the ANN ops unchanged (same Array[Float] shape)
    assert(real.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("multimodal: REAL WAV payloads decode through javax.sound.sampled — " +
    "header info verifies, silence → exact -1 envelope, stub only for video") {
    // silence hand-check: a zero-sample WAV has RMS 0 in every bucket →
    // normalized envelope exactly -1
    val silent = {
      val w = Multimodal.syntheticWav(0L, 8000, 125)
      // zero out the PCM data, keep the valid RIFF header
      java.util.Arrays.fill(w, 44, w.length, 0.toByte); w
    }
    val env = Multimodal.decodeAudio(silent, dim = 16).get
    assert(env.forall(_ == -1.0f), s"silence must be exactly -1: ${env.toSeq}")

    // header verification: the JDK codec reads back exactly what the
    // hand-assembled RIFF header declares
    val clip = Multimodal.syntheticWav(7L, 8000, 125)
    assert(Multimodal.audioInfo(clip) == Some((8000, 1000L, 125L)))

    // garbage bytes are rejected (fallback seam), not crashed on
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)

    // a µ-law WAV parses in the JDK but is NOT linear PCM — it must
    // fall through to the stub, not be misread as linear samples
    val ulaw = Multimodal.syntheticWav(1L, 8000, 125).clone()
    def le16(off: Int, v: Int): Unit = {
      ulaw(off) = (v & 0xff).toByte; ulaw(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(off: Int, v: Int): Unit = { le16(off, v & 0xffff); le16(off + 2, v >>> 16) }
    le16(20, 7)        // wFormatTag: µ-law
    le32(28, 8000)     // byte rate: 1 byte/sample mono
    le16(32, 1)        // block align
    le16(34, 8)        // bits per sample
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(ulaw)).getFormat
    assert(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ULAW,
      s"fixture must parse as µ-law, got ${fmt.getEncoding}")
    assert(Multimodal.decodeAudio(ulaw).isEmpty,
      "companded audio must fall back to the stub, not decode as linear")

    // distributed path: 40 real WAV fixtures through extractFeatures
    val media = Multimodal.syntheticAudioMedia(spark, 40).cache()
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 40)
    assert(feats.filter(f => f.features.length != 16).count() == 0)
    // real decode, not the stub
    val viaStub = media.collect()
      .map(r => r.media_id -> Multimodal.decodeStub(r.payload)).toMap
    val real = feats.collect().map(f => f.media_id -> f.features).toMap
    assert(real.keySet.forall(id => !real(id).sameElements(viaStub(id))),
      "audio kind must take the javax.sound path")
    // deterministic across re-generation, distinct across clips, bounded
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticAudioMedia(spark, 40)).collect()
      .map(f => f.media_id -> f.features).toMap
    assert(real.forall { case (id, v) => v.sameElements(again(id)) })
    assert(real.values.map(_.toSeq).toSet.size == 40,
      "distinct clips must embed distinctly")
    assert(real.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
  }
}
