package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random differential matrix for the r13 bridges — the
  * unaliased comma-unnest of a plain column (both reference spellings:
  * the default `unnest` qualifier and an explicit table alias), series
  * CHAINS followed by a plain table (whole-chain deferral, ADVICE r12),
  * and the statement-GLOBAL COLUMNS alias dedup (duckdb .df()
  * semantics, ADVICE r12). Every expected value below was computed by
  * the INSTALLED DuckDB on identical data (seed 1313; the generator
  * creates the same rows in both engines). Rendering matches
  * DuckCompatMatrixR12Spec: columns ';'-joined, '#', rows '|', cells
  * ',' with NULL for null. */
class DuckCompatMatrixR13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duck-matrix-r13")
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

  // (setup SQL, query, DuckDB-expected rendering)
  private val Cases: Seq[(String, String, String)] = Seq(
    ("CREATE OR REPLACE TEMPORARY VIEW mcu0 AS SELECT 1 AS id, array(80,55) AS tg UNION ALL SELECT 2, array(27,86)",
      "SELECT id, unnest.tg AS v FROM mcu0, unnest(tg) ORDER BY id, v",
      "id;v#1,55|1,80|2,27|2,86"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcu0 AS SELECT 1 AS id, array(80,55) AS tg UNION ALL SELECT 2, array(27,86)",
      "SELECT id, u.tg AS v FROM mcu0, unnest(tg) u ORDER BY id, v",
      "id;v#1,55|1,80|2,27|2,86"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcu1 AS SELECT 1 AS id, array(48,34) AS tg UNION ALL SELECT 2, array(38,67)",
      "SELECT id, unnest.tg AS v FROM mcu1, unnest(tg) ORDER BY id, v",
      "id;v#1,34|1,48|2,38|2,67"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcu1 AS SELECT 1 AS id, array(48,34) AS tg UNION ALL SELECT 2, array(38,67)",
      "SELECT id, u.tg AS v FROM mcu1, unnest(tg) u ORDER BY id, v",
      "id;v#1,34|1,48|2,38|2,67"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcu2 AS SELECT 1 AS id, array(48,44) AS tg UNION ALL SELECT 2, array(21,21)",
      "SELECT id, unnest.tg AS v FROM mcu2, unnest(tg) ORDER BY id, v",
      "id;v#1,44|1,48|2,21|2,21"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcu2 AS SELECT 1 AS id, array(48,44) AS tg UNION ALL SELECT 2, array(21,21)",
      "SELECT id, u.tg AS v FROM mcu2, unnest(tg) u ORDER BY id, v",
      "id;v#1,44|1,48|2,21|2,21"),
    ("",
      "SELECT x, i, j, y FROM (VALUES (2),(4)) t(x), generate_series(1,2) g(i), generate_series(1, 2) h(j), (VALUES (8)) u(y) ORDER BY x, i, j",
      "x;i;j;y#2,1,1,8|2,1,2,8|2,2,1,8|2,2,2,8|4,1,1,8|4,1,2,8|4,2,1,8|4,2,2,8"),
    ("",
      "SELECT x, i, j, y FROM (VALUES (2),(4)) t(x), generate_series(2,4) g(i), generate_series(1, 2) h(j), (VALUES (8)) u(y) ORDER BY x, i, j",
      "x;i;j;y#2,2,1,8|2,2,2,8|2,3,1,8|2,3,2,8|2,4,1,8|2,4,2,8|4,2,1,8|4,2,2,8|4,3,1,8|4,3,2,8|4,4,1,8|4,4,2,8"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS('^a') AS z, COLUMNS('b') AS z FROM mcd",
      "z;z_1;z_2;z_3#11,22,22,33"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT ba AS z, COLUMNS('^a') AS z FROM mcd",
      "z;z_1;z_2#33,11,22"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT aa, COLUMNS('^a') FROM mcd",
      "aa;aa_1;ab#11,11,22"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS('^a') AS z, ab AS q, COLUMNS('^b') AS z FROM mcd",
      "z;z_1;q;z_2#11,22,22,33"),
    // COLUMNS(* REPLACE …) (r13): replaced columns keep position, take
    // the expression, and are named by the alias's SPELLING — every
    // expectation duckdb-verified this round
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS(* REPLACE (aa + 10 AS aa)) FROM mcd",
      "aa;ab;ba#21,22,33"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS(* REPLACE (aa + 10 AS aa, ba * 2 AS ba)) FROM mcd",
      "aa;ab;ba#21,22,66"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS(* REPLACE (aa + 10 AS AA)) FROM mcd",
      "AA;ab;ba#21,22,33"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS(* EXCLUDE (ab) REPLACE (aa + 10 AS aa)) FROM mcd",
      "aa;ba#21,33"),
    ("CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab, 33 AS ba",
      "SELECT COLUMNS(* REPLACE (aa + 10 AS aa)) AS z FROM mcd",
      "z;z_1;z_2#21,22,33"))

  test("r13 bridge matrix: every bridged answer equals DuckDB's") {
    Cases.foreach { case (setup, query, want) =>
      if (setup.nonEmpty) spark.sql(setup)
      val got = render(DuckDialect.sql(spark, query))
      assert(got == want, s"\nquery: $query\n want: $want\n  got: $got")
    }
  }

  test("COLUMNS REPLACE refusals mirror DuckDB's errors; wrapped forms " +
      "stay guidance (r13)") {
    spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW mcd AS SELECT 11 AS aa, 22 AS ab")
    // unknown target → DuckDB binder error
    val e1 = intercept[IllegalArgumentException](DuckDialect.sql(spark,
      "SELECT COLUMNS(* REPLACE (aa + 1 AS zz)) FROM mcd"))
    assert(e1.getMessage.contains("not found"), e1.getMessage)
    // same column in EXCLUDE and REPLACE → DuckDB parser error
    val e2 = intercept[IllegalArgumentException](DuckDialect.sql(spark,
      "SELECT COLUMNS(* EXCLUDE (aa) REPLACE (aa + 1 AS aa)) FROM mcd"))
    assert(e2.getMessage.contains("both"), e2.getMessage)
    // r14: the single-function wrap BRIDGES with DuckDB's derived
    // spelling (DuckCompatMatrixR14Spec pins the rendering matrix);
    // r15 second pass: NESTED binaries render the parse tree too
    // (DuckCompatMatrixR15bSpec pins the shapes)
    val w = DuckDialect.sql(spark,
      "SELECT max(COLUMNS(* REPLACE (aa + 1 AS aa))) FROM mcd")
    assert(w.columns.toSeq == Seq("max(aa := (aa + 1))", "ab"))
    val w2 = DuckDialect.sql(spark,
      "SELECT max(COLUMNS(* REPLACE (aa + 1 + ab AS aa))) FROM mcd")
    assert(w2.columns.toSeq == Seq("max(aa := ((aa + 1) + ab))", "ab"))
  }
}
