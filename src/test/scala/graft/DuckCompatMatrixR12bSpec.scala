package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random differential matrix for the second-session r12
  * bridges — COLUMNS(c -> predicate) lambdas and
  * unnest(struct, recursive := true). Every expected value below was
  * computed by the INSTALLED DuckDB 1.0 on identical data (seed 1213;
  * the generator creates the same table in both engines). Rendering
  * matches DuckCompatMatrixR12Spec: columns ';'-joined, '#', rows '|',
  * cells ',' with NULL for null. */
class DuckCompatMatrixR12bSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duck-matrix-r12b")
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
    ("CREATE OR REPLACE TEMPORARY VIEW mxl0 AS SELECT 79 AS bc, 74 AS ax, 51 AS kb, 25 AS ab",
      "SELECT COLUMNS(c -> c LIKE 'k%') FROM mxl0",
      "kb#51"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxl0 AS SELECT 79 AS bc, 74 AS ax, 51 AS kb, 25 AS ab",
      "SELECT max(COLUMNS(c -> len(c) = 2)) FROM mxl0",
      "bc;ax;kb;ab#79,74,51,25"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxl1 AS SELECT 72 AS ab, 36 AS ax, 97 AS ba, 38 AS ka",
      "SELECT COLUMNS(c -> c LIKE '%b') FROM mxl1",
      "ab#72"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxl1 AS SELECT 72 AS ab, 36 AS ax, 97 AS ba, 38 AS ka",
      "SELECT max(COLUMNS(c -> len(c) = 2)) FROM mxl1",
      "ab;ax;ba;ka#72,36,97,38"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxl2 AS SELECT 54 AS ba, 43 AS ab, 65 AS kb, 79 AS ka",
      "SELECT COLUMNS(c -> c LIKE 'k%') FROM mxl2",
      "kb;ka#65,79"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxl2 AS SELECT 54 AS ba, 43 AS ab, 65 AS kb, 79 AS ka",
      "SELECT max(COLUMNS(c -> len(c) = 2)) FROM mxl2",
      "ba;ab;kb;ka#54,43,65,79"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxs0 AS SELECT 1 AS k, named_struct('x', 9, 'n', named_struct('z', 74, 'b', 'q')) AS s",
      "SELECT k, unnest(s, recursive := true) FROM mxs0",
      "k;x;z;b#1,9,74,q"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxs1 AS SELECT 2 AS k, named_struct('x', 7, 'n', named_struct('z', 39, 'b', 'q')) AS s",
      "SELECT k, unnest(s, recursive := true) FROM mxs1",
      "k;x;z;b#2,7,39,q"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxs2 AS SELECT 3 AS k, named_struct('x', 5, 'n', named_struct('a', 81, 'b', 'q')) AS s",
      "SELECT k, unnest(s, recursive := true) FROM mxs2",
      "k;x;a;b#3,5,81,q"),
    ("CREATE OR REPLACE TEMPORARY VIEW mxsc AS SELECT named_struct('b', 5, 'n', named_struct('b', 7, 'x', named_struct('b', 9))) AS s",
      "SELECT unnest(s, recursive := true) FROM mxsc",
      "b;b_1;b_2#5,7,9"),
    // mid-list comma-lateral series (r12, second session): the series
    // item defers to the FROM-clause end — DuckDB-verified rows
    ("",
      "SELECT x, i, y FROM (VALUES (3), (5)) t(x), generate_series(1, 3) AS g(i), (VALUES (7)) u(y) ORDER BY x, i, y",
      "x;i;y#3,1,7|3,2,7|3,3,7|5,1,7|5,2,7|5,3,7"),
    ("",
      "SELECT x, j, y FROM (VALUES (2), (3)) t(x), unnest(generate_series(1, x)) AS u(j), (VALUES (9)) v(y) ORDER BY x, j",
      "x;j;y#2,1,9|2,2,9|3,1,9|3,2,9|3,3,9"),
    ("",
      "SELECT x, i, j FROM (VALUES (2)) t(x), generate_series(1, 2) AS g(i), (VALUES (0)) z(w), unnest(generate_series(1, i)) AS u(j) ORDER BY i, j",
      "x;i;j#2,1,1|2,2,1|2,2,2"))

  test("r12b bridge matrix: every bridged answer equals DuckDB's") {
    Cases.foreach { case (setup, query, want) =>
      if (setup.nonEmpty) spark.sql(setup)
      val got = render(DuckDialect.sql(spark, query))
      assert(got == want, s"\nquery: $query\n want: $want\n  got: $got")
    }
  }
}
