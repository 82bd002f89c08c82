package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random differential matrix for the r12 dialect bridges —
  * comma-lateral generate_series / unnest(generate_series), multi-VALUE
  * and aliased-item UNPIVOT, unaliased multi-agg PIVOT, and the
  * exact-count reservoir(p%) sample. Every expected value below was
  * computed by the INSTALLED DuckDB 1.0 on the identical inline data
  * (seed 1212; the generator builds both sides from the same VALUES
  * text). Row/column rendering: columns joined with ';', rows with '|',
  * cells with ',' and NULL for null — ORDER BY in each statement makes
  * the rendering total (ties only between fully identical rows).
  * reservoir-percent cases compare the COUNT contract only (the drawn
  * rows differ across engines by design, q173's rule). */
class DuckCompatMatrixR12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duck-matrix-r12")
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

  // (setup SQL or "", query, DuckDB-expected rendering)
  private val Cases: Seq[(String, String, String)] = Seq(
    ("",
      "SELECT x, i FROM (VALUES (3), (5), (4)) t(x), generate_series(1, 5) AS g(i) ORDER BY x, i",
      "x;i#3,1|3,2|3,3|3,4|3,5|4,1|4,2|4,3|4,4|4,5|5,1|5,2|5,3|5,4|5,5"),
    ("",
      "SELECT x, j FROM (VALUES (3), (1), (1), (4)) t(x), unnest(generate_series(1, x)) AS u(j) ORDER BY x, j",
      "x;j#1,1|1,1|3,1|3,2|3,3|4,1|4,2|4,3|4,4"),
    ("",
      "SELECT x, generate_series FROM (VALUES (5), (5), (1), (4)) t(x), generate_series(2, 5) ORDER BY x, generate_series",
      "x;generate_series#1,2|1,3|1,4|1,5|4,2|4,3|4,4|4,5|5,2|5,2|5,3|5,3|5,4|5,4|5,5|5,5"),
    ("",
      "SELECT x, i FROM (VALUES (4)) t(x), generate_series(0, 3) AS g(i) ORDER BY x, i",
      "x;i#4,0|4,1|4,2|4,3"),
    ("",
      "SELECT x, i, j FROM (VALUES (4)) t(x), generate_series(0, 3) AS g(i), unnest(generate_series(1, x)) AS u(j) ORDER BY x, i, j",
      "x;i;j#4,0,1|4,0,2|4,0,3|4,0,4|4,1,1|4,1,2|4,1,3|4,1,4|4,2,1|4,2,2|4,2,3|4,2,4|4,3,1|4,3,2|4,3,3|4,3,4"),
    ("",
      "SELECT x, i, j FROM (VALUES (1)) t(x), generate_series(1, 4) AS g(i), unnest(generate_series(1, x)) AS u(j) ORDER BY x, i, j",
      "x;i;j#1,1,1|1,2,1|1,3,1|1,4,1"),
    ("",
      "SELECT x, j FROM (VALUES (2)) t(x), unnest(generate_series(1, x)) AS u(j) ORDER BY x, j",
      "x;j#2,1|2,2"),
    ("",
      "SELECT x, j FROM (VALUES (4)) t(x), unnest(generate_series(1, x)) AS u(j) ORDER BY x, j",
      "x;j#4,1|4,2|4,3|4,4"),
    ("",
      "SELECT x, j FROM (VALUES (3), (1)) t(x), unnest(generate_series(1, x)) AS u(j) ORDER BY x, j",
      "x;j#1,1|3,1|3,2|3,3"),
    ("",
      "SELECT x, j FROM (VALUES (1), (2), (2), (4)) t(x), unnest(generate_series(1, x)) AS u(j) ORDER BY x, j",
      "x;j#1,1|2,1|2,1|2,2|2,2|4,1|4,2|4,3|4,4"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_0 AS SELECT * FROM (VALUES (3, 0, 0, 5), (9, 7, 7, 0), (8, CAST(NULL AS INT), 2, CAST(NULL AS INT)), (CAST(NULL AS INT), 9, 5, 9)) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_0 ON (c1, c2) AS 'ab', (c3, c4) INTO NAME k VALUE p, q ORDER BY k, p, q",
      "k;p;q#ab,3,0|ab,9,7|c3_c4,0,5|c3_c4,5,9|c3_c4,7,0"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_1 AS SELECT * FROM (VALUES (1, 0, CAST(NULL AS INT), 1), (1, 7, CAST(NULL AS INT), CAST(NULL AS INT)), (0, CAST(NULL AS INT), 9, 4)) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_1 ON (c2, c4) INTO NAME k VALUE a, b ORDER BY k, a, b, c1, c3",
      "c1;c3;k;a;b#1,NULL,c2_c4,0,1"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_2 AS SELECT * FROM (VALUES (CAST(NULL AS INT), CAST(NULL AS INT), 2, CAST(NULL AS INT)), (0, 1, 6, CAST(NULL AS INT))) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_2 ON c1 AS 'one', c2, c3 INTO NAME k VALUE v ORDER BY k, v, c4",
      "c4;k;v#NULL,c2,1|NULL,c3,2|NULL,c3,6|NULL,one,0"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_3 AS SELECT * FROM (VALUES (4, 4, 1, 6), (6, 2, CAST(NULL AS INT), 7), (CAST(NULL AS INT), 8, 7, CAST(NULL AS INT)), (2, CAST(NULL AS INT), CAST(NULL AS INT), 5)) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_3 ON c1 AS 'one', c2, c3 INTO NAME k VALUE v ORDER BY k, v, c4",
      "c4;k;v#7,c2,2|6,c2,4|NULL,c2,8|6,c3,1|NULL,c3,7|5,one,2|6,one,4|7,one,6"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_4 AS SELECT * FROM (VALUES (CAST(NULL AS INT), 2, 5, 8), (2, 4, CAST(NULL AS INT), 2), (CAST(NULL AS INT), 6, 1, 4), (6, 9, 8, CAST(NULL AS INT))) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_4 ON (c1, c2) AS 'ab', (c3, c4) INTO NAME k VALUE p, q ORDER BY k, p, q",
      "k;p;q#ab,2,4|ab,6,9|c3_c4,1,4|c3_c4,5,8"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_5 AS SELECT * FROM (VALUES (1, 4, 8, 9), (2, CAST(NULL AS INT), 5, 0), (5, 7, CAST(NULL AS INT), 1)) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_5 ON (c1, c2) AS 'ab', (c3, c4) INTO NAME k VALUE p, q ORDER BY k, p, q",
      "k;p;q#ab,1,4|ab,5,7|c3_c4,5,0|c3_c4,8,9"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_6 AS SELECT * FROM (VALUES (8, 3, 8, 0), (5, 6, 2, 8)) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_6 ON c1 AS 'one', c2, c3 INTO NAME k VALUE v ORDER BY k, v, c4",
      "c4;k;v#0,c2,3|8,c2,6|8,c3,2|0,c3,8|8,one,5|0,one,8"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_up_7 AS SELECT * FROM (VALUES (3, 7, 2, CAST(NULL AS INT)), (CAST(NULL AS INT), 7, 7, CAST(NULL AS INT))) t(c1, c2, c3, c4)",
      "UNPIVOT r12_up_7 ON c1 AS 'one', c2, c3 INTO NAME k VALUE v ORDER BY k, v, c4",
      "c4;k;v#NULL,c2,7|NULL,c2,7|NULL,c3,2|NULL,c3,7|NULL,one,3"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_pv_0 AS SELECT * FROM (VALUES ('b', 'y', 6), ('c', 'y', 3), ('c', 'y', 9)) t(g, p, v)",
      "PIVOT r12_pv_0 ON p USING sum(v), count(*) GROUP BY g ORDER BY g",
      "g;y_sum(v);y_count_star()#b,6,1|c,12,2"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_pv_1 AS SELECT * FROM (VALUES ('a', 'x', 2), ('b', 'x', 3), ('b', 'x', 2), ('a', 'y', 2)) t(g, p, v)",
      "PIVOT r12_pv_1 ON p USING sum(v), count(*) GROUP BY g ORDER BY g",
      "g;x_sum(v);x_count_star();y_sum(v);y_count_star()#a,2,1,2,1|b,5,2,NULL,0"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_pv_2 AS SELECT * FROM (VALUES ('a', 'x', 9), ('b', 'y', 8), ('a', 'x', 7), ('a', 'y', 1), ('b', 'x', 9)) t(g, p, v)",
      "PIVOT r12_pv_2 ON p USING sum(v), count(*) GROUP BY g ORDER BY g",
      "g;x_sum(v);x_count_star();y_sum(v);y_count_star()#a,16,2,1,1|b,9,1,8,1"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_pv_3 AS SELECT * FROM (VALUES ('b', 'x', 9), ('b', 'y', 2), ('c', 'x', 8)) t(g, p, v)",
      "PIVOT r12_pv_3 ON p USING sum(v), count(*) GROUP BY g ORDER BY g",
      "g;x_sum(v);x_count_star();y_sum(v);y_count_star()#b,9,1,2,1|c,8,1,NULL,0"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_pv_4 AS SELECT * FROM (VALUES ('a', 'y', 5), ('c', 'y', 4), ('c', 'x', 6), ('c', 'x', 6)) t(g, p, v)",
      "PIVOT r12_pv_4 ON p USING sum(v), count(*) GROUP BY g ORDER BY g",
      "g;x_sum(v);x_count_star();y_sum(v);y_count_star()#a,NULL,0,5,1|c,12,2,4,1"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_pv_5 AS SELECT * FROM (VALUES ('b', 'y', 1), ('a', 'y', 7), ('b', 'y', 6), ('c', 'x', 4), ('b', 'y', 6), ('b', 'x', 1)) t(g, p, v)",
      "PIVOT r12_pv_5 ON p USING sum(v), count(*) GROUP BY g ORDER BY g",
      "g;x_sum(v);x_count_star();y_sum(v);y_count_star()#a,NULL,0,7,1|b,1,1,13,3|c,4,1,NULL,0"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_0 AS SELECT * FROM range(82) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_0 USING SAMPLE reservoir(66.7%)",
      "55"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_1 AS SELECT * FROM range(262) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_1 USING SAMPLE reservoir(50%)",
      "131"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_2 AS SELECT * FROM range(375) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_2 USING SAMPLE reservoir(5%)",
      "19"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_3 AS SELECT * FROM range(121) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_3 USING SAMPLE reservoir(33%)",
      "40"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_4 AS SELECT * FROM range(196) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_4 USING SAMPLE reservoir(50%)",
      "98"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_5 AS SELECT * FROM range(25) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_5 USING SAMPLE reservoir(66.7%)",
      "17"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_6 AS SELECT * FROM range(66) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_6 USING SAMPLE reservoir(5%)",
      "3"),
    ("CREATE OR REPLACE TEMPORARY VIEW r12_rs_7 AS SELECT * FROM range(328) r(i)",
      "COUNTONLY:SELECT * FROM r12_rs_7 USING SAMPLE reservoir(100%)",
      "328")
  )

  test("32 seeded random r12-bridge statements match the installed " +
    "DuckDB exactly (comma-lateral series, UNPIVOT multi/alias, PIVOT " +
    "multi-agg, reservoir percent counts)") {
    Cases.foreach { case (setup, query, want) =>
      if (setup.nonEmpty) spark.sql(setup)
      try runCase(query, want)
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case scala.util.control.NonFatal(e) =>
          fail(s"case raised for: $query\n${e.getMessage}", e)
      }
    }
  }

  private def runCase(query: String, want: String): Unit = {
    {
      if (query.startsWith("COUNTONLY:")) {
        val q = query.stripPrefix("COUNTONLY:")
        val got = graft.DuckDialect.sql(spark, q).count()
        assert(got.toString == want, s"$q: count $got, want $want")
      } else {
        val got = render(graft.DuckDialect.sql(spark, query))
        assert(got == want, s"$query:\n got $got\nwant $want")
      }
    }
  }
}
