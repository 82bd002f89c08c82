#!/usr/bin/env python3
"""Local differential check: Spark results (graft.Verify output) vs DuckDB.

Mimics the driver's t2 gate: for each query in oracle_sql.json, run the
oracle SQL in DuckDB over the same parquet tables, canonicalize both sides
(sort columns by name, sort rows), and compare EXACTLY (floats bit-equal —
the corpus is engineered so they are). Reports per-query verdicts.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # Columns reorder by name (the driver does the same before hashing);
    # rows stay in RESULT ORDER — every oracled query declares a total
    # ORDER BY, and Verify writes coalesce(1) after the global sort, so
    # both sides' row sequences are comparable as-is. (ADVICE r01: the
    # old set-sorted compare could not catch ORDER BY violations that the
    # driver's order-sensitive hash would flag.)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [cols[i] for i in order], out


def rows_sorted(rows):
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        # Harness-compat gate (r10 q174): the driver calls .df() on the
        # statement result; anything non-SELECT-shaped returns None there.
        # Head extraction skips leading comments and '(' (ADVICE r11): a
        # parenthesized SELECT/set-op or a leading -- / /* */ comment is
        # result-returning and must not be misclassified.
        s_head = sql.strip()
        while True:
            if s_head.startswith("--"):
                nl = s_head.find("\n")
                s_head = "" if nl < 0 else s_head[nl + 1:].lstrip()
            elif s_head.startswith("/*"):
                e = s_head.find("*/")
                s_head = "" if e < 0 else s_head[e + 2:].lstrip()
            elif s_head.startswith("("):
                s_head = s_head[1:].lstrip()
            else:
                break
        head = s_head.split(None, 1)[0].upper() if s_head else ""
        if head not in ("SELECT", "WITH", "PIVOT", "UNPIVOT", "FROM",
                        "VALUES", "DESCRIBE", "SUMMARIZE"):
            print(f"FAIL {name}: [harness-gate] oracle SQL starts with "
                  f"'{head}' — driver's .df() is None for non-SELECT")
            n_bad += 1
            continue
        try:
            d = con.execute(sql)
            dcols = [c[0] for c in d.description]
            drows = d.fetchall()
            s = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [c[0] for c in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        # Harness-compat gate (r10 q172): the driver canonicalizes through
        # pandas, which cannot sort ndarray/dict cells — any LIST/STRUCT
        # cell that survives to here fails at the driver even though the
        # tuple-based compare below would pass it.
        complex_cells = [
            c for rows_side, cols_side in ((sr, sc), (dr, dc))
            for row in rows_side
            for c, v in zip(cols_side, row)
            if isinstance(v, (tuple, list, dict))
        ]
        if complex_cells:
            print(f"FAIL {name}: [harness-gate] non-scalar cells in columns "
                  f"{sorted(set(complex_cells))} — driver's pandas sort "
                  f"cannot handle array cells; serialize via "
                  f"array_to_string/to_json on both sides")
            n_bad += 1
            continue
        if dc != sc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_bad += 1
        elif len(dr) != len(sr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_bad += 1
        elif dr != sr:
            n_bad += 1
            if rows_sorted(dr) == rows_sorted(sr):
                print(f"FAIL {name}: same rows, DIFFERENT ORDER "
                      f"(ORDER BY violated or not total)")
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            else:
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                print(f"FAIL {name}: values differ, first diffs (spark vs duck):")
            for a, b in diffs:
                print(f"   S={a}\n   D={b}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(sr)} rows)")
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
