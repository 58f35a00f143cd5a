#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate (BASELINE.md).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with views over the same
sf parquet tables, and compares: schema (column names, sorted), row count,
and values (exact for non-floats; bit-exact for floats by default,
reporting max abs diff when not equal).
"""
import json, sys, math, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by their string repr for order-insensitive compare
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=repr), [cols[i] for i in idx]

def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; ScaleUp-generated fixtures are
        # Spark-written directories — glob the parts in that case
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # targeted reruns / long-run visibility: CHECK_ONLY / CHECK_SKIP are
    # comma-separated query names; every PASS/FAIL line carries wall
    # seconds and flushes immediately (a 70-minute opaque run at sf1
    # motivated this)
    only = {x for x in os.environ.get("CHECK_ONLY", "").split(",") if x}
    skip = {x for x in os.environ.get("CHECK_SKIP", "").split(",") if x}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_rows, g_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.sql(sql)
            e_rows, e_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as ex:
            print(f"FAIL {name}: exception {ex}", flush=True)
            n_fail += 1
            continue
        # The real driver canonicalizes with pandas sort_values + hash, which
        # CRASHES on array-typed result columns (round-1 q_normalize:
        # "unhashable type: numpy.ndarray"). Mirror that: any list-valued
        # column is a hard FAIL here even though our tuple compare could
        # handle it — local PASS must imply driver PASS.
        arrayish = [c for c, v in zip(g_cols, g_rows[0] if g_rows else [])
                    if isinstance(v, (list, tuple))]
        if arrayish:
            print(f"FAIL {name}: array-typed result columns {arrayish} "
                  f"(driver's pandas compare cannot hash these — emit scalars)", flush=True)
            n_fail += 1
            continue
        g_rows, g_cols = canon(g_rows, g_cols)
        e_rows, e_cols = canon(e_rows, e_cols)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns spark={g_cols} oracle={e_cols}", flush=True)
            n_fail += 1
            continue
        # The driver canonicalizes BOTH sides through pandas before hashing, so
        # dtypes are part of the hash: DuckDB HUGEINT (sum over BIGINT) becomes
        # float64 while Spark's parquet int64 stays int64 — value-identical
        # frames hash-mismatch (round-5 q_burst_detect / q_lm_score). Mirror
        # that: any per-column pandas dtype difference is a hard FAIL here —
        # local PASS must imply driver PASS.
        g_dt = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df().dtypes
        e_dt = con.sql(sql).df().dtypes
        dt_bad = [(c, str(g_dt[c]), str(e_dt[c])) for c in g_cols
                  if str(g_dt[c]) != str(e_dt[c])]
        if dt_bad:
            print(f"FAIL {name}: pandas dtype mismatch (spark vs oracle): "
                  f"{dt_bad} — CAST the oracle (HUGEINT sums need AS BIGINT)", flush=True)
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} oracle={len(e_rows)}", flush=True)
            n_fail += 1
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(g_rows, e_rows)):
            if not values_equal(list(gr), list(er)):
                bad = (i, gr, er)
                break
        if bad:
            i, gr, er = bad
            print(f"FAIL {name}: first mismatch row {i}:\n  spark : {gr}\n  oracle: {er}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows, {time.time()-t0:.1f}s)",
                  flush=True)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
