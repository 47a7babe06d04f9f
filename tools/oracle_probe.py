#!/usr/bin/env python3
"""Pre-validate SparkEntry.oracleSql against a Verify output dir.

Usage: python3 tools/oracle_probe.py <sfDir> <verifyOutDir>

Mimics the driver's t2 check: for each key in oracle_sql.json, run the
SQL in DuckDB 1.0.0 with views named after the parquet tables in sfDir,
load the Spark result parquet, sort columns by name, and compare
row-by-row (exact after string normalization) plus a sorted-rows
comparison. Prints PASS/FAIL per key.
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def temporal_to_int(t):
    """Cast date/timestamp columns of an arrow table to epoch integers
    (days / µs). Python's datetime.date tops out at year 9999, so a
    year-10000 DATE (date_add over a 9999 sentinel order — valid in
    BOTH engines) is unrepresentable by ANY pandas/object path; epoch
    integers compare instant-exactly at any year, identically on both
    sides, with NULLs surviving as nulls."""
    import pyarrow as pa
    cols = []
    for f_ in t.schema:
        c = t.column(f_.name)
        if pa.types.is_date32(f_.type):
            c = c.cast(pa.int32())
        elif pa.types.is_date64(f_.type) or pa.types.is_timestamp(f_.type):
            c = c.cast(pa.int64())
        cols.append(c)
    return pa.table(cols, names=t.schema.names)

def read_pq(f):
    import pyarrow.parquet as pq
    return temporal_to_int(pq.read_table(f)).to_pandas()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def frames_equal(w, g):
    """Tolerance-free equality. Numeric columns compare numerically:
    values must be bitwise-equal as floats (so -0.0 vs 0.0 and
    exponent-formatting differences can't produce spurious FAILs) and
    NaN/NULL positions must MATCH — a NaN on one side against a value
    on the other is a FAILURE (the divergence signal the old
    astype(str) compare masked via 'nan' == 'nan'), while NULLs both
    engines agree on (e.g. lag() first rows) still compare equal.
    Non-numeric columns compare as pandas strings."""
    for c in w.columns:
        ws, gs = w[c], g[c]
        w_num = np.issubdtype(ws.dtype, np.number)
        g_num = np.issubdtype(gs.dtype, np.number)
        if w_num != g_num:
            return False
        if w_num and np.issubdtype(ws.dtype, np.integer) and np.issubdtype(gs.dtype, np.integer):
            # exact integer equality — the float path would cast through
            # float64 and silently equate int64 values differing only
            # above 2^53 (a 48-bit fold times a multiplier gets there)
            if not np.array_equal(ws.to_numpy(), gs.to_numpy()):
                return False
        elif w_num:
            wf, gf = ws.to_numpy().astype(float), gs.to_numpy().astype(float)
            wn, gn = np.isnan(wf), np.isnan(gf)
            if not np.array_equal(wn, gn):
                return False
            if not np.array_equal(wf[~wn], gf[~gn]):
                return False
        else:
            # normalize null markers before the string compare: a DATE
            # column arrives as datetime64 (NaT) from duckdb but as
            # object (None) from Spark parquet — same NULL, different
            # string form ('NaT' vs 'None')
            wsn = ws.astype(str).where(ws.notna(), "<NULL>").to_numpy()
            gsn = gs.astype(str).where(gs.notna(), "<NULL>").to_numpy()
            if not (wsn == gsn).all():
                return False
    return True

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Match the driver's parallelism (local[32]) unless overridden:
    # multi-threaded DuckDB changes float-aggregation reduction order,
    # which is exactly the hash surface the probe must exercise.
    con.execute(f"SET threads TO {os.environ.get('PROBE_THREADS', '32')}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        try:
            # arrow + temporal_to_int on BOTH sides: the date/timestamp
            # columns become epoch ints in the same units, so the dtype
            # classes and values line up exactly (see temporal_to_int)
            want = temporal_to_int(con.execute(sql).arrow()).to_pandas()
        except Exception as e:
            print(f"FAIL {key}: duckdb error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark output parquet")
            n_fail += 1
            continue
        got = pd.concat([read_pq(f) for f in sorted(files)])
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {key}: columns {list(g.columns)} != oracle {list(w.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {key}: rows {len(g)} != oracle {len(w)}")
            n_fail += 1
            continue
        exact = frames_equal(w, g)
        ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        sorted_eq = frames_equal(ws, gs)
        if exact:
            print(f"PASS {key} ({len(w)} rows)")
            n_pass += 1
        elif sorted_eq:
            print(f"PASS(sorted-only) {key} ({len(w)} rows) — row order differs!")
            n_pass += 1
        else:
            diff = (ws.astype(str) != gs.astype(str)).any(axis=1)
            idx = ws.index[diff][:3]
            print(f"FAIL {key}: value mismatch; first differing sorted rows {list(idx)}")
            for i in idx:
                print(f"  oracle: {ws.loc[i].to_dict()}")
                print(f"  spark : {gs.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
