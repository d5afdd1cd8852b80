#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <name> parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same
scale-factor tables, sorts columns by name and rows by all columns, and
compares values exactly (floats: exact after the query-side rounding).
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                raise AssertionError(f"columns {list(g.columns)} != {list(e.columns)}")
            # The driver's hash tolerates integer width (int32 vs int64
            # hash identically in pandas) but NOT int-vs-float/object —
            # DuckDB HUGEINT (raw sum()) surfaces as float64/object and
            # fails the gate (round-4 ta_report et al). Emulate that.
            def norm(d):
                # lowercase first: pandas nullable 'Int64' must match 'int64'
                d = str(d).lower()
                return "int" if d.startswith(("int", "uint")) else d
            gd, ed = [norm(d) for d in g.dtypes], [norm(d) for d in e.dtypes]
            if gd != ed:
                raise AssertionError(f"dtypes {gd} != {ed}")
            if len(g) != len(e):
                raise AssertionError(f"rows {len(g)} != {len(e)}")
            for c in g.columns:
                gv, ev = g[c].tolist(), e[c].tolist()
                for i, (a, b) in enumerate(zip(gv, ev)):
                    an = a is None or (isinstance(a, float) and math.isnan(a))
                    bn = b is None or (isinstance(b, float) and math.isnan(b))
                    if an and bn:
                        continue
                    if an != bn or a != b:
                        raise AssertionError(f"col {c} row {i}: {a!r} != {b!r}")
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
