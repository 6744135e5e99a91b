#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: schema (column names), row count, and a hash of the sorted rows
(columns sorted by name, values stringified, rows sorted).

Comparison goes through PANDAS on both sides (spark parquet via pyarrow,
oracle via duckdb .df()) because that is how the driver stringifies values.
This is load-bearing: DuckDB HUGEINT (sum of integers, list_sum) becomes
float64 in pandas and prints "123.0" where Spark's int64 prints "123" —
an oracle that leaves an integer aggregate un-CAST will hash-mismatch even
though fetchall()-based comparison passes. Keep integer aggregates
CAST(... AS BIGINT) in oracle SQL.
"""
import sys, json, glob, os, hashlib, datetime
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    cols = sorted(df.columns)
    out = []
    for r in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in r:
            if isinstance(v, float):
                v = repr(v)
            elif isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                # driver tolerates Spark DATE vs DuckDB midnight TIMESTAMP
                # (q14_date passed r01); normalize to the timestamp form
                v = f"{v} 00:00:00"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.md5("\x02".join(out).encode()).hexdigest()


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        try:
            got = pq.ParquetDataset(files).read().to_pandas()
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        if canon_df(got) != canon_df(want):
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            cols = sorted(got.columns)
            gs = sorted(tuple(map(str, r)) for r in got[cols].itertuples(index=False, name=None))
            ws = sorted(tuple(map(str, r)) for r in want[cols].itertuples(index=False, name=None))
            shown = 0
            for g, w in zip(gs, ws):
                if g != w and shown < 3:
                    print(f"   spark: {g}\n   duck : {w}")
                    shown += 1
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
