#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads each query's Spark-written parquet from OUTDIR, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the same sf tables,
and compares: column names (sorted), dtypes (loosely), and values
(rows sorted by all columns). Exit 1 on any mismatch.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures, passed = [], []
    present = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    # authoritative name list: the Verify-written manifest (covers queries
    # that crashed before writing anything); fall back to dirs + oracles
    manifest = os.path.join(out_dir, "queries.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            names = sorted(json.load(f))
    else:
        names = sorted(set(present) | set(oracles))
    for name in names:
        if name not in present:
            failures.append((name, "query produced NO output (failed in Verify?)"))
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet")); continue
        spark_df = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}")); continue
        sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
        if sc != oc:
            failures.append((name, f"columns differ: spark={sc} oracle={oc}"))
            continue
        a = spark_df[sc]; b = oracle_df[oc]
        if len(a) != len(b):
            failures.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
            continue
        dtype_mismatch = [c for c in sc if str(a[c].dtype) != str(b[c].dtype)]
        if dtype_mismatch:
            failures.append((name, "dtypes differ: " + "; ".join(
                f"{c}: spark={a[c].dtype} oracle={b[c].dtype}" for c in dtype_mismatch)))
            continue
        try:
            import pandas as pd
            # Deliberately NO canonicalization of array cells: the driver's
            # comparator sorts raw frames and crashes on ndarray cells, so
            # gate queries must serialize arrays (array_join / to_json).
            # Keeping this strict means local-green == driver-green.
            def canon(df):
                return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
            a2, b2 = canon(a), canon(b)
            eq = a2.equals(b2)
            if not eq:
                # cell-level diff for debugging
                diffs = []
                for c in a2.columns:
                    if not a2[c].equals(b2[c]):
                        mism = (a2[c] != b2[c])
                        try:
                            idx = mism[mism].index[:3].tolist()
                        except Exception:
                            idx = []
                        diffs.append(f"{c} (e.g. rows {idx}: "
                                     f"spark={[a2[c].iloc[i] for i in idx]} "
                                     f"oracle={[b2[c].iloc[i] for i in idx]})")
                failures.append((name, "values differ in: " + "; ".join(diffs)))
                continue
        except Exception as e:
            failures.append((name, f"compare error: {e}")); continue
        passed.append(name)
        print(f"[ok] {name}: {len(a)} rows")

    print(f"\n{len(passed)} passed, {len(failures)} failed")
    for n, msg in failures:
        print(f"[FAIL] {n}: {msg}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
