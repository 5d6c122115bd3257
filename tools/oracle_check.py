#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read each query's parquet
dump (written by graft.Verify), run the oracle SQL in DuckDB against the same
sf dir, sort columns by name + rows by values, and compare."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp precisions; widen int/float widths — width is an
    # engine artifact, but int-vs-float (e.g. DuckDB HUGEINT -> float64 from
    # an uncast sum(BIGINT)) is dtype drift the driver's hash DOES see, so
    # canon must NOT erase that distinction (see compare()).
    import datetime
    for c in df.columns:
        dt = df[c].dtype
        if str(dt).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt == object:
            # Spark DATE parquet -> pandas object-of-datetime.date while
            # DuckDB DATE -> datetime64; the driver treats them as equal,
            # so normalize dates BEFORE the strict dtype gate
            nn = df[c].dropna()
            # check ALL values, not a head sample: a mixed column (dates
            # first, strings later) must take the stringify branch instead
            # of exploding inside pd.to_datetime
            if len(nn) and all(isinstance(v, datetime.date) and not isinstance(v, datetime.datetime) for v in nn):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                # DuckDB HUGEINT can surface as object-of-Python-int; keep it
                # distinguishable from int64 by stringifying (int64 col stays
                # int64, object col becomes str -> dtype mismatch below).
                df[c] = df[c].astype(str)
        elif np.issubdtype(dt, np.signedinteger) or np.issubdtype(dt, np.unsignedinteger):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(dt, np.floating):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, oracle_df):
    problems = []
    if list(spark_df.columns) != list(oracle_df.columns):
        return [f"schema mismatch: spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}"]
    if len(spark_df) != len(oracle_df):
        return [f"row count: spark={len(spark_df)} oracle={len(oracle_df)}"]
    # dtype-strict gate: the driver hashes canonical dtypes along with values,
    # so int64-vs-float64 drift (values equal) is a DRIVER failure even though
    # float coercion would hide it. Fail loudly here so local green predicts
    # driver green (this exact class shipped q26 in r2 and w02 in r3).
    for c in spark_df.columns:
        da, db = spark_df[c].dtype, oracle_df[c].dtype
        if str(da) != str(db):
            problems.append(f"col {c}: DTYPE mismatch spark={da} oracle={db} (driver hash is dtype-sensitive; cast the oracle)")
    if problems:
        return problems
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            aa = a.astype(float).to_numpy(); bb = b.astype(float).to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            eq = (aa == bb) | both_nan
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(f"col {c}: {int((~eq).sum())} diffs, first at row {i}: {aa[i]!r} vs {bb[i]!r}")
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(f"col {c}: {int((~eq).sum())} diffs, first at row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
    return problems

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p)])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            status = "ROWS" if len(spark_df) > 0 else "FAIL(empty)"
            if status.startswith("FAIL"): n_fail += 1
            else: n_pass += 1
            print(f"{status} {name}: {len(spark_df)} rows (no oracle)")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # int-width drift is widened by canon on the assumption the driver
        # normalizes width; surface it so a driver that turns out to be
        # width-sensitive is debuggable from the local log
        for c in set(spark_df.columns) & set(oracle_df.columns):
            da, db = str(spark_df[c].dtype), str(oracle_df[c].dtype)
            if da != db and da.startswith(("int", "uint")) and db.startswith(("int", "uint")):
                print(f"WARN {name}: col {c} int width spark={da} oracle={db} "
                      "(widened to int64 locally; driver may be stricter)")
        # one bad column must fail THIS query, not kill the whole run
        try:
            problems = compare(name, canon(spark_df), canon(oracle_df))
        except Exception as e:
            problems = [f"canon/compare raised: {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
        else:
            n_pass += 1
            print(f"PASS {name}: {len(spark_df)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    sys.exit(main(outdir, sfdir))
