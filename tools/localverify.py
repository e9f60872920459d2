#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/localverify.py <outDir> <sfDir>

<outDir> is what `graft.Verify` wrote (one parquet dir per query +
oracle_sql.json). For each query: run the oracle SQL in DuckDB over views
named after the parquet tables in <sfDir>, load the Spark parquet, sort
columns by name, and compare values row-by-row. Exit nonzero on mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver sorts rows by ALL columns before hashing; replicate it so
    # unsortable cell types (numpy arrays from list columns, mixed
    # None/str object columns) fail HERE, not in the driver's round gate.
    try:
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    except TypeError as e:
        # name the offending column so the regression is self-explanatory
        for c in df.columns:
            try:
                df[c].sort_values()
            except TypeError:
                raise TypeError(
                    f"output column {c!r} (dtype {df[c].dtype}) is not "
                    f"row-sortable — the driver's gate would crash on this "
                    f"output shape: {e}"
                ) from e
        raise
    return df


def cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if pd.api.types.is_scalar(v) and pd.isna(v):
        return None
    if isinstance(v, float):
        return ("f", repr(v))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("d", str(v.normalize()))
    except Exception:
        pass
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(cell(x) for x in v)
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os

    for t in TABLES:
        # driver corpora are single parquet FILES; ScaleUp-generated ones
        # (sf1) are Spark part-file DIRECTORIES — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional argv[3]: comma-list of query names — matches Verify's
    # SPARK_GRAFT_VERIFY_ONLY so a partial dump can be checked without
    # FAILing every query the dump deliberately skipped
    if len(sys.argv) > 3:
        only = {q.strip() for q in sys.argv[3].split(",") if q.strip()}
        missing = only - oracles.keys()
        if missing:
            print(f"WARN: filter names not in oracle_sql.json: {sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle {list(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            n_fail += 1
            continue
        exp_rows = [tuple(cell(v) for v in r) for r in exp.itertuples(index=False)]
        got_rows = [tuple(cell(v) for v in r) for r in got.itertuples(index=False)]
        if exp_rows == got_rows:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(exp_rows, got_rows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  oracle: {exp_rows[bad]}")
            print(f"  spark : {got_rows[bad]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
