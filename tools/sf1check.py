#!/usr/bin/env python3
"""Per-query sf1 oracle check with an individual time budget per oracle.

The monolithic localverify run at sf1 exceeded a 30-minute wall budget
(two or three of the 27 candidate-family oracles are quadratic-ish in
DuckDB at 50k docs); this wrapper runs each oracle in its own process
with its own timeout so one slow oracle cannot erase the evidence for
the other 26.
Usage: python3 tools/sf1check.py <outDir> <sfDir> [budget_s] [names]
`names` (optional, comma-separated) restricts the run to a subset of
the dumped queries — lets several instances shard a heavy sfN oracle
pass across the box instead of serializing 15-minute budgets.
"""
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from localverify import TABLES, canon, cell  # noqa: E402


def check_one(name, sql, out_dir, sf_dir, q):
    import duckdb
    import pandas as pd

    try:
        con = duckdb.connect()
        # A spill path + explicit limit make heavy sfN oracles degrade to
        # disk instead of dying: curation_dsir_weights OOM'd at sf10 under
        # box contention (a 32g-JVM bench beside 3-way oracle shards ate
        # the headroom DuckDB's default 80%-of-RAM limit assumes it has),
        # then PASSed in 81 s solo with these settings.
        # Spill path anchored to the REPO's tmp/, not the caller's cwd
        # (r11 advice: only sf10check.sh guaranteed cwd=/root/repo).
        tmp_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "tmp", "duck_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp_dir}'")
        # Memory limit derived from what the box actually has, split by
        # the declared shard count (r11 advice: the old fixed 90GB only
        # worked because runs were solo — on a smaller box it RAISED the
        # limit above DuckDB's 80%-of-RAM default, and 3 shards x 90GB
        # over-committed). GRAFT_DUCK_SHARDS = concurrent sf1check
        # instances (default 1); GRAFT_DUCK_MEM_GB overrides outright.
        mem_gb = os.environ.get("GRAFT_DUCK_MEM_GB")
        if mem_gb is None:
            avail_kb = 64 * 1024 * 1024  # conservative fallback
            try:  # non-Linux / restricted /proc keeps the fallback
                with open("/proc/meminfo") as f:
                    for line in f:
                        if line.startswith("MemAvailable:"):
                            avail_kb = int(line.split()[1])
                            break
            except OSError:
                pass
            shards = max(1, int(os.environ.get("GRAFT_DUCK_SHARDS", "1")))
            # ceiling 90GB even when the box could nominally give more:
            # 0.8*MemAvailable on an idle 128GB box is 104GB, and that
            # limit let the dsir oracle exhaust SYSTEM memory (malloc
            # "bad allocation" at sf10, round 12) where the 90GB limit
            # spills to temp_directory and passes — DuckDB needs the
            # gap for pandas materialization and allocator slack.
            mem_gb = min(90, max(4, int(avail_kb / 1024 / 1024 * 0.8 / shards)))
        con.execute(f"SET memory_limit='{mem_gb}GB'")
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        exp = canon(con.execute(sql).df())
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        if list(exp.columns) != list(got.columns):
            q.put(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            return
        if len(exp) != len(got):
            q.put(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            return
        exp_rows = [tuple(cell(v) for v in r) for r in exp.itertuples(index=False)]
        got_rows = [tuple(cell(v) for v in r) for r in got.itertuples(index=False)]
        if exp_rows == got_rows:
            q.put(f"PASS {name} ({len(exp)} rows)")
        else:
            bad = next(i for i, (a, b) in enumerate(zip(exp_rows, got_rows)) if a != b)
            q.put(f"FAIL {name}: first diff at row {bad}: oracle={exp_rows[bad]} spark={got_rows[bad]}")
    except Exception as e:
        q.put(f"FAIL {name}: {e}")


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracles if os.path.exists(f"{out_dir}/{n}"))
    if len(sys.argv) > 4:
        keep = set(sys.argv[4].split(","))
        names = [n for n in names if n in keep]
    n_pass = n_fail = n_skip = 0
    for name in names:
        q = mp.Queue()
        p = mp.Process(target=check_one, args=(name, oracles[name], out_dir, sf_dir, q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"SKIP {name}: oracle exceeded {budget:.0f}s budget", flush=True)
            n_skip += 1
            continue
        # blocking get with a grace timeout, not q.empty(): the feeder
        # thread's data can still be in flight right after p.join(), and
        # the empty() probe misreported finished checks as crashes
        try:
            msg = q.get(timeout=5)
        except Exception:
            msg = f"FAIL {name}: no result (crashed)"
        print(msg, flush=True)
        if msg.startswith("PASS"):
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} oracle-timeout ==", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
