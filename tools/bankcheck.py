#!/usr/bin/env python3
"""Close-time tripwires for the cross-run bench bank.

Default mode — is bench_bank.json still valid for this tree?
Replicates graft.Bench.codeKey (SHA-256 over sorted (path, bytes) of
src/main/scala, '<n>-<hex>' plus the '-c<cpus>' suffix) byte-for-byte,
and additionally requires bank format v2 (per-run medians — the v1
recency pool was retired round 14, r13 advice). Run before the
end-of-round handoff: a STALE bank means some src/main/scala edit
landed after the last full-registry bench run, so the driver's
bench-day run would silently fall back to single-run evidence —
re-run `graft.Bench` (unfiltered) to re-seed before closing.

--regress mode (r13 verdict #3) — did the last full run regress any
query vs its banked history? Reads bench_run.json, which graft.Bench
writes at final emission: this-run steady medians plus the
floor-normalized comparison against the bank that was loaded AT RUN
START (pure prior history — the bank on disk now already contains the
run's own vote, so recomputing here would self-compare). Prints the
verdict line for ROUND_NOTES; exit 0 = no flagged regressions.

Usage: python3 tools/bankcheck.py [cpus=32]
       python3 tools/bankcheck.py --regress
"""
import hashlib
import json
import os
import sys


def code_key(cpus: str) -> str:
    files = []
    for root, _dirs, names in os.walk("src/main/scala"):
        for n in names:
            p = os.path.join(root, n)
            if os.path.isfile(p):
                files.append(p)
    files.sort()
    md = hashlib.sha256()
    for p in files:
        md.update(p.encode("utf-8"))
        md.update(b"\x00")
        with open(p, "rb") as f:
            md.update(f.read())
        md.update(b"\x00")
    return f"{len(files)}-{md.hexdigest()}-c{cpus}"


def regress() -> int:
    try:
        run = json.load(open("bench_run.json"))
    except (OSError, ValueError) as e:
        print(f"REGRESS-UNKNOWN: bench_run.json unreadable ({e}) — "
              "run graft.Bench (unfiltered) first")
        return 1
    flagged = run.get("flagged", {})
    floor = run.get("floor_ratio", "?")
    nq = run.get("n_queries", "?")
    if not flagged:
        print(f"REGRESS-CLEAN: {nq} executed queries within 1.5x of their "
              f"banked envelope (box floor {floor}x)")
        return 0
    print(f"REGRESS-FLAGGED: {len(flagged)} of {nq} queries exceed 1.5x "
          f"their banked envelope after floor normalization ({floor}x):")
    for q, v in sorted(flagged.items()):
        print(f"  {q}: run {v.get('run')}s vs banked {v.get('banked')}s")
    return 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--regress":
        return regress()
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    key = code_key(cpus)
    try:
        bank = json.load(open("bench_bank.json"))
    except (OSError, ValueError) as e:
        print(f"STALE: bench_bank.json unreadable ({e})")
        return 1
    runs = bank.get("runs", "?")
    nq = len(bank.get("samples", {}))
    if bank.get("key") == key and bank.get("fmt") == 2:
        print(f"MATCH: bank valid for this tree ({nq} queries, {runs} runs, "
              f"sf {bank.get('sf')}, fmt 2)")
        return 0
    if bank.get("fmt") != 2:
        print("STALE: bank is pre-v2 (flat sample pool) — re-run graft.Bench "
              "(unfiltered) to re-seed in the per-run-median format")
    else:
        print("STALE: bank key does not match this tree — re-run graft.Bench "
              "(unfiltered) before handoff")
        print(f"  tree: {key}")
        print(f"  bank: {bank.get('key')}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
