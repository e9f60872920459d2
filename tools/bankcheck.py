#!/usr/bin/env python3
"""Close-time tripwire: is bench_bank.json still valid for this tree?

Replicates graft.Bench.codeKey (SHA-256 over sorted (path, bytes) of
src/main/scala, '<n>-<hex>' plus the '-c<cpus>' suffix) byte-for-byte.
Run before the end-of-round handoff: a STALE bank means some
src/main/scala edit landed after the last full-registry bench run, so
the driver's bench-day run would silently fall back to single-run
evidence — re-run `graft.Bench` (unfiltered) to re-seed before closing.

Usage: python3 tools/bankcheck.py [cpus=32]   (exit 0 = MATCH)
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


def main() -> int:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    key = code_key(cpus)
    try:
        bank = json.load(open("bench_bank.json"))
    except (OSError, ValueError) as e:
        print(f"STALE: bench_bank.json unreadable ({e})")
        return 1
    runs = bank.get("runs", "?")
    nq = len(bank.get("samples", {}))
    if bank.get("key") == key:
        print(f"MATCH: bank valid for this tree ({nq} queries, {runs} runs, "
              f"sf {bank.get('sf')})")
        return 0
    print("STALE: bank key does not match this tree — re-run graft.Bench "
          "(unfiltered) before handoff")
    print(f"  tree: {key}")
    print(f"  bank: {bank.get('key')}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
