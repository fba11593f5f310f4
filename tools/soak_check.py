#!/usr/bin/env python3
"""Per-query oracle parity runner for large-SF soaks.

Same compare as tools/check.py, but each query's DuckDB oracle runs in
its own subprocess under a wall-clock timeout, so a super-linear oracle
mirror (e.g. the exact-uncapped pairwise behind q11/q12) can't hang the
whole soak — it gets recorded as ORACLE-TIMEOUT instead. Spark-side
results must already be dumped by graft.Verify.

usage: soak_check.py <outDir> <sfDir> [timeoutSec] [query ...]
"""
import json
import os
import subprocess
import sys


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    only = sys.argv[4:]
    with open(f"{out_dir}/oracle_sql.json") as f:
        names = sorted(json.load(f).keys())
    if only:
        names = [n for n in names if n in only]
    # degrade-not-error defaults for the per-query DuckDB (overridable):
    # bounded threads + memory so the heaviest oracle spills under box
    # contention instead of erroring (r13's one zipf-sf1 soak failure)
    env = dict(os.environ)
    env.setdefault("GRAFT_DUCK_THREADS", "8")
    env.setdefault("GRAFT_DUCK_MEM", "24GB")
    results = {}
    for name in names:
        try:
            p = subprocess.run(
                [sys.executable, "tools/check.py", out_dir, sf_dir, name],
                capture_output=True, text=True, timeout=timeout, env=env)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith(("PASS", "FAIL", "SKIP"))]
            results[name] = line[0] if line else f"NO-OUTPUT rc={p.returncode}"
        except subprocess.TimeoutExpired:
            results[name] = f"ORACLE-TIMEOUT >{timeout}s"
        verdict = results[name].split()[0]
        print(f"{verdict:>14}  {name}", flush=True)
        if verdict != "PASS":
            # keep the WHY (first differing cell / exception / rc) — a
            # transient oracle OOM under load looks identical to a real
            # mismatch without it
            print(f"                detail: {results[name][:400]}", flush=True)
    counts = {}
    for v in results.values():
        counts[v.split()[0]] = counts.get(v.split()[0], 0) + 1
    print("==", ", ".join(f"{k}={v}" for k, v in sorted(counts.items())), "==")


if __name__ == "__main__":
    main()
