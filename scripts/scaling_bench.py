#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule): run the identical encode
job at local[N] and local[4N] in fresh JVMs on the same cached input, report
throughput at both plus efficiency = thr(4N) / (4 * thr(N)).

Writes BENCH_SCALING.json at the repo root and prints it.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_ENCODE_ROWS": str(rows),
        "BENCH_QUERIES": "roundtrip_sha",  # keep the query leg minimal
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(os.environ.get("SCALING_N", "8"))
    rows = int(os.environ.get("BENCH_ENCODE_ROWS", "200000"))
    # warm run builds the parquet cache so both timed runs read identical input
    run_at(n, rows)
    lo = run_at(n, rows)["encode"]
    hi = run_at(4 * n, rows)["encode"]
    eff = hi["gbps"] / (4 * lo["gbps"])
    result = {
        "n_cpus": n, "gbps_n": lo["gbps"], "sec_n": lo["sec"],
        "4n_cpus": 4 * n, "gbps_4n": hi["gbps"], "sec_4n": hi["sec"],
        "scaling_efficiency": round(eff, 3),
        "rows": rows, "gb": lo["gb"],
        "target": ">= 0.8 per north_rule",
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
