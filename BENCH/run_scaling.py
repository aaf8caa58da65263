"""Scaling-efficiency evidence (BASELINE.json north rule): the same
extraction job at two parallelism levels on identical input.

No real cluster exists in this sandbox, so N vs 4N executors is
evidenced as local[8] vs local[32] (separate JVMs, same corpus, same
code). Efficiency = (throughput_32 / throughput_8) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    r8 = run_bench(8)
    r32 = run_bench(32)
    thr8 = r8["extract_docs_per_sec"]
    thr32 = r32["extract_docs_per_sec"]
    eff = round((thr32 / thr8) / 4.0, 3)
    result = {
        "docs_per_sec_local8": thr8,
        "docs_per_sec_local32": thr32,
        "scaling_efficiency": eff,
        "target": 0.8,
        "bench_docs": r8["bench_docs"],
        "queries_local8": r8["queries"],
        "queries_local32": r32["queries"],
    }
    md = f"""# BENCH/BASELINE.md -- measured scaling evidence

Same job, same deterministic seed-42 corpus ({r8["bench_docs"]} span-docs,
log-normal sizes + mega-doc tail), two parallelism levels in separate
JVMs. Timings are best-of-2 per query (noisy multi-tenant host).

| config | extraction docs/sec | extract wall (s) |
|---|---|---|
| local[8]  | {thr8} | {r8["queries"]["extract_main"]} |
| local[32] | {thr32} | {r32["queries"]["extract_main"]} |

**Scaling efficiency (8 -> 32 threads, N -> 4N): {eff}** (criterion: >= 0.8)

Full per-query seconds:

| query | local[8] | local[32] |
|---|---|---|
"""
    for q in r8["queries"]:
        md += f"| {q} | {r8['queries'][q]} | {r32['queries'][q]} |\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
