"""Interleaved A/B engine timing: alternate subprocess runs of
tools/tok_parity.py time between two checkouts so both sides sample the
same host-throttle state (the discipline BENCH/BASELINE.md prescribes).

    python tools/ab_engine.py <dir_A> <dir_B> [rounds] [ndocs]

Prints per-round walls and the median of paired B/A ratios.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def run_once(d: str, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "tools/tok_parity.py", "time", str(n)],
        cwd=d,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 3000
    ratios_tok, ratios_full = [], []
    for r in range(rounds):
        order = [(a, "A"), (b, "B")] if r % 2 == 0 else [(b, "B"), (a, "A")]
        res = {}
        for d, label in order:
            res[label] = run_once(d, n)
            print(f"round {r} {label}: {res[label]}", flush=True)
        ratios_tok.append(res["A"]["tok"] / res["B"]["tok"])
        ratios_full.append(res["A"]["full"] / res["B"]["full"])
    print(f"paired A/B tok ratios:  {[round(x, 3) for x in ratios_tok]}")
    print(f"paired A/B full ratios: {[round(x, 3) for x in ratios_full]}")
    print(
        f"median A/B: tok {statistics.median(ratios_tok):.3f} "
        f"full {statistics.median(ratios_full):.3f}"
    )


if __name__ == "__main__":
    main()
