"""Clean staged attribution of the per-doc engine cost: each stage is
timed as a FRESH cumulative pipeline (no shared lazy state), successive
differences give honest per-stage walls.

    python tools/engine_stages.py [ndocs] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from parse_html_spark.boilerplate import (  # noqa: E402
    TextMass,
    find_main_container,
    main_content_spans,
    pruned_ranges,
)
from parse_html_spark.fixtures import gen_doc  # noqa: E402
from parse_html_spark.pipeline import assemble  # noqa: E402
from parse_html_spark.tokenizer import DocIndex  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    pairs = [assemble(gen_doc(i)["spans"]) for i in range(n)]

    def s1():
        for h, _m in pairs:
            DocIndex(h)

    def s2():
        for h, _m in pairs:
            TextMass(DocIndex(h))

    def s3():
        for h, _m in pairs:
            d = DocIndex(h)
            find_main_container(d, TextMass(d))

    def s4():
        for h, _m in pairs:
            d = DocIndex(h)
            tm = TextMass(d)
            lo, hi = find_main_container(d, tm)
            pruned_ranges(d, tm, lo, hi)

    def s5():
        for h, m in pairs:
            main_content_spans(DocIndex(h), m)

    stages = [("tokenize", s1), ("+TextMass", s2), ("+container", s3),
              ("+prune", s4), ("full", s5)]
    best = {k: float("inf") for k, _ in stages}
    s5()  # warm
    for _ in range(reps):
        for k, f in stages:
            t0 = time.perf_counter()
            f()
            best[k] = min(best[k], time.perf_counter() - t0)
    prev = 0.0
    for k, _ in stages:
        v = best[k]
        print(f"{k:12s} cum {v * 1000:7.1f} ms   delta {(v - prev) * 1000:7.1f} ms")
        prev = v


if __name__ == "__main__":
    main()
