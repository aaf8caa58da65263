"""PDF parse throughput (no Spark; pure Python + numpy deps only).

Measures parse_pdf_spans docs/s and input MB/s per structural dialect
over deterministic encode_pdf fixtures at two document sizes, plus the
damaged-xref reconstruction path. Single thread, best-of-N reps --
this is the per-core bill the Spark mapInPandas stage pays per task.

Usage: python tools/bench_pdf.py [n_docs] [reps]
Appends/refreshes the PDF section printed to stdout; paste into
BENCH/CODECS.md when the numbers move.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parse_html_spark.sources.pdf import (  # noqa: E402
    encode_pdf,
    layout_doc,
    parse_pdf_spans,
    spans_to_text,
    wrap_lines,
)

WORDS = ("the quick brown fox jumps over lazy dog near river bank "
         "data span table query page media image text block row ").split()


def _doc_text(i: int, n_chars: int) -> str:
    out = []
    k = i
    total = 0
    while total < n_chars:
        w = WORDS[k % len(WORDS)]
        out.append(w)
        total += len(w) + 1
        k += 3
    return " ".join(out)[:n_chars]


def bench(n_docs: int = 200, reps: int = 3):
    dialects = [
        ("classic", {}),
        ("flate", {"compress": True}),
        ("kerning TJ", {"kerning": True}),
        ("type0 cmap", {"cmap": True}),
        ("objstm 1.5", {"objstm": True, "compress": True}),
        ("all combined", {"objstm": True, "compress": True,
                          "kerning": True, "cmap": True}),
    ]
    print(f"| dialect | size | docs/s | input MB/s |")
    print(f"|---|---|---|---|")
    for size_label, n_chars in (("2 KB", 2048), ("64 KB", 65536)):
        for name, kw in dialects:
            docs = [
                encode_pdf(layout_doc(_doc_text(i, n_chars)), **kw)
                for i in range(n_docs if n_chars <= 4096 else n_docs // 8)
            ]
            # correctness guard: the bench must measure real parses
            exp = "\n".join(wrap_lines(_doc_text(0, n_chars)))
            spans, status, _ = parse_pdf_spans(docs[0])
            assert status == "ok" and spans_to_text(spans) == exp, name
            nbytes = sum(len(d) for d in docs)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                for d in docs:
                    parse_pdf_spans(d)
                best = min(best, time.perf_counter() - t0)
            print(f"| {name} | {size_label} | {len(docs) / best:.0f} "
                  f"| {nbytes / best / 1e6:.1f} |")
    # damaged-xref reconstruction path
    base = encode_pdf(layout_doc(_doc_text(1, 2048)))
    broken = base[: base.rindex(b"startxref")]
    spans, status, _ = parse_pdf_spans(broken)
    assert status.startswith("ok_with_warnings")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_docs):
            parse_pdf_spans(broken)
        best = min(best, time.perf_counter() - t0)
    print(f"| reconstruct (no xref) | 2 KB | {n_docs / best:.0f} "
          f"| {n_docs * len(broken) / best / 1e6:.1f} |")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench(n, r)
