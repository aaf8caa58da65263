"""In-process interleaved A/B engine timing.

Loads the engine (tokenizer + boilerplate) from two checkouts under
isolated module names, then alternates timing passes A,B,B,A,... inside
ONE process so both sides sample the same host-throttle state at ~1 s
granularity (subprocess-level interleaving was still dominated by the
host's multi-minute clock windows).

    python tools/ab_inproc.py <dir_A> <dir_B> [rounds] [ndocs]
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from parse_html_spark.fixtures import gen_doc  # noqa: E402
from parse_html_spark.pipeline import assemble  # noqa: E402


def load_engine(root: str, name: str, page: bool = False):
    pkg_dir = os.path.join(root, "parse_html_spark")
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir],
    )
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[name] = pkg
    spec.loader.exec_module(pkg)
    tok = importlib.import_module(name + ".tokenizer")
    boil = importlib.import_module(name + ".boilerplate")
    if not page:
        return tok.DocIndex, boil.main_content_spans
    import json

    dom = importlib.import_module(name + ".dom")
    ext = importlib.import_module(name + ".extract")

    def page_fn(h, m):
        doc = tok.DocIndex(h)
        boil.main_content_spans(doc, m)
        ph = dom.PH(h, doc=doc)
        ph.find("title").text()
        tables = ext.extract_table_list(ph.find("table"), val_only=True)
        form = ext.to_plain(ext.extract_form(ph))
        json.dumps([ext.to_plain(t) for t in tables], ensure_ascii=False)
        json.dumps(form, ensure_ascii=False)

    return tok.DocIndex, page_fn


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    page = "--page" in sys.argv
    a_dir, b_dir = args[0], args[1]
    rounds = int(args[2]) if len(args) > 2 else 8
    n = int(args[3]) if len(args) > 3 else 2000
    di_a, mcs_a = load_engine(a_dir, "phs_a", page)
    di_b, mcs_b = load_engine(b_dir, "phs_b", page)
    pairs = [assemble(gen_doc(i)["spans"]) for i in range(n)]

    if page:

        def run(di, mcs) -> float:
            t0 = time.time()
            for h, m in pairs:
                mcs(h, m)
            return time.time() - t0

    else:

        def run(di, mcs) -> float:
            t0 = time.time()
            for h, m in pairs:
                mcs(di(h), m)
            return time.time() - t0

        # parity spot check: identical spans from both engines
        for h, m in pairs[:200]:
            assert mcs_a(di_a(h), m) == mcs_b(di_b(h), m)

    run(di_a, mcs_a)
    run(di_b, mcs_b)  # warm both
    ratios = []
    for r in range(rounds):
        order = ["ab", "ba"][r % 2]
        res = {}
        for side in order:
            if side == "a":
                res["a"] = run(di_a, mcs_a)
            else:
                res["b"] = run(di_b, mcs_b)
        ratios.append(res["a"] / res["b"])
        print(
            f"round {r} A={res['a']:.3f}s B={res['b']:.3f}s "
            f"A/B={ratios[-1]:.3f}",
            flush=True,
        )
    print(
        f"median A/B over {rounds} rounds: {statistics.median(ratios):.3f} "
        f"(>1 means B faster)"
    )


if __name__ == "__main__":
    main()
