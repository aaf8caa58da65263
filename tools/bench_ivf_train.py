"""IVF k-means training throughput: driver recipe at the default
65,536-vector sample vs executor-side (mapInPandas partial-sum Lloyd)
at 10x that sample -- the scale where collecting the sample to the
driver (~335 MB at 655k x 64 float64) stops being acceptable.

Vectors are synthesized deterministically executor-side (per-row
RandomState seeded by vec_id), so the run needs no external data and
both paths see identical input. Rewrites the '## IVF training at
scale' section of BENCH/SIMILARITY.md.

Usage: python tools/bench_ivf_train.py [n_vectors]
Run SOLO (concurrent Spark/CPU work ruins wall times -- see build notes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parse_html_spark.functions.similarity import (  # noqa: E402
    ivf_train_centroids,
    ivf_train_centroids_distributed,
)
from parse_html_spark.session import get_spark  # noqa: E402

MARKER = "## IVF training at scale"
DIM = 64


def synth_vectors(spark, n):
    """n deterministic pseudo-random unit-ish vectors, generated on the
    executors (no driver materialization)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            vecs = []
            for i in pdf["id"]:
                rng = np.random.RandomState(int(i) % (2**31))
                vecs.append(rng.randn(DIM).astype("float64").tolist())
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": vecs})

    return (
        spark.range(0, n, 1, 32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 700_000
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    df = synth_vectors(spark, n).persist()
    df.count()  # materialize the cache so training times exclude synth

    rows = []
    t0 = time.time()
    C_drv = ivf_train_centroids(df, DIM, n_cells=16, sample=65_536, iters=20)
    t_drv = time.time() - t0
    rows.append(("driver recipe", "65,536 (default)", t_drv))

    t0 = time.time()
    C_dist = ivf_train_centroids_distributed(
        df, DIM, n_cells=16, sample=65_536, iters=20
    )
    t_par = time.time() - t0
    rows.append(("executor-side", "65,536 (parity)", t_par))
    assert np.allclose(C_drv, C_dist, atol=1e-8), "parity broken"

    t0 = time.time()
    ivf_train_centroids_distributed(
        df, DIM, n_cells=16, sample=655_360, iters=20
    )
    t_10x = time.time() - t0
    rows.append(("executor-side", "655,360 (10x)", t_10x))
    df.unpersist()

    lines = [
        MARKER,
        "",
        f"{n:,} synthetic {DIM}-dim vectors (tools/bench_ivf_train.py, "
        "seed-deterministic), n_cells=16, 20 Lloyd iterations, "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].",
        "",
        "| path | sample | wall (s) |",
        "|---|---|---|",
    ]
    for path, smp, wall in rows:
        lines.append(f"| {path} | {smp} | {wall:.1f} |")
    lines += [
        "",
        "Executor-side training matches the driver recipe's centroids to "
        "np.allclose(atol=1e-8) at the default sample (pinned in "
        "test_distributed_ivf_training_matches_driver_recipe) and scales "
        "the sample 10x without the driver collect: only per-cell "
        "float64 partial sums cross to the driver each iteration.",
        "",
    ]
    md_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "SIMILARITY.md",
    )
    text = open(md_path).read()
    if MARKER in text:
        head, _, tail = text.partition(MARKER)
        nxt = tail.find("\n## ")
        text = head + "\n".join(lines) + (tail[nxt:] if nxt >= 0 else "")
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    open(md_path, "w").write(text)
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
