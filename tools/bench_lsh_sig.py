"""Micro-bench: hyperplane signature computation, interpreted-HOF
Column chain (the pre-round-4 implementation) vs the Arrow-batched
matmul pandas_udf (similarity.lsh_buckets_col).

Synthesizes a 200k x 64 corpus by replicating the sf0.1 embeddings
table, then times the full signature stage (tables=8, bits=12 -> 96
hyperplanes) driven to completion by an aggregate over the exploded
(tbl, bucket) tuples -- the exact shape lsh_candidate_pairs feeds its
band join. Appends a result line to BENCH/SIMILARITY.md by hand (run,
copy the printed line).

Usage: python tools/bench_lsh_sig.py [sf_dir] [replicas]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from parse_html_spark.functions.similarity import (
    _hyperplanes,
    lsh_buckets_col,
)
from parse_html_spark.session import get_spark

TABLES, BITS, DIM = 8, 12, 64


def old_buckets_array(vec_col):
    """The pre-round-4 expression: one interpreted aggregate(zip_with)
    per hyperplane (96 total), kept here solely as the bench baseline."""
    arrs = []
    for t in range(TABLES):
        planes = _hyperplanes(DIM, BITS, 42 + 1000 * t)
        bucket = F.lit(0)
        for i, row in enumerate(planes):
            dot = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in row]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        arrs.append(bucket.cast("bigint"))
    return F.array(*arrs)


def drive(df, buckets_col) -> tuple[float, int]:
    banded = df.select(
        F.col("vec_id"), F.posexplode(buckets_col).alias("tbl", "bucket")
    )
    t0 = time.time()
    n = banded.agg(
        F.count(F.lit(1)).alias("n"), F.sum("bucket").alias("s")
    ).collect()[0]["n"]
    return time.time() - t0, n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    big = (
        emb.crossJoin(spark.range(replicas).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .cache()
    )
    n_vec = big.count()
    stack = np.vstack([_hyperplanes(DIM, BITS, 42 + 1000 * t) for t in range(TABLES)])

    results = {}
    for name, col in (
        ("matmul_udf", lsh_buckets_col(F.col("embedding"), stack, BITS)),
        ("hof_exprs", old_buckets_array(F.col("embedding"))),
    ):
        best = float("inf")
        for _ in range(2):  # best-of-2 (noisy host)
            wall, n = drive(big, col)
            assert n == n_vec * TABLES, (n, n_vec)
            best = min(best, wall)
        results[name] = best
        print(f"{name}: {best:.2f}s  ({n_vec / best:,.0f} vec/s)")
    speedup = results["hof_exprs"] / results["matmul_udf"]
    print(
        f"RESULT | {n_vec:,} vecs x {TABLES}x{BITS} planes | "
        f"hof {results['hof_exprs']:.2f}s | matmul {results['matmul_udf']:.2f}s | "
        f"speedup {speedup:.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
