"""Extra benchmarks (guide 1.4): noop-sink isolation of sub-stages of
the headline queries. NOT part of the driver contract -- bench.py is the
frozen official bench; numbers from here are cited in
OPTIMIZATION_r08.md only.

    python bench_extra.py [group ...]   # groups: minhash pdf dedup skew
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name: str, fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{name:42s} {best:7.3f} s")
    return best


def main() -> None:
    groups = set(sys.argv[1:]) or {"minhash", "pdf", "dedup", "skew"}
    from pyspark.sql import functions as F

    from parse_html_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app="bench_extra")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    if "minhash" in groups:
        from parse_html_spark.functions.dedup import (
            _minhash_banded,
            minhash_lsh_pairs,
            minhash_signatures,
        )

        timed(spark, "minhash: signatures only (noop)",
              lambda: noop(minhash_signatures(docs)))
        timed(spark, "minhash: banded rows (noop)",
              lambda: noop(_minhash_banded(docs, "text", "doc_id", 32, 8, 3)))
        timed(spark, "minhash: full pairs (count)",
              lambda: minhash_lsh_pairs(docs).count())

    if "pdf" in groups:
        from parse_html_spark.sources.pdf import read_span_docs_pdf

        pdf_dir = "/tmp/phs_bench_pdfs_0.1"
        if os.path.isdir(pdf_dir):
            spark.conf.set("spark.sql.files.openCostInBytes", "16384")
            timed(spark, "pdf: binaryFile scan only (count)",
                  lambda: spark.read.format("binaryFile").load(pdf_dir).count())
            timed(spark, "pdf: full read+agg",
                  lambda: read_span_docs_pdf(spark, pdf_dir)
                  .agg(F.sum("n_chars")).collect())
            spark.conf.unset("spark.sql.files.openCostInBytes")

    if "dedup" in groups:
        from parse_html_spark.functions.dedup import exact_duplicates

        doubled = docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        )
        timed(spark, "dedup_exact: count", lambda: exact_duplicates(doubled).count())
        timed(spark, "dedup_exact: scan+md5 only (noop)",
              lambda: noop(doubled.select(F.md5("text"))))

    if "skew" in groups:
        from parse_html_spark.pipeline import (
            extract_spans_compact,
            prepare_partitions,
        )

        corpus = spark.read.parquet("/tmp/phs_bench_corpus_60000.parquet")
        timed(spark, "extract_main (count)",
              lambda: extract_spans_compact(corpus).count(), reps=2)
        timed(spark, "extract_skew_routed (count)",
              lambda: extract_spans_compact(
                  prepare_partitions(corpus, CPUS)).count(), reps=2)
        timed(spark, "skew: routed scan only (noop, no python)",
              lambda: noop(prepare_partitions(corpus, CPUS)
                           .select(F.length("doc_id"))), reps=2)

    spark.stop()


if __name__ == "__main__":
    main()
