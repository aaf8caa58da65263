"""Dump .explain('formatted') for every bench.py headline query into
plans/r08/<query>_<tag>.txt (tag = before|after).

    python tools/dump_plans_r08.py before|after

Uses the same DataFrames bench.py times (noop-equivalent: plans are
independent of the action). Run on an idle machine is NOT required --
planning only, nothing executes except tiny fixture reads.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = "/tmp/phs_bench_corpus_60000.parquet"


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    tag = sys.argv[1]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r08",
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from parse_html_spark.functions.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
    )
    from parse_html_spark.functions.similarity import cosine_topk
    from parse_html_spark.pipeline import (
        extract_page,
        extract_spans,
        extract_spans_compact,
        prepare_partitions,
        select_spans,
    )
    from parse_html_spark.session import get_spark
    from parse_html_spark.sources.pdf import read_span_docs_pdf

    spark = get_spark(cpus=4, app="dump_plans_r08")
    corpus = spark.read.parquet(CORPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    pdf_dir = "/tmp/phs_bench_pdfs_0.1"

    plans = {
        "extract_main": extract_spans_compact(corpus),
        "extract_page_full": extract_page(corpus),
        "extract_skew_routed": extract_spans_compact(
            prepare_partitions(corpus, 32)
        ),
        "extract_exploded": extract_spans(corpus),
        "selector_scan": select_spans(corpus, "article p.intro", mode="text"),
        "spans_oracle": entrymod._q_spans_main(spark, SF_DIR),
        "forms": entrymod._q_extract_form(spark, SF_DIR),
        "dedup_exact": exact_duplicates(doubled),
        "minhash_lsh": minhash_lsh_pairs(docs),
        "cosine_topk": cosine_topk(emb, list(qvec), k=10),
    }
    if os.path.isdir(pdf_dir):
        plans["pdf_extract"] = read_span_docs_pdf(spark, pdf_dir).agg(
            F.sum("n_chars")
        )
    for name, df in plans.items():
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(formatted(df) + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
