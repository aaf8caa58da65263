"""Physical-plan shape pins for the 100 TB claims: broadcasts where
intended, partial aggregation, no cartesian products in LSH joins, and
column pruning at both the scan and the Arrow bridge."""

import pytest
from pyspark.sql import functions as F

from parse_html_spark.fixtures import write_corpus_parquet


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "c.parquet")
    write_corpus_parquet(p, 30, procs=1)
    return spark.read.parquet(p)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_descendants_join_broadcasts_ancestors(spark, corpus):
    from parse_html_spark.pipeline import descendants_join, node_table

    nodes = node_table(corpus)
    plan = _plan(descendants_join(nodes, "table", "td"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_exact_dedup_partial_aggregation(spark, corpus):
    """Map-side partial aggregation: only (digest, partial counts) cross
    the exchange, never document text."""
    from parse_html_spark.functions.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(i, f"text {i % 5}") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(exact_duplicates(docs))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_" in plan


def test_lsh_joins_are_never_cartesian(spark):
    from parse_html_spark.functions.dedup import (
        minhash_lsh_pairs,
        simhash_near_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"some text number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    for df in (minhash_lsh_pairs(docs), simhash_near_pairs(docs)):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_arrow_bridge_prunes_columns(spark, corpus):
    """mapInPandas stages select only (doc_id, spans): the ingest
    n_chars column must not cross the Python boundary, and the pruning
    must reach the parquet scan's ReadSchema."""
    from parse_html_spark.pipeline import extract_spans

    assert "n_chars" in corpus.columns
    plan = _plan(extract_spans(corpus))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("n_chars" not in ln for ln in scan_lines)


def test_bucketed_writes_are_size_clustered(spark, tmp_path, corpus):
    """write_bucketed sorts by n_chars within buckets so mega rows sit
    at each file's tail (row-group stat isolation at scale)."""
    import pyspark.sql.functions as F

    from parse_html_spark.pipeline import write_bucketed

    out = str(tmp_path / "bucketed")
    write_bucketed(corpus, out, buckets=2)
    back = spark.read.parquet(out)
    assert back.count() == corpus.count()
    # within each bucket file, n_chars is non-decreasing
    import glob

    import pyarrow.parquet as pq

    for f in glob.glob(out + "/bucket=*/*.parquet"):
        vals = pq.read_table(f, columns=["n_chars"])["n_chars"].to_pylist()
        assert vals == sorted(vals)


def test_exploded_rows_generated_jvm_side(spark, corpus):
    """extract_spans' row form must be the compact map + a JVM Generate
    (posexplode): exactly ONE Python stage in the plan, and a Generate
    above it -- per-span rows never exist in Python."""
    from parse_html_spark.pipeline import extract_spans

    plan = _plan(extract_spans(corpus))
    assert plan.count("MapInPandas") == 1
    assert "Generate" in plan and "posexplode" in plan


def test_pdf_read_single_python_stage(spark, tmp_path):
    """The PDF source plan is scan -> ONE MapInPandas; an n_chars
    rollup stays map-side partial with a single-row exchange, and no
    record-row shuffle ever appears (PLANS.md 'PDF source read')."""
    from parse_html_spark.sources.pdf import encode_pdf, layout_doc
    from parse_html_spark.sources.pdf import read_span_docs_pdf

    for i in range(4):
        (tmp_path / f"{i}.pdf").write_bytes(
            encode_pdf(layout_doc(f"plan pin doc {i} body text " * 8))
        )
    df = read_span_docs_pdf(spark, str(tmp_path))
    plan = _plan(df)
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan  # bare read shuffles nothing
    agg = df.agg(F.sum("n_chars"))
    aplan = _plan(agg)
    assert aplan.count("MapInPandas") == 1
    assert "partial_sum" in aplan
    assert aplan.count("Exchange") == 1 and "SinglePartition" in aplan
