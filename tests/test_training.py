"""Composed training-data pipeline + dup clustering + plan checks."""

from pyspark.sql import functions as F

from parse_html_spark.fixtures import write_corpus_parquet
from parse_html_spark.training import (
    dup_clusters,
    prepare_training_corpus,
    quality_filter,
    reassemble_docs,
)


def test_prepare_training_corpus(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    write_corpus_parquet(src, 30)
    out = str(tmp_path / "out")
    stats = prepare_training_corpus(spark, src, out, partitions=4)
    assert stats["docs_in"] == 30
    assert 0 < stats["docs_out"] <= 30
    result = spark.read.parquet(out)
    assert {"doc_id", "text", "media_refs"} <= set(result.columns)
    assert result.filter(F.length("text") < 10).count() == 0


def test_prepare_training_corpus_decontaminate_annotate(spark, tmp_path):
    """Optional stages: benchmark-overlapping docs are dropped before
    dedup, and annotate=True appends the quality-layer columns."""
    src = str(tmp_path / "in.parquet")
    write_corpus_parquet(src, 30)
    out = str(tmp_path / "out")
    # baseline run to learn the surviving texts
    base_stats = prepare_training_corpus(spark, src, out, partitions=4)
    survivors = spark.read.parquet(out).select("doc_id", "text").collect()
    assert base_stats["docs_out"] == len(survivors)
    # benchmark = one surviving doc's text: that doc (and any shingle
    # near-dup of it) must vanish from a decontaminated run
    bench = spark.createDataFrame(
        [(9999, survivors[0]["text"])], "doc_id long, text string"
    )
    out2 = str(tmp_path / "out2")
    stats2 = prepare_training_corpus(
        spark, src, out2, partitions=4,
        decontaminate_against=bench, annotate=True,
    )
    assert stats2["docs_out"] < base_stats["docs_out"]
    res = spark.read.parquet(out2)
    assert {"keep", "reject_reason", "text_redacted", "bpe_tokens",
            "split"} <= set(res.columns)
    assert res.filter(F.col("doc_id") == survivors[0]["doc_id"]).count() == 0


def test_reassemble_orders_spans(spark):
    rows = [
        ("d1", 1, "text", "world", None),
        ("d1", 0, "text", "hello", None),
        ("d1", 2, "media", "", "m://x"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, `order` int, kind string, text string, media_ref string"
    )
    got = reassemble_docs(df).collect()[0]
    assert got["text"] == "hello world "
    assert got["media_refs"] == ["m://x"]


def test_quality_filter_drops_junk(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs on"),
        (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        (3, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = [r["doc_id"] for r in quality_filter(df).collect()]
    assert kept == [1]


def test_dup_clusters_transitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster"] for r in dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_parquet_filter_pushdown_plan(spark):
    """Catalyst sanity: a filter on the documents scan is pushed down."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("n_chars") > 400)
        .select("doc_id", "n_chars")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_chars" in plan
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:200]

def test_parquet_meta_rows_many_files(spark, tmp_path):
    """10k-file footer count: the thread-pool footer reader must count a
    wide layout correctly and in seconds (the sequential driver loop it
    replaced is minutes at 100k files). Files are hardlinks of one 3-row
    parquet, so the test costs one write + 9,999 links."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parse_html_spark.training import _parquet_meta_rows

    d = tmp_path / "many"
    d.mkdir()
    base = d / "part-00000.parquet"
    pq.write_table(pa.table({"doc_id": [1, 2, 3]}), base)
    for i in range(1, 10_000):
        os.link(base, d / f"part-{i:05d}.parquet")
    t0 = time.time()
    assert _parquet_meta_rows(spark, str(d)) == 30_000
    wall = time.time() - t0
    assert wall < 60, f"footer count took {wall:.0f}s"


def test_parquet_meta_rows_empty_dir_raises(spark, tmp_path):
    """A directory with NO parquet files must raise (via the Spark
    fallback), not silently report 0 rows."""
    import pytest
    from pyspark.errors import AnalysisException

    from parse_html_spark.training import _parquet_meta_rows

    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(AnalysisException):
        _parquet_meta_rows(spark, str(d))


def test_dup_clusters_long_chain_pointer_jumping(spark):
    """A 10k-pair CHAIN graph (diameter 10k): plain neighbor-min label
    propagation needs O(n) rounds; pointer jumping converges in
    O(log n). Also exercises the per-round localCheckpoint -- without
    it, 15 rounds of self-referential joins re-evaluate the whole
    lineage prefix each round."""
    import time

    n = 10_001  # 10k edges
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    t0 = time.time()
    labels = {
        r["doc_id"]: r["cluster"] for r in dup_clusters(pairs).collect()
    }
    wall = time.time() - t0
    assert len(labels) == n
    assert set(labels.values()) == {0}  # fully converged to the min id
    # generous bound: catches lineage blowup (which is minutes), not
    # host noise
    assert wall < 120, f"dup_clusters chain took {wall:.0f}s"
