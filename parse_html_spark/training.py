"""Training-data preparation: the composed large-scale pipeline.

extract (boilerplate strip) -> reassemble doc text -> quality filter ->
exact dedup -> near-dup (MinHash LSH) removal -> write. Every stage is
one of the repo's primitives; this module is the composition a corpus
pipeline actually runs at 100 TB.

Scale shape: one Python map stage (extraction), then pure JVM relational
ops. The only shuffles are (a) the span->doc regroup on doc_id, (b) the
md5-digest aggregate, (c) the short-key LSH band join -- document text
crosses the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.dedup import minhash_lsh_pairs
from .functions.textfn import quality_score, token_count
from .pipeline import extract_spans, prepare_partitions


def reassemble_docs(spans_df: DataFrame) -> DataFrame:
    """Output spans -> one row per doc: extracted text + media refs,
    in span order."""
    return spans_df.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("order", "kind", "text"))
                ),
                lambda s: s["text"],
            ),
        ).alias("text"),
        F.filter(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("order", "kind", "media_ref"))
                ),
                lambda s: s["media_ref"],
            ),
            lambda r: r.isNotNull(),
        ).alias("media_refs"),
    )


def quality_filter(
    docs: DataFrame, min_score: float = 0.25, min_tokens: int = 10
) -> DataFrame:
    return docs.filter(
        (quality_score(F.col("text")) >= min_score)
        & (token_count(F.col("text")) >= min_tokens)
    )


def drop_near_duplicates(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Remove the higher-id member of every MinHash candidate pair
    (keeper = min id per pair chain's immediate edges). Exact for pairs;
    cluster-transitive removal is dup_clusters()."""
    pairs = minhash_lsh_pairs(docs, id_col=id_col)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def dup_clusters(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Connected components over dup pairs (id_a < id_b) by iterative
    min-label propagation -- the non-SQL-expressible iterative op.
    Returns (doc_id, cluster) where cluster = min doc_id of the
    component. Converges in O(log diameter) joins; dup chains are short
    in practice, and max_iter bounds the worst case."""
    edges = pairs.select("id_a", "id_b")
    edges = edges.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    ).distinct()
    labels = (
        edges.select(F.col("id_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.id_b == labels.doc_id)
            .groupBy(F.col("id_a").alias("doc_id"))
            .agg(F.min("cluster").alias("n_cluster"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster"), F.coalesce("n_cluster", "cluster")
                ).alias("cluster"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def prepare_training_corpus(
    spark,
    input_path: str,
    output_path: str,
    partitions: int = 64,
    min_quality: float = 0.25,
) -> dict:
    """Full composed run; returns stage counts for the metrics table."""
    from .pipeline import extract_docs

    raw = spark.read.parquet(input_path)
    n_in = raw.count()
    # fused extract+reassemble: one map pass, no span-row shuffle
    docs = extract_docs(prepare_partitions(raw, partitions))
    kept = quality_filter(docs, min_quality)
    from .functions.dedup import dedup_exact

    kept = dedup_exact(kept)
    kept = drop_near_duplicates(kept)
    kept.write.mode("overwrite").parquet(output_path)
    n_out = spark.read.parquet(output_path).count()
    return {"docs_in": n_in, "docs_out": n_out}
