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


def drop_near_duplicates(
    docs: DataFrame, id_col: str = "doc_id", min_jaccard: float = 0.6
) -> DataFrame:
    """Remove the higher-id member of every VERIFIED near-dup pair
    (MinHash-LSH candidates confirmed by exact shingle Jaccard within
    buckets -- LSH false positives never remove a document). Exact for
    pairs; cluster-transitive removal is dup_clusters()."""
    from .functions.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(docs, id_col=id_col, min_jaccard=min_jaccard)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def dup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over dup pairs (id_a < id_b) -- the
    iterative (non-single-SQL) op. Returns (doc_id, cluster) with
    cluster = min doc_id of the component.

    Each round does (1) neighbor-min propagation over the edge set and
    (2) POINTER JUMPING (cluster <- cluster-of-cluster), so the covered
    radius roughly doubles per round: a diameter-D component converges
    in O(log D) rounds, not O(D) -- a 10k-node chain needs ~15 rounds.

    Both the edge set and each round's labels are localCheckpoint()ed:
    the lineage is truncated every iteration, so round N's plan does not
    re-evaluate rounds 0..N-1 (without this, iterative joins re-trigger
    the whole prefix per round and per-round wall time grows without
    bound). localCheckpoint trades lineage for executor-local storage;
    on clusters where executor loss matters, swap for checkpoint() with
    a checkpoint dir."""
    edges = pairs.select("id_a", "id_b")
    edges = (
        edges.unionByName(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("id_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    # Convergence probing is kept OFF the per-round critical path: the
    # previous cluster rides each round's labels as a `_prev` column (no
    # extra join), and the driver-side changed-check runs only every
    # `check_every` rounds -- the eager localCheckpoint is the one
    # blocking action per round, and the check itself is a limit(1)
    # count over already-checkpointed data.
    check_every = 2
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.id_b == labels.doc_id)
            .groupBy(F.col("id_a").alias("doc_id"))
            .agg(F.min("cluster").alias("n_cluster"))
        )
        stepped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("cluster").alias("_prev"),
            F.least(
                F.col("cluster"), F.coalesce("n_cluster", "cluster")
            ).alias("cluster"),
        )
        # pointer jump: cluster <- label(cluster). Every cluster value is
        # itself a doc_id present in labels (it is a min over component
        # members), so the lookup join always resolves.
        lut = stepped.select(
            F.col("doc_id").alias("_cid"), F.col("cluster").alias("_ccl")
        )
        new_labels = (
            stepped.join(lut, stepped.cluster == lut._cid, "left")
            .select(
                "doc_id",
                F.coalesce("_ccl", "cluster").alias("cluster"),
                "_prev",
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels.select("doc_id", "cluster")
        if it % check_every == check_every - 1 or it == max_iter - 1:
            changed = (
                new_labels.filter(F.col("cluster") != F.col("_prev"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    return labels


def _parquet_meta_rows(spark, path: str) -> int:
    """Row count without a data scan. For local paths: parquet FOOTERS
    only, driver-side, no Spark job (the stand-in for an Iceberg
    manifest row count). For remote filesystems (s3a://, hdfs://) or
    glob patterns pyarrow cannot open, fall back to a Spark count() --
    a columnless parquet scan that reads row counts from row-group
    metadata, still no column data."""
    import glob
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            files = glob.glob(
                os.path.join(path, "**", "*.parquet"), recursive=True
            )
            if not files:
                # a directory with no parquet files is NOT "0 rows" --
                # fall through to the Spark read, which raises the same
                # unable-to-infer error the old raw.count() path did
                raise FileNotFoundError(f"no *.parquet under {path}")
        elif os.path.isfile(path):
            files = [path]
        else:
            raise FileNotFoundError(path)
        if len(files) == 1:
            return pq.ParquetFile(files[0]).metadata.num_rows
        # footer reads are tiny IO-bound opens (GIL released): at 100 TB
        # (~100k files) a sequential driver loop is minutes before the
        # job starts; a thread pool keeps it seconds
        with ThreadPoolExecutor(max_workers=min(32, len(files))) as ex:
            return sum(
                ex.map(lambda f: pq.ParquetFile(f).metadata.num_rows, files)
            )
    except (OSError, ValueError):
        return spark.read.parquet(path).count()


def prepare_training_corpus(
    spark,
    input_path: str,
    output_path: str,
    partitions: int = 64,
    min_quality: float = 0.25,
    decontaminate_against=None,
    annotate: bool = False,
) -> dict:
    """Full composed run; returns stage counts for the metrics table.

    ``decontaminate_against``: optional DataFrame of benchmark/eval
    texts (doc_id, text) -- training docs sharing any stride-1 8-token
    shingle with it are DROPPED before dedup (the GPT-3/Gopher
    hygiene step; the eval set broadcasts, see
    functions.dedup.decontaminate). ``annotate=True`` appends the
    one-projection quality layer (Gopher keep/reason, PII-redacted
    text, BPE token count, train/val/test split) to the written rows.

    Metric counts cost NO extra corpus pass: docs_in comes from the
    input's parquet footers (metadata only); docs_out rides the write
    action itself as an observed metric (CollectMetrics on the final
    plan node -- placed at the top of the plan, where no self-join
    duplicates it, unlike the extraction subtree which the dedup joins
    reference more than once)."""
    from pyspark.sql import Observation

    from .pipeline import extract_docs

    n_in = _parquet_meta_rows(spark, input_path)
    raw = spark.read.parquet(input_path)
    # fused extract+reassemble: one map pass, no span-row shuffle
    docs = extract_docs(prepare_partitions(raw, partitions))
    kept = quality_filter(docs, min_quality)
    from .functions.dedup import dedup_exact

    if decontaminate_against is not None:
        from .functions.dedup import filter_contaminated

        kept = filter_contaminated(kept, decontaminate_against)
    kept = dedup_exact(kept)
    kept = drop_near_duplicates(kept)
    if annotate:
        from .functions.textfn import annotate_quality

        kept = annotate_quality(kept)
    obs_out = Observation("training_docs_out")
    kept = kept.observe(obs_out, F.count(F.lit(1)).alias("n"))
    kept.write.mode("overwrite").parquet(output_path)
    return {"docs_in": n_in, "docs_out": int(obs_out.get["n"])}
