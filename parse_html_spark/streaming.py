"""Structured Streaming lift of the extraction pipeline.

The reference is a synchronous per-document library with no streaming
surface (SURVEY.md 2.10); the natural Spark lift is trivial because the
extraction stage is a STATELESS mapInPandas: the same extract_spans()
plan runs under readStream unchanged. Checkpointing gives exactly-once
file-sink semantics; late data needs no watermark (no event-time aggs).
"""

from __future__ import annotations

SPAN_INPUT_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def extract_spans_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source streaming extraction: new parquet files landing in
    input_dir are extracted incrementally; the checkpoint makes restarts
    resume exactly where the last trigger stopped.

    Returns the started StreamingQuery (caller awaits termination)."""
    from .pipeline import extract_spans

    sdf = spark.readStream.schema(SPAN_INPUT_SCHEMA).parquet(input_dir)
    out = extract_spans(sdf)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup_first_seen(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_ttl_ms: int | None = None,
):
    """Custom STATEFUL streaming operator: exactly-first-seen dedup over
    an unbounded span-doc stream, keyed by content fingerprint, via
    applyInPandasWithState. State (one boolean per fingerprint) persists
    in the checkpoint across micro-batches AND restarts, so a document
    whose text was ever emitted is never emitted again.

    ``state_ttl_ms`` bounds state growth on unbounded streams: each
    fingerprint's entry is evicted after that much processing time
    without re-occurrence (ProcessingTimeTimeout; re-occurrence refreshes
    the clock). Dedup semantics soften to first-seen-within-TTL -- the
    standard memory/recall trade for infinite streams. With None
    (default) state never expires (exact first-seen, unbounded state).

    Output rows: (fp, doc_id) of first-seen documents."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .session import ensure_py_files

    ensure_py_files(spark)
    sdf = spark.readStream.schema(SPAN_INPUT_SCHEMA).parquet(input_dir)
    docs = sdf.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                "\x00",
                F.transform(
                    F.array_sort(
                        F.col("spans"),
                        lambda a, b: F.when(a["offset"] < b["offset"], -1)
                        .when(a["offset"] > b["offset"], 1)
                        .otherwise(0),
                    ),
                    lambda s: F.coalesce(s["text"], F.lit("")),
                ),
            )
        ).alias("fp"),
    )

    def first_seen(key, pdf_iter, state):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()  # evict: the fp may be emitted again later
            return iter(())
        if state.exists:
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)  # refresh TTL
            return iter(())
        first_doc = None
        for pdf in pdf_iter:
            if len(pdf) and first_doc is None:
                first_doc = min(pdf["doc_id"])
        if first_doc is None:
            return iter(())
        state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        return iter([pd.DataFrame({"fp": [key[0]], "doc_id": [first_doc]})])

    out = docs.groupBy("fp").applyInPandasWithState(
        first_seen,
        outputStructType="fp string, doc_id string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_event_rollup(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    late: str = "30 minutes",
):
    """Event-time windowed aggregation with a WATERMARK for late data:
    tumbling-window counts/sums per event_type over a file stream of the
    events table. Append mode emits a window only once its watermark
    (max event time - late) has passed -- the batch twin is the
    events_window oracle query."""
    from pyspark.sql import functions as F

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    ev = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        ev.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def for_each_batch_extract(spark, input_dir: str, handle_batch, checkpoint_dir: str):
    """foreachBatch variant: handle_batch(batch_df, epoch_id) receives the
    extracted span DataFrame per micro-batch (for sinks without a native
    streaming writer, e.g. JDBC or MERGE-style upserts)."""
    from .pipeline import extract_spans

    sdf = spark.readStream.schema(SPAN_INPUT_SCHEMA).parquet(input_dir)

    def _inner(batch_df, epoch_id):
        handle_batch(extract_spans(batch_df), epoch_id)

    return (
        sdf.writeStream.foreachBatch(_inner)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
