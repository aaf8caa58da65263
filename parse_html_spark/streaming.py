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
