"""Corpus-level operators for large-scale training-data pipelines:
text analysis, deduplication, similarity search, multimodal plumbing.
All hot paths are JVM-side Column expressions or Arrow-batched pandas
UDFs -- never row-at-a-time Python."""
