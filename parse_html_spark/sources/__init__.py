"""Table sources/sinks: Iceberg when the runtime has the Iceberg Spark
runtime jar, else a parquet warehouse with JSON snapshot manifests that
preserves the same append/time-travel/lineage semantics in-sandbox."""

from .warehouse import Warehouse

__all__ = ["Warehouse"]
