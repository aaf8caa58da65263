"""Snapshot-manifest parquet warehouse (Iceberg stand-in).

The production design targets Iceberg tables (`df.writeTo(tbl).append()`,
snapshot isolation, time travel). This sandbox has no Iceberg runtime
jar, so the same contract is provided over a parquet directory layout:

    <root>/<table>/_manifest.json       # ordered snapshot log
    <root>/<table>/snap-<n>/*.parquet   # immutable data of snapshot n

- append(df, table): writes a NEW immutable snapshot dir, then commits
  it to the manifest atomically (write-tmp + rename). Readers never see
  half-written snapshots -- the manifest is the source of truth.
- read(table, as_of=None): union of all committed snapshots up to
  as_of (time travel).
- If `iceberg_available(spark)`, callers can route to real Iceberg
  instead; the shim keeps the same method names.
"""

from __future__ import annotations

import json
import os
import time


def iceberg_available(spark) -> bool:
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


class Warehouse:
    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def _load_manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if os.path.exists(path):
            with open(path) as fh:
                return json.load(fh)
        return {"table": table, "snapshots": []}

    def append(self, df, table: str, lineage: dict | None = None) -> int:
        """Write one immutable snapshot; returns its id. The snapshot is
        visible only after the manifest rename commits it."""
        manifest = self._load_manifest(table)
        snap_id = (
            manifest["snapshots"][-1]["id"] + 1 if manifest["snapshots"] else 0
        )
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        data_dir = os.path.join(tdir, f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(data_dir)
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "ts": time.time(),
                "path": f"snap-{snap_id}",
                "lineage": lineage or {},
            }
        )
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(table))
        return snap_id

    def read(self, table: str, as_of: int | None = None):
        """Union of committed snapshots (time travel with as_of)."""
        manifest = self._load_manifest(table)
        snaps = [
            s for s in manifest["snapshots"]
            if as_of is None or s["id"] <= as_of
        ]
        if not snaps:
            raise FileNotFoundError(f"no committed snapshots for {table}")
        paths = [
            os.path.join(self.root, table, s["path"]) for s in snaps
        ]
        return self.spark.read.parquet(*paths)

    def snapshots(self, table: str) -> list[dict]:
        return self._load_manifest(table)["snapshots"]
