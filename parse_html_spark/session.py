"""SparkSession factory tuned for the extraction pipeline.

Local-mode defaults match the sandbox (single JVM, N threads); on a real
cluster the same settings apply per executor via spark-submit --py-files.
"""

from __future__ import annotations

import os


def get_spark(cpus: int | None = None, app: str = "parse_html_spark"):
    from pyspark.sql import SparkSession

    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches sized for documents (large strings): keep batches
        # small enough that a batch of mega-docs fits comfortably in the
        # Python worker.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
    )
    # Shuffle spill/exchange files on this VM's virtual disk serialize
    # badly under 32 concurrent writers (measured 3x extract slowdown);
    # a RAM-backed local dir restores scaling. On a real cluster this is
    # the node's NVMe scratch (spark.local.dir default on YARN/K8s).
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ensure_py_files(spark)
    return spark


_SHIPPED: set[int] = set()


def ensure_py_files(spark) -> None:
    """Ship the parse_html_spark package to executors (the --py-files
    story): zips the package once per session and addPyFile's it, so
    mapInPandas closures can import it on any worker regardless of the
    driver's PYTHONPATH."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"parse_html_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
