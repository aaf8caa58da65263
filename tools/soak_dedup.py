"""Soak chunk_dup_stats + dedup_lines_global at 10x bench-doc scale with
a PLANTED hot line/chunk present in ~30% of documents (VERDICT r7 #6:
verify the hot-chunk / hot-line skew claims -- AQE join handling, unique
(line,id,pos) join key -- hold under real skew, no task OOM or straggler
collapse).

    python tools/soak_dedup.py [ndocs]     # default 600000

The corpus is synthesized JVM-side (deterministic, doc_id-derived text:
~40 lines per doc, a shared-pool line vocabulary so cross-doc dup mass
is realistic, plus ONE boilerplate line planted in 30% of docs and a
20-token boilerplate chunk inside it). Written once to /tmp parquet,
then both operators run with a noop sink. Peak RSS is sampled across
every java/python process in the session.
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NDOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
CORPUS = f"/tmp/phs_soak_text_{NDOCS}.parquet"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rss_sampler(stop, out):
    import glob

    peak = 0
    while not stop.is_set():
        total = 0
        for sf in glob.glob("/proc/[0-9]*/status"):
            try:
                with open(sf) as f:
                    s = f.read()
                if "java" not in s[:60] and "python" not in s[:60]:
                    continue
                k = s.find("VmRSS:")
                if k >= 0:
                    total += int(s[k:].split()[1])
            except OSError:
                continue
        peak = max(peak, total)
        out["peak_kb"] = peak
        time.sleep(1.0)


def main() -> None:
    from pyspark.sql import functions as F

    from parse_html_spark.functions.dedup import (
        chunk_dup_stats,
        dedup_lines_global,
    )
    from parse_html_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app="soak_dedup")

    if not os.path.exists(CORPUS):
        print(f"synthesizing {NDOCS} docs -> {CORPUS}", file=sys.stderr)
        # ~40 lines/doc from a 20k-line shared vocabulary (real cross-doc
        # duplication), plus the planted boilerplate line in 30% of docs
        df = spark.range(NDOCS).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    lambda i: F.concat(
                        F.lit("line body token alpha beta gamma delta word "),
                        ((F.col("id") * 41 + i * 9973) % 20000).cast("string"),
                        F.lit(" tail segment close"),
                    ),
                ),
                F.when(
                    F.col("id") % 10 < 3,
                    F.lit(
                        "subscribe to our newsletter for updates terms "
                        "privacy cookie settings all rights reserved inc "
                        "contact support help center careers press blog"
                    ),
                ).otherwise(
                    F.concat(F.lit("unique tail "), F.col("id").cast("string"))
                ),
            ).alias("text"),
        )
        df.write.mode("overwrite").parquet(CORPUS)

    docs = spark.read.parquet(CORPUS)
    stop = threading.Event()
    out: dict = {"peak_kb": 0}
    t = threading.Thread(target=rss_sampler, args=(stop, out), daemon=True)
    t.start()

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    for name, fn in [
        ("chunk_dup_stats", lambda: noop(chunk_dup_stats(docs))),
        ("dedup_lines_global", lambda: noop(dedup_lines_global(docs))),
    ]:
        best = float("inf")
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"soak {name}")
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name:22s} {NDOCS} docs  best-of-2 {best:7.2f} s")
    stop.set()
    time.sleep(1.5)
    print(f"peak RSS (all java+python): {out['peak_kb'] / 1024 / 1024:.1f} GiB")
    spark.stop()


if __name__ == "__main__":
    main()
