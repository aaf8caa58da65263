"""spark-submit --py-files packaging demo (the production launch path).

Zips parse_html_spark, writes a tiny span-doc corpus, then launches a
REAL spark-submit subprocess that imports the package only from the
--py-files zip (cwd moved away from the repo) and runs the extraction
pipeline. Prints the resulting span count.

Usage: python tools/submit_demo.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("submit_demo")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from parse_html_spark.pipeline import extract_spans, prepare_partitions

df = spark.read.parquet(sys.argv[1])
out = extract_spans(prepare_partitions(df, 8))
print("SUBMIT_DEMO_SPANS=%d" % out.count())
spark.stop()
"""


def main() -> None:
    sys.path.insert(0, REPO)
    from parse_html_spark.fixtures import write_corpus_parquet

    tmp = tempfile.mkdtemp(prefix="submit_demo_")
    zip_path = os.path.join(tmp, "parse_html_spark.zip")
    pkg = os.path.join(REPO, "parse_html_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _d, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    corpus = os.path.join(tmp, "docs.parquet")
    write_corpus_parquet(corpus, 50)
    job_path = os.path.join(tmp, "job.py")
    with open(job_path, "w") as fh:
        fh.write(JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # package must come from --py-files only
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[8]",
            "--py-files", zip_path,
            job_path, corpus,
        ],
        cwd=tmp,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    marker = [
        ln for ln in res.stdout.splitlines() if ln.startswith("SUBMIT_DEMO_SPANS=")
    ]
    if not marker:
        print(res.stdout[-2000:])
        print(res.stderr[-2000:])
        raise SystemExit("spark-submit demo failed")
    print(marker[0])


if __name__ == "__main__":
    main()
