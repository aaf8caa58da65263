"""Local stand-in for the driver's correctness gate: runs every
queries() entry and its oracle_sql() twin on the same sf dir, compares
row count, sorted column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                v = "<null>"
            elif isinstance(v, float):
                v = f"{v:.10g}"
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from parse_html_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spdf)} rows")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
        if scols != ocols:
            failures.append(name)
            print(f"[FAIL] {name}: columns {scols} != {ocols}")
            continue
        if len(spdf) != len(opdf):
            failures.append(name)
            print(f"[FAIL] {name}: rows {len(spdf)} != {len(opdf)}")
            continue
        srows = canon(spdf.to_dict("records"), scols)
        orows = canon(opdf.to_dict("records"), scols)
        if srows != orows:
            failures.append(name)
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"[FAIL] {name}: value mismatch, first diffs:")
            for a, b in diff:
                print(f"   spark : {a[:200]}")
                print(f"   oracle: {b[:200]}")
        else:
            print(f"[OK] {name}: {len(spdf)} rows")
    spark.stop()
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
