"""Snapshot-manifest warehouse: append isolation + time travel."""

import pytest

from parse_html_spark.sources import Warehouse


def test_append_read_time_travel(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    s0 = wh.append(df1, "t", lineage={"job": "test", "bucket": 0})
    s1 = wh.append(df2, "t")
    assert (s0, s1) == (0, 1)
    assert wh.read("t").count() == 3
    assert wh.read("t", as_of=0).count() == 2  # time travel
    snaps = wh.snapshots("t")
    assert len(snaps) == 2
    assert snaps[0]["lineage"]["job"] == "test"


def test_read_missing_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(FileNotFoundError):
        wh.read("nope")
