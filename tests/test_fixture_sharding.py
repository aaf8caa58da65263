"""write_corpus_parquet start-offset contract: sharded/resumed generation
must produce exactly [start, start+n) with no overlap or gap."""

import pyarrow.parquet as pq

from parse_html_spark.fixtures import write_corpus_parquet


def test_nonzero_start_generates_exact_range(tmp_path):
    p = str(tmp_path / "shard.parquet")
    write_corpus_parquet(p, n=5, start=200, rows_per_group=2, procs=1)
    ids = pq.read_table(p).column("doc_id").to_pylist()
    assert ids == [f"doc-{i:08d}" for i in range(200, 205)]


def test_shards_are_disjoint_and_identical_to_flat(tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    flat = str(tmp_path / "flat.parquet")
    write_corpus_parquet(a, n=4, start=0, rows_per_group=3, procs=1)
    write_corpus_parquet(b, n=4, start=4, rows_per_group=3, procs=1)
    write_corpus_parquet(flat, n=8, start=0, rows_per_group=3, procs=1)
    ids_a = pq.read_table(a).column("doc_id").to_pylist()
    ids_b = pq.read_table(b).column("doc_id").to_pylist()
    ids_flat = pq.read_table(flat).column("doc_id").to_pylist()
    assert ids_a + ids_b == ids_flat
    sp_a = pq.read_table(a).column("spans").to_pylist()
    sp_flat = pq.read_table(flat).column("spans").to_pylist()[:4]
    assert sp_a == sp_flat  # per-doc seeding: shard == flat slice
