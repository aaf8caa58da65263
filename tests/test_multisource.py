"""One interleaved span-doc model across sources: WARC, PDF, and
JSONL readers align on (doc_id, spans, n_chars) and feed the SAME
downstream training ops in one unioned DataFrame -- the point of the
span-sequence data model."""

import json

import pyspark.sql.functions as F


def test_three_sources_one_pipeline(spark, tmp_path):
    from parse_html_spark.functions.dedup import exact_duplicates
    from parse_html_spark.functions.textfn import annotate_quality
    from parse_html_spark.sources.pdf import (
        encode_pdf,
        layout_doc,
        read_span_docs_pdf,
        wrap_lines,
    )
    from parse_html_spark.sources.readers import (
        read_span_docs_jsonl,
        read_span_docs_warc,
        write_warc,
    )

    body = ("the quick brown fox jumps over the lazy dog near the "
            "river bank again and again ") * 4
    body = body.strip()
    wrapped = "\n".join(wrap_lines(body))

    warc_dir = tmp_path / "warc"
    pdf_dir = tmp_path / "pdf"
    jsonl_dir = tmp_path / "jsonl"
    for d in (warc_dir, pdf_dir, jsonl_dir):
        d.mkdir()
    # same LOGICAL document in all three containers (the PDF line
    # wrapping inserts newlines, so give the other two the wrapped
    # form -- exact dedup must then collapse all three), plus one
    # unique doc per source
    write_warc(
        str(warc_dir / "a.warc.gz"),
        [("http://w/shared", wrapped.encode()),
         ("http://w/only-warc", b"unique warc text")],
        gzip_members=True,
    )
    (pdf_dir / "shared.pdf").write_bytes(encode_pdf(layout_doc(body)))
    (pdf_dir / "only.pdf").write_bytes(
        encode_pdf(layout_doc("unique pdf text"))
    )
    with open(jsonl_dir / "docs.jsonl", "w") as f:
        for did, t in (("j/shared", wrapped), ("j/only", "unique jsonl")):
            f.write(json.dumps({
                "doc_id": did,
                "spans": [{"kind": "text", "text": t,
                           "media_ref": None, "offset": 0}],
            }) + "\n")

    common = ["doc_id", "spans", "n_chars"]
    df = (
        read_span_docs_warc(spark, str(warc_dir)).select(common)
        .unionByName(read_span_docs_pdf(spark, str(pdf_dir))
                     .select(common))
        .unionByName(read_span_docs_jsonl(spark, str(jsonl_dir))
                     .select(common))
    )
    flat = df.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter("spans", lambda s: s["kind"] == F.lit("text")),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("text"),
    )
    rows = flat.collect()
    assert len(rows) == 6
    shared = [r for r in rows if "shared" in r["doc_id"]]
    assert len(shared) == 3
    assert len({r["text"] for r in shared}) == 1  # byte-identical

    # the same quality/dedup ops run on the union unchanged
    q = annotate_quality(flat, split_key="doc_id")
    assert q.count() == 6
    dups = exact_duplicates(q.select("doc_id", "text")).collect()
    # one duplicate group: the 3 shared docs (fp, n_docs=3, min-id keeper)
    assert len(dups) == 1
    assert dups[0]["n_docs"] == 3
