"""Source readers: JSONL and WARC -> span-doc table -> real extraction."""

import json

from parse_html_spark.sources.readers import (
    parse_warc_records,
    read_span_docs_jsonl,
    read_span_docs_warc,
    write_warc,
)

PAGES = [
    (
        "http://ex.com/a",
        b'<html><body><div id="main"><p>Alpha page body text here</p>'
        b"</div></body></html>",
    ),
    (
        "http://ex.com/b",
        b'<html><body><nav><a href="/x">x</a></nav><div id="main">'
        b"<p>Beta body</p></div></body></html>",
    ),
]


def test_parse_warc_records_roundtrip(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, PAGES)
    recs = list(parse_warc_records(open(p, "rb").read()))
    assert len(recs) == 2
    assert recs[0][0]["warc-target-uri"] == "http://ex.com/a"
    assert b"Alpha page body" in recs[0][1]


def test_warc_reader_plain_and_gzip(spark, tmp_path):
    from parse_html_spark.pipeline import extract_spans

    plain = str(tmp_path / "a.warc")
    gz = str(tmp_path / "b.warc.gz")
    write_warc(plain, PAGES)
    write_warc(gz, PAGES, gzip_members=True)
    for path in (plain, gz):
        docs = read_span_docs_warc(spark, path)
        rows = {r["doc_id"].split("#")[0]: r for r in docs.collect()}
        assert set(rows) == {"http://ex.com/a", "http://ex.com/b"}
        assert all(r["n_chars"] > 0 for r in rows.values())
        # the real extraction pipeline runs unchanged on WARC input
        spans = extract_spans(docs).collect()
        texts = " ".join(s["text"] for s in spans)
        assert "Alpha page body text here" in texts
        assert "Beta body" in texts


def test_wet_reader_conversion_records(spark, tmp_path):
    """Common Crawl WET layout: 'conversion' records of bare plain text
    (no HTTP envelope). The WET reader picks exactly those; the default
    WARC reader ignores them."""
    from parse_html_spark.sources.readers import read_span_docs_wet

    wet = str(tmp_path / "c.warc.wet.gz")
    texts = [("http://ex.com/a", b"alpha plain text"), ("http://ex.com/b", b"beta text")]
    write_warc(wet, texts, gzip_members=True, record_type="conversion")
    got = {
        r["doc_id"].split("#")[0]: r["spans"][0]["text"]
        for r in read_span_docs_wet(spark, wet).collect()
    }
    assert got == {
        "http://ex.com/a": "alpha plain text",
        "http://ex.com/b": "beta text",
    }
    # default WARC reader skips conversion records entirely
    assert read_span_docs_warc(spark, wet).count() == 0

    # WET text that LOOKS like an HTTP response must not get its
    # "envelope" stripped (only response records carry one), and a
    # plain-string record_types must not explode into characters
    tricky = str(tmp_path / "d.warc.wet")
    text = b"HTTP/1.1 200 OK\r\nlooks-like: a header\r\n\r\nreal body"
    write_warc(tricky, [("http://ex.com/t", text)], record_type="conversion")
    got2 = read_span_docs_wet(spark, tricky).collect()
    assert got2[0]["spans"][0]["text"] == text.decode()
    assert got2[0]["n_chars"] == len(text)
    from parse_html_spark.sources.readers import read_span_docs_warc as rw

    assert rw(spark, tricky, record_types="conversion").count() == 1


def test_jsonl_reader(spark, tmp_path):
    from parse_html_spark.pipeline import extract_spans

    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as fh:
        for i in range(3):
            fh.write(
                json.dumps(
                    {
                        "doc_id": f"j-{i}",
                        "spans": [
                            {
                                "kind": "text",
                                "text": f"<div id='main'><p>doc {i}</p></div>",
                                "media_ref": None,
                                "offset": 0,
                            }
                        ],
                        "n_chars": 30,
                    }
                )
                + "\n"
            )
    docs = read_span_docs_jsonl(spark, p)
    assert docs.count() == 3
    out = extract_spans(docs).collect()
    assert {r["doc_id"] for r in out} == {"j-0", "j-1", "j-2"}
