"""URL pipeline ops: canonicalization recipe, host/registered-domain
extraction, broadcast blocklist anti-join, canonical-URL first-seen
dedup (non-URL rows retained)."""

import pyspark.sql.functions as F
import pytest

from parse_html_spark.functions.urlfn import (
    filter_blocked_hosts,
    url_canonicalize,
    url_dedup_first_seen,
    url_host,
    url_registered_domain,
)

CASES = [
    # (raw, canonical, host, reg_domain)
    ("HTTPS://News.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://news.example.com/a/b?a=1&b=2",
     "news.example.com", "example.com"),
    ("https://news.example.com/a/b?a=1&b=2",
     "https://news.example.com/a/b?a=1&b=2",
     "news.example.com", "example.com"),
    ("http://Host.ORG:80/page/", "http://host.org/page",
     "host.org", "host.org"),
    ("http://host.org:8080/p", "http://host.org:8080/p",
     "host.org", "host.org"),  # non-default port kept
    ("https://host.org:80/p", "https://host.org:80/p",
     "host.org", "host.org"),  # :80 is NOT default for https
    ("http://x.io", "http://x.io/", "x.io", "x.io"),
    ("http://x.io/?utm_campaign=z&fbclid=1&gclid=2",
     "http://x.io/", "x.io", "x.io"),
    ("https://sub.news.bbc.co.uk/art?fbclid=123",
     "https://sub.news.bbc.co.uk/art", "sub.news.bbc.co.uk", "co.uk"),
    ("http://a.b/p?z=1&y=2&z=0", "http://a.b/p?y=2&z=0&z=1",
     "a.b", "a.b"),  # params sorted, duplicates kept
    # multi-slash tails are ONE resource (review r7: single-slash strip
    # broke idempotence and missed slash-variant duplicates)
    ("http://a.io/x//", "http://a.io/x", "a.io", "a.io"),
    ("http://a.io///", "http://a.io/", "a.io", "a.io"),
    # FQDN trailing dot resolves identically -- must not evade a
    # blocklist or dedup separately (review r7)
    ("http://Spam.Bad.ORG./x", "http://spam.bad.org/x",
     "spam.bad.org", "bad.org"),
    ("http://spam.bad.org.:8080/x", "http://spam.bad.org:8080/x",
     "spam.bad.org", "bad.org"),
    ("not a url", None, None, None),
    ("", None, None, None),
]


def test_canonicalize_host_domain(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    rows = df.select(
        url_canonicalize(F.col("url")).alias("c"),
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()
    for (raw, canon, host, dom), r in zip(CASES, rows):
        assert r["c"] == canon, raw
        assert r["h"] == host, raw
        assert r["d"] == dom, raw


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    rows = df.select(
        url_canonicalize(F.col("url")).alias("once"),
        url_canonicalize(url_canonicalize(F.col("url"))).alias("twice"),
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"]


def test_canonicalize_idempotent_random(spark):
    """Property pin over 400 seeded-random structured URLs and junk
    strings: canonicalize(canonicalize(x)) == canonicalize(x), and the
    canonical form's host always equals url_host of the original."""
    import random

    rng = random.Random(42)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["A.b.C", "x.io", "Spam.ORG.", "a.b.c.d..", "q"]
    ports = ["", ":80", ":443", ":8080", ":"]
    paths = ["", "/", "/x", "/x/", "/x//", "/a/b.html", "///"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?utm_source=x",
               "?utm_a=1&z=9&utm_b=2", "?a=1&a=0"]
    frags = ["", "#f", "#a/b?c=1"]
    raws = []
    for _ in range(360):
        raws.append(
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths)
            + rng.choice(queries) + rng.choice(frags)
        )
    for _ in range(40):
        raws.append("".join(
            rng.choice("ab:/?#=&. ") for _ in range(rng.randrange(0, 24))
        ))
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    rows = df.select(
        "url",
        url_canonicalize(F.col("url")).alias("once"),
        url_canonicalize(url_canonicalize(F.col("url"))).alias("twice"),
        url_host(F.col("url")).alias("h"),
        url_host(url_canonicalize(F.col("url"))).alias("h2"),
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"], r["url"]
        if r["once"] is not None:
            assert r["h2"] == r["h"], r["url"]


def test_blocklist_broadcast_anti_join(spark):
    df = spark.createDataFrame(
        [(1, "http://ok.org/a"), (2, "http://Spam.BAD.org:80/x"),
         (3, "not a url"), (4, "http://spam.bad.org/other"),
         (5, "http://spam.bad.org./fqdn-dot-evasion")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("spam.bad.org",)], "host string")
    out = filter_blocked_hosts(df, bl)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_blocklist_domain_suffix(spark):
    """filter_blocked_domains blocks subdomains of blocklist entries
    (equi-join over label suffixes, never a nested-loop join); exact
    hosts elsewhere, partial-label 'notbad.org', and non-URLs survive."""
    from parse_html_spark.functions.urlfn import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (1, "http://ok.org/a"),
            (2, "http://bad.org/x"),
            (3, "http://sub.a.BAD.org:8080/y"),
            (4, "http://notbad.org/z"),   # suffix of LABELS, not chars
            (5, "junk"),
            (6, "http://bad.org.evil.com/p"),  # 'bad.org' not a suffix
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("bad.org",)], "host string")
    out = filter_blocked_domains(df, bl)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 4, 5, 6]
    assert set(out.columns) == {"doc_id", "url"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_url_dedup_first_seen(spark):
    df = spark.createDataFrame(
        [
            (5, "HTTPS://A.io:443/p/?utm_source=x&b=2&a=1"),
            (2, "https://a.io/p?a=1&b=2"),  # same canonical, lower id
            (3, "https://a.io/q"),
            (7, "junk one"),
            (8, "junk two"),  # non-URLs each keep their own row
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in url_dedup_first_seen(df).collect()}
    assert sorted(rows) == [2, 3, 7, 8]
    assert rows[2]["canonical_url"] == "https://a.io/p?a=1&b=2"
    assert rows[7]["canonical_url"] is None


def test_dedup_plan_partial_aggregation(spark):
    df = spark.createDataFrame(
        [(1, "http://a.io/x")], "doc_id long, url string"
    )
    plan = (
        url_dedup_first_seen(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan  # keeper agg map-side combined
