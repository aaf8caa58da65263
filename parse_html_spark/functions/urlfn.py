"""URL pipeline operators for a crawl-scale training corpus.

Engine-new capability (the reference takes caller strings only,
/root/reference/src/ParseHTML.php:136-149): the standard pre-dedup
URL stage of a CC-Net/RefinedWeb-style pipeline -- canonicalize,
host extraction, domain blocklist filtering, and canonical-URL
first-seen dedup. Everything is pure Column expressions (one
codegen'd projection per row, no UDFs) except the blocklist join,
which broadcasts: blocklists are KBs-to-MBs against TBs of pages.

Canonicalization recipe (applied in this order, each a narrow
expression; documented so the DuckDB oracle can mirror it exactly):

1. scheme and host lowercase (userinfo is not handled: crawl URLs
   with credentials are dropped by real pipelines before this stage);
2. default ports stripped (:80 for http, :443 for https);
3. fragment stripped;
4. tracking params removed (utm_*, fbclid, gclid, msclkid, mc_eid,
   igshid, ref_src), then remaining query params SORTED for
   order-insensitive equality;
5. empty query ('?' with nothing surviving) dropped;
6. trailing '/' dropped from non-root paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# dialect-portable (Spark codegen + DuckDB RE2): no lookaround
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def url_host(col) -> Column:
    """Lowercased host (port stripped, trailing FQDN dot stripped --
    'spam.org.' resolves identically to 'spam.org' and must not evade
    a blocklist); NULL for non-URLs."""
    authority = F.lower(F.regexp_extract(col, _URL_RE, 2))
    host = F.regexp_replace(
        F.regexp_replace(authority, r":\d*$", ""), r"\.+$", ""
    )
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_registered_domain(col, n_labels: int = 2) -> Column:
    """Last ``n_labels`` host labels ('news.bbc.co.uk' -> 'co.uk' at 2).
    A public-suffix list is deployment data, not code: pass n_labels=3
    for ccTLD-heavy corpora, or join your own PSL table upstream."""
    parts = F.split(url_host(col), r"\.")
    n = F.size(parts)
    return F.when(
        n <= n_labels, F.array_join(parts, ".")
    ).otherwise(
        F.array_join(F.slice(parts, n - (n_labels - 1), n_labels), ".")
    )


def url_canonicalize(col) -> Column:
    """Canonical URL per the module recipe; NULL for non-URLs."""
    scheme = F.lower(F.regexp_extract(col, _URL_RE, 1))
    authority = F.lower(F.regexp_extract(col, _URL_RE, 2))
    path = F.regexp_extract(col, _URL_RE, 3)
    query = F.regexp_extract(col, _URL_RE, 4)  # includes leading '?'

    # FQDN trailing dot ('host.org.' == 'host.org'), keeping any port:
    # the capture puts the port back after the dots are dropped
    authority = F.regexp_replace(authority, r"\.+(:\d*)?$", r"$1")
    authority = F.when(
        (scheme == "http"), F.regexp_replace(authority, r":80$", "")
    ).otherwise(
        F.when(
            scheme == "https", F.regexp_replace(authority, r":443$", "")
        ).otherwise(authority)
    )

    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    canon_q = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))

    # ALL trailing slashes (one pass keeps canonicalization idempotent:
    # '/x', '/x/', '/x//' are one resource); a path that strips to
    # nothing is the root
    stripped = F.regexp_replace(path, r"/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    out = F.concat(scheme, F.lit("://"), authority, path, canon_q)
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(out)


def _norm_host_col(col_name: str = "host"):
    """Blocklist-side host normalization: the SAME lowercase +
    trailing-FQDN-dot strip url_host applies to corpus hosts -- a real
    DNS-dump blocklist row 'bad.org.' must match (review r7), plus a
    trim for hand-edited lists."""
    return F.regexp_replace(F.trim(F.lower(col_name)), r"\.+$", "")


def filter_blocked_hosts(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose url host appears in ``blocklist`` (a DataFrame
    with one 'host' column). Broadcast LEFT ANTI join: the blocklist is
    KBs-to-MBs, the corpus is TBs -- never shuffle the big side."""
    hosts = F.broadcast(blocklist.select(_norm_host_col().alias("host")))
    return (
        df.withColumn("_h", url_host(F.col(url_col)))
        .join(hosts, F.col("_h") == hosts["host"], "left_anti")
        .drop("_h")
    )


def filter_blocked_domains(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose url host OR ANY PARENT DOMAIN appears in
    ``blocklist`` (one 'host' column) -- real blocklists (UT1 and
    friends) are domain-level, so 'bad.org' must block
    'sub.a.bad.org' too.

    The suffix test stays an EQUI join (never a
    BroadcastNestedLoopJoin), and every join key is row-derived (no
    synthetic ids -- monotonically_increasing_id is not stable across
    plan recomputation): the corpus's DISTINCT hosts explode into
    their <= ~10 label suffixes ('a.b.c' -> a.b.c, b.c, c), those
    equi-join the broadcast blocklist to yield the blocked FULL-host
    set (bounded by host cardinality, so AQE broadcasts it), and one
    host-keyed anti join drops the rows -- the corpus side itself
    never shuffles."""
    hosts = F.broadcast(blocklist.select(_norm_host_col().alias("_bh")))
    host = url_host(F.col(url_col))
    dh = (
        df.select(host.alias("_h0"))
        .where(F.col("_h0").isNotNull())
        .distinct()
        .withColumn("_labels", F.split("_h0", r"\."))
    )
    # suffix built OUTSIDE any lambda (higher-order fns are interpreted
    # and re-evaluate captured row exprs per element -- build notes):
    # posexplode the labels, slice the carried array per exploded row
    sfx = dh.select(
        "_h0",
        F.posexplode("_labels").alias("_i", "_l"),
        F.col("_labels"),
    ).select(
        "_h0",
        F.array_join(
            F.slice(F.col("_labels"), F.col("_i") + 1, F.size("_labels")),
            ".",
        ).alias("_h"),
    )
    blocked = (
        sfx.join(hosts, F.col("_h") == F.col("_bh"))
        .select("_h0")
        .distinct()
    )
    return df.join(blocked, host == F.col("_h0"), "left_anti")


def url_dedup_first_seen(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: the min-id occurrence wins (the same
    keeper rule as exact text dedup -- deterministic in any engine).
    One hash aggregation on the canonical url, map-side combined.
    Rows whose url does not parse (canonical_url NULL) are never
    grouped -- each keeps its own row (a NULL join key would silently
    drop them instead)."""
    canon = df.withColumn("_cu", url_canonicalize(F.col(url_col)))
    key = F.coalesce(
        F.col("_cu"),
        F.concat(F.lit("\x00nonurl:"), F.col(id_col).cast("string")),
    )
    keyed = canon.withColumn("_k", key)
    keep = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(keep, ["_k", id_col])
        .drop(url_col, "_k")
        .withColumnRenamed("_cu", "canonical_url")
    )
