"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content extraction pipeline at
sf0.001. ``queries()`` exposes one entry per implemented operator from
SURVEY.md section 2 (plus the training-data operators); EVERY query has
a DuckDB-runnable ``oracle_sql()`` twin -- including the LSH dedup ops
(verified-minhash output equals exact-threshold Jaccard; simhash uses
DuckDB's md5_number_upper so the full algorithm is SQL) and the
iterative connected-components op (recursive-CTE closure).

The HTML-engine queries synthesize a deterministic span-document per row
of the ``documents`` table (pure SQL string building), run the REAL
tokenizer/selector/extractor engine via mapInPandas, and are checked
against trivially-SQL oracles -- end-to-end engine verification on 60k
varied documents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _variant_col():
    """Structural variant selector: doc_id % 4 (same expression the
    oracle SQL uses, so both sides agree per row)."""
    return F.pmod(F.col("doc_id").cast("bigint"), F.lit(4))


def _wrapped_html_col():
    """Deterministic HTML wrapping of a documents row (nav/header
    boilerplate + main region + kv table + form + footer).

    The structural shape is PARAMETERIZED by doc_id % 4 so the oracle
    corpus exercises four distinct document skeletons (not one fixed
    template) while every oracle stays predictable from the documents
    columns:

    v0  the original flat wrapper.
    v1  #main nested two levels deep (<div id=wrap><section>), the lead
        <p> carries a DUPLICATE data-n attribute (first-wins quirk,
        SURVEY 2.11 R5 / ParseHTML.php extractAttributes) and a junk
        close tag </foo> precedes </div> (quirk 13: junk closers do not
        close -- they stay markup and strip out of text()).
    v2  a third span.m, a second (aux) table, and a <select> control in
        the form (option-value list extraction).
    v3  #main with an extra class word, void elements <br><hr> inside
        #main, a junk closer </item> between spans, and a <textarea>
        control in the form (raw-contents extraction).
    """
    v = _variant_col()
    lead_p = lambda dup: F.concat(  # noqa: E731
        F.lit('<p class="lead" data-n="'),
        F.col("n_chars").cast("string"),
        F.lit('" data-n="999' if dup else '"'),
        F.lit('" title="Mari ') if dup else F.lit(' title="Mari '),
        F.col("lang"),
        F.lit('">'),
        F.col("text"),
        F.lit("</p>"),
    )
    main = (
        F.when(
            v == 1,
            F.concat(
                F.lit('<div id="wrap" class="outer"><section>'
                      '<div id="main" class="content main">'),
                lead_p(True),
                F.lit("</foo></div></section></div>"),
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit('<div id="main" class="content main extra">'),
                lead_p(False),
                F.lit("<br><hr></div>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<div id="main" class="content main">'),
                lead_p(False),
                F.lit("</div>"),
            )
        )
    )
    spans = F.concat(
        F.lit('<span class="m">'),
        F.col("lang"),
        F.lit('</span><span class="m">'),
        F.col("source"),
        F.lit("</span>"),
        F.when(v == 2, F.lit('<span class="m">z</span>'))
        .when(v == 3, F.lit("</item>"))
        .otherwise(F.lit("")),
    )
    tables = F.concat(
        F.lit('<table class="kv" data-kind="top-'),
        F.col("source"),
        F.lit('"><tr><td>'),
        F.col("lang"),
        F.lit("</td><td>"),
        F.col("source"),
        F.lit("</td></tr></table>"),
        F.when(
            v == 2, F.lit('<table class="aux"><tr><td>ax</td></tr></table>')
        ).otherwise(F.lit("")),
    )
    form = F.concat(
        F.lit('<form><input type="text" name="lang" value="'),
        F.col("lang"),
        F.lit('"><input type="text" name="source" value="'),
        F.col("source"),
        F.lit('">'),
        F.when(
            v == 2,
            F.concat(
                F.lit('<select name="sel"><option value="o'),
                F.col("lang"),
                F.lit('">A</option><option value="p">B</option></select>'),
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit('<textarea name="note">n-'),
                F.col("lang"),
                F.lit("</textarea>"),
            ),
        )
        .otherwise(F.lit("")),
        F.lit('<input type="submit" name="go" value="S"></form>'),
    )
    return F.concat(
        F.lit("<html><head><title>T"),
        F.col("doc_id").cast("string"),
        F.lit('</title></head><body><nav class="menu"><a href="/x">x</a> '),
        F.lit('<a href="/y">y</a></nav>'),
        main,
        spans,
        tables,
        form,
        F.lit('<footer><a href="/c">c</a></footer></body></html>'),
    )


def _span(kind, text, ref, offset):
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        ref.alias("media_ref"),
        offset.alias("offset"),
    )


def _doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> span-document table (single text span per doc).

    The sf-dir documents file is a single KB-scale row group, so the
    scan plans 1-2 splits; fan_out_small spreads the engine map stage
    over the cluster instead of serializing it on one core (round-8:
    spans_oracle/forms walls were one-task Python stages)."""
    from parse_html_spark.pipeline import fan_out_small

    return fan_out_small(_documents(spark, sf_dir)).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            _span(F.lit("text"), _wrapped_html_col(), F.lit(None).cast("string"), F.lit(0))
        ).alias("spans"),
        F.col("doc_id").alias("orig_id"),
    )


def _doc_spans_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-document table with interleaved media spans, PARAMETERIZED
    by doc_id % 3: m0 cuts the text at 50, m1 at 20, m2 carries TWO
    media spans (cuts at 20 and 40). Offsets only need to be strictly
    increasing -- assemble() pins each media slot at the cumulative text
    length, not the offset value."""
    from parse_html_spark.pipeline import fan_out_small

    docs = fan_out_small(_documents(spark, sf_dir))
    m = F.pmod(F.col("doc_id").cast("bigint"), F.lit(3))
    head = '<html><head><title>t</title></head><body><div id="main"><p>'
    tail = "</p></div></body></html>"
    null_s = F.lit(None).cast("string")
    ref_a = F.concat(F.lit("media://"), F.col("doc_id").cast("string"))
    ref_b = F.concat(ref_a, F.lit("/b"))

    def one_cut(cut):
        pre = F.concat(F.lit(head), F.substring(F.col("text"), 1, cut))
        post = F.concat(F.expr(f"substring(text, {cut + 1})"), F.lit(tail))
        return F.array(
            _span(F.lit("text"), pre, null_s, F.lit(0)),
            _span(F.lit("img"), F.lit(""), ref_a, F.lit(1)),
            _span(F.lit("text"), post, null_s, F.lit(2)),
        )

    two_cuts = F.array(
        _span(
            F.lit("text"),
            F.concat(F.lit(head), F.substring(F.col("text"), 1, 20)),
            null_s,
            F.lit(0),
        ),
        _span(F.lit("img"), F.lit(""), ref_a, F.lit(1)),
        _span(F.lit("text"), F.expr("substring(text, 21, 20)"), null_s, F.lit(2)),
        _span(F.lit("img"), F.lit(""), ref_b, F.lit(3)),
        _span(
            F.lit("text"),
            F.concat(F.expr("substring(text, 41)"), F.lit(tail)),
            null_s,
            F.lit(4),
        ),
    )
    spans = (
        F.when(m == 1, one_cut(20))
        .when(m == 2, two_cuts)
        .otherwise(one_cut(50))
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        spans.alias("spans"),
    )


# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the production one-pass page job (extract_page) --
    tokenize once, then main-content spans (compact columnar shape),
    all tables, form fields, title and node count off the same node
    index, over span-docs synthesized from sf0.001 documents."""
    from parse_html_spark.pipeline import extract_page, prepare_partitions

    df = _doc_spans(spark, "/root/testdata/sf0.001").drop("orig_id")
    df = prepare_partitions(df, partitions=8)
    return extract_page(df)


# -- query implementations --------------------------------------------------

def _q_selector_text(spark, sf_dir):
    from parse_html_spark.pipeline import select_spans

    out = select_spans(_doc_spans(spark, sf_dir), "div#main p", mode="text")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("value").alias("extracted"),
    )


def _q_selector_attr(spark, sf_dir):
    from parse_html_spark.pipeline import select_spans

    out = select_spans(
        _doc_spans(spark, sf_dir), "p.lead", mode="attr", attr_name="data-n"
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("value").cast("bigint").alias("n_chars_attr"),
    )


def _q_selector_id(spark, sf_dir):
    from parse_html_spark.pipeline import select_spans

    out = select_spans(_doc_spans(spark, sf_dir), "#main", mode="attr", attr_name="class")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("value").alias("cls"),
    )


def _q_condition_numeric(spark, sf_dir):
    from parse_html_spark.pipeline import select_spans

    out = select_spans(_doc_spans(spark, sf_dir), "p[data-n>500]", mode="attr", attr_name="data-n")
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"))


def _q_eq_second(spark, sf_dir):
    from parse_html_spark.pipeline import select_spans

    out = select_spans(_doc_spans(spark, sf_dir), "span.m", mode="text")
    return out.filter(F.col("match_order") == 1).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("value").alias("second"),
    )


def _q_multi_union(spark, sf_dir):
    from parse_html_spark.pipeline import select_spans

    out = select_spans(_doc_spans(spark, sf_dir), "nav a, footer a, span.m", mode="html")
    return out.groupBy(F.col("doc_id").cast("bigint").alias("doc_id")).agg(
        F.count("*").alias("n_matches")
    )


def _q_extract_table(spark, sf_dir):
    from parse_html_spark.pipeline import extract_tables_df

    out = extract_tables_df(_doc_spans(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cells_json"),
    )


def _q_extract_form(spark, sf_dir):
    from parse_html_spark.pipeline import extract_forms_df

    out = extract_forms_df(_doc_spans(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("form_json")
    )


def _q_post_form(spark, sf_dir):
    from parse_html_spark.pipeline import extract_post_forms_df

    out = extract_post_forms_df(_doc_spans(spark, sf_dir), trigger="nosuch")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("form_json")
    )


def _q_spans_main(spark, sf_dir):
    from parse_html_spark.pipeline import extract_spans

    out = extract_spans(_doc_spans(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("order"),
        F.col("kind"),
        F.col("text"),
        F.col("media_ref"),
    )


def _q_spans_media(spark, sf_dir):
    from parse_html_spark.pipeline import extract_spans

    out = extract_spans(_doc_spans_media(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("order"),
        F.col("kind"),
        F.col("text"),
        F.col("media_ref"),
    )


def _q_refcompat_child(spark, sf_dir):
    """Ref-compat mode A.8 UNDER THE ORACLE GATE (VERDICT r4 #5), both
    ways: each document is wrapped so `#main > p.x` has one DIRECT
    child match and one deeper-descendant match inside a <section>
    child. CSS-correct mode returns only the direct child; ref-compat
    mode re-searches each direct child's range as descendants
    [ParseHTML.php:1796-1823], returning the deep match first (document
    order) then the direct one -- the two modes' outputs diverge
    predictably and BOTH are hash-checked."""
    from parse_html_spark.pipeline import select_spans

    docs = _documents(spark, sf_dir)
    left = F.substring("text", 1, 20)
    right = F.expr("substring(text, 21)")
    html = F.concat(
        F.lit('<div id="main"><section><p class="x">'),
        left,
        F.lit('</p></section><p class="x">'),
        right,
        F.lit("</p></div>"),
    )
    df = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            _span(F.lit("text"), html, F.lit(None).cast("string"), F.lit(0))
        ).alias("spans"),
    )
    both = None
    for label, rc in (("css", False), ("ref", True)):
        out = select_spans(df, "#main > p.x", mode="text", ref_compat=rc)
        out = out.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.lit(label).alias("mode"),
            F.col("match_order").cast("int").alias("match_order"),
            F.col("value"),
        )
        both = out if both is None else both.unionByName(out)
    return both


def _q_refcompat_quoted(spark, sf_dir):
    """Ref-compat mode A.12 UNDER THE ORACLE GATE (VERDICT r5 #5),
    mirroring refcompat_child: each document is wrapped so the quoted
    selector `p[data-v="x"]` diverges predictably. The reference CODE
    appends the closing quote to the bracket value
    [ParseHTML.php:1110-1112] (its docblock golden disagrees;
    default mode follows the docblock), so ref-compat parses the value
    as `x"` -- matching ONLY the second element, whose attribute
    literally holds `x"` (single-quoted in markup); CSS-correct mode
    parses `x` and matches ONLY the first. Both modes' outputs are
    hash-checked in one row."""
    from parse_html_spark.pipeline import select_spans

    docs = _documents(spark, sf_dir)
    left = F.substring("text", 1, 20)
    right = F.expr("substring(text, 21)")
    html = F.concat(
        F.lit('<div><p data-v="x">'),
        left,
        F.lit("</p><p data-v='x\"'>"),
        right,
        F.lit("</p></div>"),
    )
    df = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            _span(F.lit("text"), html, F.lit(None).cast("string"), F.lit(0))
        ).alias("spans"),
    )
    both = None
    for label, rc in (("css", False), ("ref", True)):
        out = select_spans(df, 'p[data-v="x"]', mode="text", ref_compat=rc)
        out = out.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.lit(label).alias("mode"),
            F.col("value"),
        )
        both = out if both is None else both.unionByName(out)
    return both


def _q_op_string(spark, sf_dir):
    """All four string condition operators in ONE oracle row (round-6
    consolidation: the driver's gate runs at most 50 queries, so the
    four former rows op_contains/op_word/op_prefix/op_endswith are
    unioned here under an `op` label -- each selector still runs the
    full engine path and each sub-result is hash-checked):

    - contains: *= substring, case-INSENSITIVE (SURVEY 2.4)
    - word:     ~= whitespace-word membership, case-SENSITIVE
    - prefix:   |= prefix (v or v-word), case-SENSITIVE
    - endswith: $= suffix, case-INSENSITIVE; matches only langs
      ending in 's'
    """
    from parse_html_spark.pipeline import select_spans

    parts = (
        ("contains", "p[title*=MARI]", "title"),
        ("word", "[title~=Mari]", "title"),
        ("prefix", "[data-kind|=top]", "data-kind"),
        ("endswith", "p[title$=S]", "title"),
    )
    both = None
    for label, sel, attr in parts:
        out = select_spans(
            _doc_spans(spark, sf_dir), sel, mode="attr", attr_name=attr
        )
        out = out.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.lit(label).alias("op"),
            F.col("value"),
        )
        both = out if both is None else both.unionByName(out)
    return both


def _q_op_range(spark, sf_dir):
    # chained numeric conditions AND'd within one compound
    from parse_html_spark.pipeline import select_spans

    out = select_spans(
        _doc_spans(spark, sf_dir), "p[data-n>100][data-n<400]", mode="attr",
        attr_name="data-n",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("value").cast("bigint").alias("n"),
    )


def _q_children(spark, sf_dir):
    from parse_html_spark.pipeline import apply_ph

    def probe(ph):
        kids = ph.find("table.kv tr").children()
        return {
            "n_children": len(kids),
            "first_cell": kids.eq(0).text() if len(kids) else None,
        }

    out = apply_ph(
        _doc_spans(spark, sf_dir),
        probe,
        "n_children int, first_cell string, doc_id string",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_children",
        "first_cell",
    )


def _q_value_only(spark, sf_dir):
    from parse_html_spark.extract import extract_element
    from parse_html_spark.pipeline import apply_ph

    def probe(ph):
        return {"val": extract_element(ph.find("span.m").eq(0), val_only=True)}

    out = apply_ph(_doc_spans(spark, sf_dir), probe, "val string, doc_id string")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "val"
    )


def _q_text_striptags(spark, sf_dir):
    """strip_tags of the WHOLE document (text() terminal on fresh obj)."""
    from parse_html_spark.pipeline import apply_ph

    out = apply_ph(
        _doc_spans(spark, sf_dir),
        lambda ph: {"full_text": ph.text()},
        "full_text string, doc_id string",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "full_text"
    )


def _q_traversal(spark, sf_dir):
    """prev/next/parent traversal ops (engine extensions) end-to-end."""
    from parse_html_spark.pipeline import apply_ph

    def probe(ph):
        lead = ph.find("p.lead")
        second_span = ph.find("span.m").eq(1)
        return {
            "parent_id": lead.parent().attr("id"),
            "prev_text": second_span.prev().text(),
            "next_tag": ph.find("nav").next().attr("id"),
        }

    out = apply_ph(
        _doc_spans(spark, sf_dir),
        probe,
        "parent_id string, prev_text string, next_tag string, doc_id string",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "parent_id",
        "prev_text",
        "next_tag",
    )


def _q_text_metrics(spark, sf_dir):
    from parse_html_spark.functions.textfn import (
        STOPWORDS,
        token_count,
        tokens,
    )

    docs = _documents(spark, sf_dir)
    toks = tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        token_count(F.col("text")),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
        ).alias("punct_chars"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("stop_tokens"),
    )


def _q_lang_id(spark, sf_dir):
    from parse_html_spark.functions.textfn import lang_id

    return _documents(spark, sf_dir).select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    )


def _q_fingerprint(spark, sf_dir):
    from parse_html_spark.functions.textfn import fingerprint

    return _documents(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


def _q_dedup_exact(spark, sf_dir):
    from parse_html_spark.functions.dedup import exact_duplicates

    docs = _documents(spark, sf_dir)
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    return exact_duplicates(doubled).select("fp", "n_docs", "keeper")


def _q_jaccard_pairs(spark, sf_dir):
    """Exact token-Jaccard pairs vs the identical relational query in
    DuckDB. The default hot-token guard (max_df=1000) cannot fire here:
    document frequency is bounded by the 40-doc domain, so the capped
    operator and the uncapped oracle SQL agree by construction."""
    from parse_html_spark.functions.dedup import token_jaccard_pairs

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 40)
    return token_jaccard_pairs(docs, min_jaccard=0.2)


def _q_cosine_topk(spark, sf_dir):
    from parse_html_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb, list(qvec), k=10)


def _q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH candidates VERIFIED by exact shingle Jaccard (the
    verify-within-buckets operator). ORACLE-GRADE: the emitted set equals
    ALL pairs with shingle-Jaccard >= 0.6 (DuckDB computes that side), so
    the hash compare proves both 100% recall (planted '+tail' near-dups
    and the corpus's own near-dups must all surface through banding --
    with 64 hashes/32 bands a J=0.6 pair is missed w.p. < 1e-6, J>=0.87
    pairs w.p. < 1e-19) and 100% precision (every emitted pair clears the
    exact threshold)."""
    from parse_html_spark.functions.dedup import minhash_near_duplicates

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 60)
    near = docs.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    both = docs.select("doc_id", "text").unionByName(near)
    return minhash_near_duplicates(
        both, num_hashes=64, bands=32, min_jaccard=0.6
    ).select("id_a", "id_b", "jaccard")


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs. FULLY SQL-expressible: the token hash is
    DuckDB's md5_number_upper (little-endian upper 8 md5 bytes), and the
    chunk banding is lossless by pigeonhole (n_chunks > max_hamming), so
    the output is exactly ALL pairs within Hamming radius 8 and the
    oracle recomputes the complete algorithm in SQL."""
    from parse_html_spark.functions.dedup import simhash_near_pairs

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 60)
    near = docs.select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    both = docs.select("doc_id", "text").unionByName(near)
    return simhash_near_pairs(both, max_hamming=8)


def _q_dup_clusters(spark, sf_dir):
    """Connected components over exact-Jaccard dup pairs (iterative
    min-label propagation with pointer jumping). Oracle: DuckDB
    recursive-CTE transitive closure, cluster = min reachable id."""
    from parse_html_spark.functions.dedup import token_jaccard_pairs
    from parse_html_spark.training import dup_clusters

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 40)
    pairs = token_jaccard_pairs(docs, min_jaccard=0.2)
    return dup_clusters(pairs).select("doc_id", "cluster")


def _q_ivf_topk(spark, sf_dir):
    """IVF ANN with n_probe = n_cells (all cells probed) is EXACT by
    construction, so the approximate-search machinery (TRAINED k-means
    coarse quantizer, cell pruning, per-cell scoring) is oracle-checked
    against the same brute-force SQL as cosine_topk. train=True runs
    the full seeded spherical-k-means pass (ivf_train_centroids), so
    the training path itself sits under the oracle gate; single-probe
    recall improvement over random centroids is pinned by pytest."""
    from parse_html_spark.functions.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_cosine_topk(
        emb, list(qvec), k=10, n_cells=8, n_probe=8, train=True
    ).select("vec_id", "cosine")


def _q_quality(spark, sf_dir):
    """quality_score (the training-pipeline filter metric) as a pure
    Column expr, oracle-checked at 4 decimals against the identical
    arithmetic in DuckDB (stopword ratio, token count, punct ratio)."""
    from parse_html_spark.functions.textfn import quality_score

    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id", F.round(quality_score(F.col("text")), 4).alias("quality")
    )


def _gopher_page(docs):
    """Deterministic multiline page derived from each document (the
    sf documents are single-line, so line/paragraph structure is
    synthesized by doc_id % 4 with substring arithmetic both engines
    express identically -- the spans_media trick): 0 = distinct lines
    in two paragraphs / 1 = a duplicated two-line paragraph /
    2 = bullet-list lines / 3 = ellipsis-terminated lines with one
    duplicate."""
    a = F.substring(F.col("text"), 1, 40)
    b = F.substring(F.col("text"), 41, 40)
    c = F.substring(F.col("text"), 81, 40)
    m = F.col("doc_id") % 4
    nl = F.lit("\n")
    page = (
        F.when(m == 0, F.concat(a, nl, b, F.lit("\n\n"), c))
        .when(m == 1, F.concat(a, nl, b, F.lit("\n\n"), a, nl, b))
        .when(
            m == 2,
            F.concat(
                a, F.lit("\n- item one\n- item two\n- item three\n"), b
            ),
        )
        .otherwise(
            F.concat(a, F.lit("...\n"), b, F.lit("…\n"), a, F.lit("..."))
        )
    )
    return docs.select("doc_id", page.alias("page"))


def _q_gopher_quality(spark, sf_dir):
    """Gopher/C4 repetition-and-structure quality rules (public-paper
    provenance: Rae et al. 2021 Table A1, Raffel et al. 2020 §2.2)
    over a derived multiline page: duplicate line/paragraph counts,
    bullet and ellipsis line counts, and the integer-arithmetic
    keep/reject verdict with the first failing rule as the reason.
    Everything is a pure Column expression (whole-stage codegen); the
    output is all ints/bool/string, so the oracle hash has no
    floating-point surface at all."""
    from parse_html_spark.functions.textfn import (
        gopher_filter,
        repetition_metrics,
    )

    pages = _gopher_page(_documents(spark, sf_dir))
    rep = repetition_metrics(F.col("page"))
    verdict = gopher_filter(F.col("page"))
    return pages.select(
        "doc_id",
        rep["n_lines"].alias("n_lines"),
        rep["dup_lines"].alias("dup_lines"),
        rep["n_paras"].alias("n_paras"),
        rep["dup_paras"].alias("dup_paras"),
        rep["bullet_lines"].alias("bullet_lines"),
        rep["ellipsis_lines"].alias("ellipsis_lines"),
        verdict["keep"].alias("keep"),
        verdict["reason"].alias("reason"),
    )


def _q_hash_split(spark, sf_dir):
    """Deterministic sampling + train/val/test assignment: keep the
    salted-md5 half of the corpus (hash_sample 2048/4096, salt 's7'),
    then label each survivor by an UNSALTED 80/10/10 bucket split
    (weights 3277/410/409 in 4096ths). Both are pure filters/CASEs on
    lexicographic hex buckets -- reproducible across runs,
    partitionings and engines, which is exactly what the oracle
    checks."""
    from parse_html_spark.functions.textfn import hash_sample, split_assign

    docs = _documents(spark, sf_dir).select("doc_id")
    half = hash_sample(docs, 2048, salt="s7")
    return half.select(
        "doc_id",
        split_assign(
            F.col("doc_id"), {"train": 3277, "val": 410, "test": 409}
        ).alias("split"),
    )


def _q_line_dedup(spark, sf_dir):
    """C4-style GLOBAL line dedup over the derived multiline pages:
    the three bullet lines shared by every doc_id%4==2 page survive
    only in the first such document corpus-wide, and within-doc
    repeats (m=1/m=3 pages) drop too. The rebuilt page text itself
    goes through the hash gate, so first-occurrence attribution and
    line-order reassembly are checked byte-for-byte. min_chars=5 so
    only empty/fragment lines bypass dedup."""
    from parse_html_spark.functions.dedup import dedup_lines_global

    pages = _gopher_page(_documents(spark, sf_dir)).withColumnRenamed(
        "page", "text"
    )
    return dedup_lines_global(pages, min_chars=5)


def _q_bpe_tokens(spark, sf_dir):
    """BPE-pretokenizer token counting (the unit an LLM tokenizer
    splits further) next to the whitespace count: one lookahead-free
    regex that runs identically under Java regex (Spark) and RE2
    (DuckDB) -- a codegen'd projection, no Python."""
    from parse_html_spark.functions.textfn import (
        bpe_token_count,
        token_count,
    )

    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        token_count(F.col("text")).alias("ws_tokens"),
    )


def _q_pii_redact(spark, sf_dir):
    """PII redaction + census over documents with doc_id%4-injected
    PII (none / email / IPv4 / phone -- the sf corpus itself is
    synthetic and PII-free, so the fixture injects deterministic
    matches both engines build identically). Redacted text goes into
    the hash gate, so placeholder substitution is checked
    byte-for-byte, not just counted."""
    from parse_html_spark.functions.textfn import pii_counts, redact_pii

    docs = _documents(spark, sf_dir)
    m = F.col("doc_id") % 4
    injected = F.concat(
        F.col("text"),
        F.when(m == 1, F.lit(" contact bob.smith+x@example.co.uk now"))
        .when(m == 2, F.lit(" from host 10.0.0.255 today"))
        .when(m == 3, F.lit(" call +15551234567 soon"))
        .otherwise(F.lit("")),
    )
    p = pii_counts(injected)
    return docs.select(
        "doc_id",
        redact_pii(injected).alias("redacted"),
        p["n_email"].alias("n_email"),
        p["n_ipv4"].alias("n_ipv4"),
        p["n_phone"].alias("n_phone"),
    )


def _q_top_token(spark, sf_dir):
    """Per-document top-token repetition signal (RefinedWeb-style
    top-n-gram fraction, n=1): explode -> partial-aggregated
    (doc, token) counts -> one shuffle on the doc key shared by the
    total-count and argmax windows. Oracle: the same unnest + window
    in DuckDB, ties broken on the larger token in both."""
    from parse_html_spark.functions.textfn import top_token

    return top_token(_documents(spark, sf_dir))


def _q_topk_per_query(spark, sf_dir):
    """Batch top-k per query row (broadcast the small query side, window-
    rank the similarities; the corpus vectors never shuffle). Oracle:
    the same cross join + row_number in DuckDB. Ordering is computed on
    the ROUNDED cosine with vec_id tiebreak, so ranks are deterministic
    in both engines."""
    from parse_html_spark.functions.similarity import cosine_topk_per_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = cosine_topk_per_query(emb, queries, k=5)
    return out.select(
        "q_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


def _q_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH ANN with n_probe_buckets = 2^bits (every bucket
    probed) is EXACT by construction -- the bucketing and multi-probe
    machinery (seeded hyperplanes, sign signature, Hamming-ordered probe
    list, bucket filter) all execute but prune nothing, so the output is
    oracle-checked against the same brute-force SQL as cosine_topk.
    Single-bucket recall is pinned separately by a planted-duplicate
    pytest (tests/test_functions_spark.py)."""
    from parse_html_spark.functions.similarity import lsh_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_cosine_topk(
        emb, list(qvec), k=10, bits=3, n_probe_buckets=8
    ).select("vec_id", "cosine")


def _q_page_full(spark, sf_dir):
    """The production one-pass job shape (extract_page: tokenize once,
    all extractors share the node index) oracle-checked end to end on
    its scalar outputs (title, node count, tables JSON, form JSON)."""
    from parse_html_spark.pipeline import extract_page

    out = extract_page(_doc_spans(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "title",
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        "tables_json",
        "form_json",
    )


def _q_embed_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup dedup: multi-table hyperplane-LSH
    candidates verified by exact cosine. ORACLE-GRADE like minhash_pairs:
    planted perturbed copies sit at cosine ~0.99998 (missed by all 8
    tables w.p. ~1e-15) while the max cross pair is ~0.38, so the
    verified output equals ALL pairs with cosine >= 0.95 -- which DuckDB
    computes exactly."""
    from parse_html_spark.functions.similarity import embedding_near_duplicates

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 40)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    near = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.01)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    both = emb.unionByName(near)
    return embedding_near_duplicates(both, dim=64, min_cosine=0.95)


def _scratch_dir(prefix):
    """mkdtemp + atexit cleanup: the returned DataFrames read these
    dirs lazily, so removal must wait until the process exits."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _build_fixtures_spark_side(spark, df, writer):
    """Write oracle fixture files from EXECUTOR tasks, not the driver
    (VERDICT r6 #7: the harness itself must be scale-exemplary -- no
    driver-side .fetchall() of document tables). ``df`` carries an int
    grouping column 'g' plus whatever columns ``writer`` needs; each
    group becomes ONE applyInPandas task calling ``writer(g, pdf)``
    (rows sorted by doc_id for determinism) which writes that group's
    fixture file. The scratch dir is shared between driver and
    executors in local mode; a real cluster would point it at shared
    storage -- exactly how a distributed fixture/export job ships its
    shards. The tiny one-row-per-group result is collected only to
    force execution."""
    import pandas as pd

    from parse_html_spark.session import ensure_py_files

    ensure_py_files(spark)

    def apply_fn(pdf):
        g = int(pdf["g"].iloc[0])
        writer(g, pdf.sort_values("doc_id").reset_index(drop=True))
        return pd.DataFrame({"g": [g]})

    df.groupBy("g").applyInPandas(apply_fn, "g int").collect()


def _run_stream(start_fn, out_cols, timeout_sec=300):
    """Run an availableNow streaming job to completion and return the
    sink as a batch DataFrame."""
    import os

    base = _scratch_dir("spark_graft_stream_")
    in_dir = f"{base}/in"
    os.makedirs(in_dir, exist_ok=True)
    q, spark = start_fn(in_dir, f"{base}/out", f"{base}/ckpt")
    try:
        finished = q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        # LOUD failure: a stopped-mid-flight availableNow query leaves a
        # partially-committed sink, which would compare as silently
        # wrong rows instead of an error
        raise RuntimeError(
            f"streaming query did not finish within {timeout_sec}s"
        )
    return spark.read.parquet(f"{base}/out").select(*out_cols)


def _q_stream_dedup(spark, sf_dir):
    """Streaming first-seen exact dedup (stateful applyInPandasWithState,
    availableNow) oracle-checked against the BATCH keeper rule: over a
    doubled corpus in one micro-batch, the emitted (fp, doc_id) set
    equals md5-groups with their lexicographically-first doc_id -- the
    promoted form of the pytest batch-equivalence pin
    (tests/test_streaming.py)."""
    from parse_html_spark.streaming import streaming_dedup_first_seen

    docs = _documents(spark, sf_dir)
    doubled = (
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .unionAll(
            docs.select(
                (F.col("doc_id") + 10000000).cast("string").alias("doc_id"),
                "text",
            )
        )
        .withColumn("g", F.lit(0))
    )

    def start(in_dir, out_dir, ckpt):
        path = f"{in_dir}/docs.parquet"

        def writer(_g, pdf):
            from parse_html_spark.fixtures import write_flat_span_file

            write_flat_span_file(
                zip(pdf["doc_id"], pdf["text"]), path
            )

        _build_fixtures_spark_side(spark, doubled, writer)
        return (
            streaming_dedup_first_seen(spark, in_dir, out_dir, ckpt),
            spark,
        )

    return _run_stream(start, ["fp", "doc_id"])


def _q_stream_lsh(spark, sf_dir):
    """Streaming stateful MinHash-LSH near-dup candidates oracle-checked
    EXACTLY over the FULL sf slice (VERDICT r4 #4; 952+ docs vs round
    4's 120): every document EXCEPT the corpus's built-in near-dup
    extensions (an SQL-expressible exclusion: docs whose text extends a
    shorter doc's text as a prefix, or exactly duplicates an
    earlier-id doc's text -- those pairs have minhash agreement up to
    1.0 at unpredictable fractions like 31/32) plus one planted exact
    copy (id + 20000000) per kept doc. Verified margin on the kept set:
    max non-planted minhash agreement 0.156 (sf0.001) / 0.125 (sf0.01)
    / 0.219 (sf0.1), all ~3-5x under the 0.6 threshold, so the complete
    output is exactly one (lex-later, lex-earlier, 1.0) edge per
    original/copy pair. Lex direction matters: copies '2000000x' sort
    BEFORE originals starting with digits > '2', so both orders occur
    and greatest/least on the VARCHAR ids predicts each edge."""
    from parse_html_spark.streaming import streaming_near_dup_candidates

    _documents(spark, sf_dir).createOrReplaceTempView("_lsh_fixture_docs")
    # same kept-set rule as the DuckDB oracle, expressed in Spark SQL
    # and materialized executor-side (no driver fetchall)
    doubled = spark.sql(
        "WITH kept AS (SELECT doc_id, text FROM _lsh_fixture_docs a "
        "WHERE NOT EXISTS (SELECT 1 FROM _lsh_fixture_docs b "
        "WHERE b.text = a.text AND b.doc_id < a.doc_id) "
        "AND NOT EXISTS (SELECT 1 FROM _lsh_fixture_docs b "
        "WHERE length(b.text) < length(a.text) "
        "AND startswith(a.text, b.text))) "
        "SELECT CAST(doc_id AS STRING) AS doc_id, text, 0 AS g FROM kept "
        "UNION ALL SELECT CAST(doc_id + 20000000 AS STRING), text, 0 "
        "FROM kept"
    )

    def start(in_dir, out_dir, ckpt):
        path = f"{in_dir}/docs.parquet"

        def writer(_g, pdf):
            from parse_html_spark.fixtures import write_flat_span_file

            write_flat_span_file(zip(pdf["doc_id"], pdf["text"]), path)

        _build_fixtures_spark_side(spark, doubled, writer)
        return (
            streaming_near_dup_candidates(spark, in_dir, out_dir, ckpt),
            spark,
        )

    out = _run_stream(start, ["doc_id", "dup_of", "est_jaccard"])
    return out.distinct()


def _q_mega_spans(spark, sf_dir):
    """Mega-document extraction UNDER THE ORACLE GATE: docs 0-49 blown
    up to 47k-577k chars (text x1000 -- docs with n_chars > 500 cross
    the 500k mega threshold), run through prepare_partitions' skew
    routing (ingest-style n_chars column, both branches populated) and
    the full boilerplate extractor. Hash compares md5 + length of each
    emitted span, so the 15 MB of span text never crosses the compare
    boundary."""
    from parse_html_spark.pipeline import extract_spans, prepare_partitions

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 50)
    big = F.concat(
        F.lit('<html><body><nav class="menu"><a href="/x">x</a></nav>'
              '<div id="main"><p>'),
        F.repeat(F.col("text"), 1000),
        F.lit('</p></div><footer><a href="/c">c</a></footer></body></html>'),
    )
    df = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            _span(F.lit("text"), big, F.lit(None).cast("string"), F.lit(0))
        ).alias("spans"),
        F.length(big).cast("long").alias("n_chars"),
    )
    out = extract_spans(prepare_partitions(df, partitions=8))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("order"),
        F.md5("text").alias("text_md5"),
        F.length("text").cast("bigint").alias("n_len"),
    )


def _q_warc_source(spark, sf_dir):
    """WARC source reader under the oracle gate: documents round-trip
    through a .warc.gz archive (one gzip member per 'response' record,
    the Common Crawl layout) and back out of read_span_docs_warc's
    pure-Python ISO 28500 splitter with URI/text/n_chars intact.

    Round 6 (VERDICT r5 #1 'done' criterion): the HTTP bodies now
    exercise the real decode stack by doc_id % 4 -- 0: plain UTF-8;
    1: Content-Encoding gzip; 2: Transfer-Encoding chunked; 3:
    ISO-8859-1 charset with a non-ASCII 'café ' prefix (the oracle
    requires the properly-decoded accents, so mojibake or a skipped
    charset hash-mismatches)."""
    import os

    from parse_html_spark.sources.readers import read_span_docs_warc

    d = _scratch_dir("spark_graft_warc_")
    path = os.path.join(d, "part-0.warc.gz")

    def writer(_g, pdf):
        from parse_html_spark.sources.readers import write_warc

        pages = []
        for i, t in zip(pdf["doc_id"], pdf["text"]):
            i = int(i)
            uri = f"http://d/{i}"
            if i % 4 == 1:
                pages.append(
                    (uri, t.encode("utf-8"), {"content_encoding": "gzip"})
                )
            elif i % 4 == 2:
                pages.append(
                    (uri, t.encode("utf-8"),
                     {"chunked": True, "chunk_size": 11})
                )
            elif i % 4 == 3:
                pages.append(
                    (uri, ("café " + t).encode("latin-1"),
                     {"charset": "ISO-8859-1"})
                )
            else:
                pages.append((uri, t.encode("utf-8")))
        write_warc(path, pages, gzip_members=True)

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.lit(0)),
        writer,
    )
    df = read_span_docs_warc(spark, d)
    return df.select(
        F.split(F.col("doc_id"), "#")[0].alias("uri"),
        F.element_at("spans", 1)["text"].alias("text"),
        F.col("n_chars"),
    )


def _q_wet_source(spark, sf_dir):
    """WET source reader under the oracle gate (VERDICT r4 #8): the full
    document table round-trips through a .warc.wet.gz archive of
    'conversion' records (Common Crawl's pre-extracted-text sibling) and
    back out of read_span_docs_wet. Every 5th document's text gets an
    'HTTP/1.1 200 OK\\r\\n\\r\\n' prefix to pin the rule that conversion
    records NEVER get an HTTP envelope stripped -- under the response
    reader that prefix would vanish; here the oracle requires it
    byte-for-byte intact."""
    import os

    from parse_html_spark.sources.readers import read_span_docs_wet

    d = _scratch_dir("spark_graft_wet_")
    path = os.path.join(d, "part-0.warc.wet.gz")

    def writer(_g, pdf):
        from parse_html_spark.sources.readers import write_warc

        pages = []
        for i, t in zip(pdf["doc_id"], pdf["text"]):
            i = int(i)
            if i % 5 == 0:
                t = "HTTP/1.1 200 OK\r\n\r\n" + t
            pages.append((f"http://w/{i}", t.encode("utf-8")))
        write_warc(path, pages, gzip_members=True, record_type="conversion")

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.lit(0)),
        writer,
    )
    df = read_span_docs_wet(spark, d)
    return df.select(
        F.split(F.col("doc_id"), "#")[0].alias("uri"),
        F.element_at("spans", 1)["text"].alias("text"),
        F.col("n_chars"),
    )


def _q_pdf_source(spark, sf_dir):
    """PDF source reader under the oracle gate: documents round-trip
    through real PDF files (pdf.py's from-scratch ISO 32000 parser)
    and back out as interleaved spans with text/n_chars/page structure
    intact.

    Structural dialect varies by doc_id % 4 -- 0: classic xref +
    literal content; 1: FlateDecode content; 2: TJ kerning arrays;
    3: Type0 font + 2-byte ToUnicode CMap inside a PDF 1.5 xref/object
    stream -- so one hash gate covers every parser path. Docs with
    doc_id % 7 == 0 additionally become two-page documents with an
    embedded DCTDecode image XObject (the package's own encode_jpeg)
    splitting the text into two spans around a media span; the oracle
    predicts the page count, the media_ref label, and the one-newline
    n_chars deficit the span split causes."""
    import os

    from parse_html_spark.sources.pdf import read_span_docs_pdf

    d = _scratch_dir("spark_graft_pdf_")

    def writer(_g, pdf):
        import numpy as np

        from parse_html_spark.functions.jpeg import encode_jpeg
        from parse_html_spark.sources.pdf import encode_pdf, layout_doc

        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[::2] = 200
        jpeg = encode_jpeg(img)
        dialects = [
            {},
            {"compress": True},
            {"kerning": True},
            {"cmap": True, "objstm": True, "compress": True},
        ]
        for i, t in zip(pdf["doc_id"], pdf["text"]):
            i = int(i)
            pages = layout_doc(
                t,
                two_pages=i % 7 == 0,
                image=(jpeg, 8, 8, "Im1") if i % 7 == 0 else None,
            )
            data = encode_pdf(pages, **dialects[i % 4])
            with open(os.path.join(d, f"{i}.pdf"), "wb") as f:
                f.write(data)

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.pmod(F.col("doc_id"), F.lit(8))),
        writer,
    )
    df = read_span_docs_pdf(spark, d)
    text_spans = F.filter("spans", lambda s: s["kind"] == F.lit("text"))
    media_spans = F.filter("spans", lambda s: s["kind"] == F.lit("media"))
    return df.select(
        F.regexp_extract(F.col("doc_id"), r"(\d+)\.pdf$", 1)
        .cast("bigint").alias("doc_id"),
        F.array_join(
            F.transform(text_spans, lambda s: s["text"]), "\n"
        ).alias("text"),
        F.col("n_chars"),
        F.col("n_pages"),
        F.try_element_at(media_spans, F.lit(1))["media_ref"]
        .alias("media_ref"),
        F.col("status"),
    )


def _url_col():
    """Deterministic messy-URL synthesis from doc_id (the documents
    table has no URL column; the SAME modular recipe lives in the
    oracle SQL, which writes the CANONICAL form directly): doc_id % 5
    -- 0: uppercase scheme/host + :443 + trailing slash + utm_* +
    fragment; 1: the already-canonical twin of doc (id-1) (a cross-doc
    duplicate pair); 2: a blocklisted host with :80; 3: not a URL;
    4: shared-across-ids path with only tracking params (collides per
    id%7 class)."""
    i = F.col("doc_id").cast("bigint")
    m = F.pmod(i, F.lit(5))
    s = lambda c: c.cast("string")  # noqa: E731
    return (
        F.when(m == 0, F.concat(
            F.lit("HTTPS://Site"), s(F.pmod(i, F.lit(7))),
            F.lit(".Example.COM:443/art/"), s(i),
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ))
        .when(m == 1, F.concat(
            F.lit("https://site"), s(F.pmod(i - 1, F.lit(7))),
            F.lit(".example.com/art/"), s(i - 1), F.lit("?a=1&b=2"),
        ))
        .when(m == 2, F.concat(
            F.lit("http://Blocked"), s(F.pmod(i, F.lit(3))),
            F.lit(".Spam.ORG:80/page/"),
        ))
        .when(m == 3, F.concat(F.lit("not a url "), s(i)))
        .otherwise(F.concat(
            F.lit("http://plain"), s(F.pmod(i, F.lit(7))),
            F.lit(".org/x?utm_campaign=z#x"),
        ))
    )


def _q_url_canon(spark, sf_dir):
    """URL canonicalization + host + registered-domain as pure Column
    expressions (functions/urlfn.py) under the hash gate: the oracle
    writes the expected canonical strings directly from the modular
    recipe, so scheme/host lowercasing, default-port strip, fragment
    strip, tracking-param removal, param sorting, and trailing-slash
    normalization are each checked byte-for-byte."""
    from parse_html_spark.functions.urlfn import (
        url_canonicalize,
        url_host,
        url_registered_domain,
    )

    u = _url_col()
    return _documents(spark, sf_dir).select(
        F.col("doc_id"),
        url_canonicalize(u).alias("canonical_url"),
        url_host(u).alias("host"),
        url_registered_domain(u).alias("reg_domain"),
    )


def _q_url_dedup(spark, sf_dir):
    """Blocklist filter (broadcast LEFT ANTI -- the corpus side never
    shuffles) + canonical-URL first-seen dedup: messy/canonical twin
    pairs collapse to the lower id, same-path docs collapse per id%7
    class, blocked hosts vanish, non-URLs are all retained."""
    from parse_html_spark.functions.urlfn import (
        filter_blocked_hosts,
        url_dedup_first_seen,
    )

    df = _documents(spark, sf_dir).select(
        "doc_id", _url_col().alias("url")
    )
    bl = spark.createDataFrame(
        [(f"blocked{k}.spam.org",) for k in range(3)], "host string"
    )
    return url_dedup_first_seen(filter_blocked_hosts(df, bl)).select(
        "doc_id", "canonical_url"
    )


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination census under the hash gate: docs with
    doc_id % 31 == 0 act as the eval set (they contaminate THEMSELVES
    plus the corpus's built-in prefix-extension/exact-copy near-dups
    that share stride-1 8-token shingles); the same shingling recipe
    in DuckDB predicts every per-doc hit count."""
    from parse_html_spark.functions.dedup import decontaminate

    docs = _documents(spark, sf_dir)
    return decontaminate(
        docs, docs.filter(F.pmod("doc_id", F.lit(31)) == 0), k=8
    )


def _q_url_domain_block(spark, sf_dir):
    """Domain-suffix blocklist under the hash gate: blocking the
    PARENT domain 'spam.org' must drop every 'blocked<k>.spam.org'
    subdomain row (the exact-host rows prove the suffix chain, not
    string containment: 'plain<k>.org' survives an 'org'-free
    blocklist and non-URL rows pass through)."""
    from parse_html_spark.functions.urlfn import (
        filter_blocked_domains,
        url_host,
    )

    df = _documents(spark, sf_dir).select(
        "doc_id", _url_col().alias("url")
    )
    bl = spark.createDataFrame([("spam.org",)], "host string")
    return filter_blocked_domains(df, bl).select(
        "doc_id", url_host(F.col("url")).alias("host")
    )


def _q_chunk_dup(spark, sf_dir):
    """Exact-substring (k-token chunk) duplication census under the
    hash gate: the corpus's built-in prefix-extension and exact-copy
    near-dups share full 10-token chunks, so every count is
    SQL-predictable from the same chunking recipe in DuckDB."""
    from parse_html_spark.functions.dedup import chunk_dup_stats

    return chunk_dup_stats(_documents(spark, sf_dir), k=10)


def _pdf_fixture_jpeg():
    """The deterministic 8x8 JPEG every PDF fixture embeds; the oracle
    interpolates its exact length + md5 (the PII_PATTERNS precedent:
    package constants computed at oracle_sql() time, not hand-copied)."""
    import numpy as np

    from parse_html_spark.functions.jpeg import encode_jpeg

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[::2] = 200
    return encode_jpeg(img)


def _q_pdf_media(spark, sf_dir):
    """Embedded-image payload recovery under the hash gate: docs with
    doc_id % 7 == 0 become two-page PDFs embedding the deterministic
    fixture JPEG; read_pdf_media must return exactly one 'dct' row per
    such doc whose payload is BYTE-IDENTICAL to the embedded file
    (md5 + length checked against oracle-side constants)."""
    import os

    from parse_html_spark.sources.pdf import read_pdf_media

    jpeg = _pdf_fixture_jpeg()
    d = _scratch_dir("spark_graft_pdfmedia_")

    def writer(_g, pdf):
        from parse_html_spark.sources.pdf import encode_pdf, layout_doc

        for i, t in zip(pdf["doc_id"], pdf["text"]):
            i = int(i)
            pages = layout_doc(t, two_pages=True, image=(jpeg, 8, 8, "Im1"))
            with open(os.path.join(d, f"{i}.pdf"), "wb") as f:
                f.write(encode_pdf(pages))

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).filter(F.pmod("doc_id", F.lit(7)) == 0)
        .select("doc_id", "text")
        .withColumn("g", F.pmod(F.col("doc_id"), F.lit(8))),
        writer,
    )
    df = read_pdf_media(spark, d)
    return df.select(
        F.regexp_extract(F.col("doc_id"), r"(\d+)\.pdf$", 1)
        .cast("bigint").alias("doc_id"),
        "media_ref",
        "codec",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def _q_stream_url_dedup(spark, sf_dir):
    """Streaming stateful first-seen dedup keyed by CANONICAL URL
    (availableNow, applyInPandasWithState) oracle-checked against the
    batch keeper rule: over the _url_col corpus in one micro-batch,
    the emitted (url_key, doc_id) set equals canonical-URL groups with
    their lexicographically-first string doc_id; non-URL rows carry
    their per-doc sentinel key and all survive."""
    from parse_html_spark.streaming import streaming_url_dedup_first_seen

    urls = (
        _documents(spark, sf_dir)
        .select(
            _url_col().alias("url"),
            F.col("doc_id").cast("string").alias("doc_id"),
        )
        .withColumn("g", F.lit(0))
    )

    def start(in_dir, out_dir, ckpt):
        path = f"{in_dir}/urls.parquet"

        def writer(_g, pdf):
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table({
                    "doc_id": pa.array(pdf["doc_id"], type=pa.string()),
                    "url": pa.array(pdf["url"], type=pa.string()),
                }),
                path,
            )

        _build_fixtures_spark_side(spark, urls, writer)
        return (
            streaming_url_dedup_first_seen(spark, in_dir, out_dir, ckpt),
            spark,
        )

    return _run_stream(start, ["url_key", "doc_id"])


def _q_pdf_census(spark, sf_dir):
    """Flag-mode PDF decode census under the oracle gate (the
    warc_census sibling): documents become PDFs with rule-injected
    damage -- doc_id % 9 == 1 gets an /Encrypt trailer entry (strings
    would be RC4/AES garbage, so the parser censuses instead of
    decoding), % 9 == 4 a catalog-less header-only file, % 9 == 7 a
    clobbered startxref offset (the damaged-xref reconstruction path
    recovers the FULL text, so its chars stay in the census) -- and the
    (status_class, n_docs, total_chars) rollup is exactly
    SQL-predictable."""
    import os

    from parse_html_spark.sources.pdf import read_span_docs_pdf

    d = _scratch_dir("spark_graft_pdfcensus_")

    def writer(_g, pdf):
        from parse_html_spark.sources.pdf import encode_pdf, layout_doc

        for i, t in zip(pdf["doc_id"], pdf["text"]):
            i = int(i)
            data = encode_pdf(layout_doc(t))
            if i % 9 == 1:
                # rindex: document text embeds as plaintext literal
                # strings, so a doc whose text contains '/Root' would
                # otherwise get the injection inside a content stream
                # (review r7); the trailer's /Root is always LAST here
                j = data.rindex(b"/Root")
                data = data[:j] + b"/Encrypt 9 0 R " + data[j:]
            elif i % 9 == 4:
                data = b"%PDF-1.4\n" + t.encode()[:64]
            elif i % 9 == 7:
                j = data.rindex(b"startxref")
                data = data[:j] + b"startxref\n999999999\n%%EOF\n"
            with open(os.path.join(d, f"{i}.pdf"), "wb") as f:
                f.write(data)

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.pmod(F.col("doc_id"), F.lit(8))),
        writer,
    )
    df = read_span_docs_pdf(spark, d)
    return (
        df.groupBy(
            F.substring_index("status", ":", 1).alias("status_class")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def _q_warc_census(spark, sf_dir):
    """Flag-mode WARC decode census UNDER THE ORACLE GATE (round-5
    hardening promoted to a hash-checked row): documents are sharded
    into 10 .warc.gz archives; archives with group % 3 == 1 get a
    deliberately corrupt trailing gzip member (compression-method byte
    0xFF -> archive_error census row, real records untouched), group
    % 3 == 2 a valid trailing member holding a record with
    'Content-Length: NaN' (-> one bad_content_length row with empty
    body). warc_decode_census's (status, n_docs, total_chars) rollup is
    then exactly SQL-predictable: 500 ok docs carrying every text byte,
    3 archive errors, 3 bad-length records."""
    import os

    from parse_html_spark.sources.readers import (
        read_span_docs_warc,
        warc_decode_census,
    )

    d = _scratch_dir("spark_graft_warccensus_")

    def writer(g, pdf):
        import gzip

        from parse_html_spark.sources.readers import write_warc

        pages = [
            (f"http://d/{int(i)}", t.encode("utf-8"))
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        path = os.path.join(d, f"part-{g}.warc.gz")
        write_warc(path, pages, gzip_members=True)
        if g % 3 == 1:
            # gzip magic + invalid compression method: deterministic
            # 'corrupt gzip member' after every real record decompressed
            with open(path, "ab") as fh:
                fh.write(b"\x1f\x8b\xff\xff\xff")
        elif g % 3 == 2:
            bad_rec = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: http://bad/rec\r\n"
                b"Content-Length: NaN\r\n\r\n"
            )
            with open(path, "ab") as fh:
                fh.write(gzip.compress(bad_rec))

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.pmod(F.col("doc_id"), F.lit(10)).cast("int")),
        writer,
    )
    docs = read_span_docs_warc(spark, d, on_error="flag")
    return warc_decode_census(docs)


def _q_charset_census(spark, sf_dir):
    """warc_charset_census UNDER THE ORACLE GATE (round 6): documents
    become HTTP responses by doc_id % 5 -- 0: plain / 1: gzip
    Content-Encoding / 2: chunked / 3: ISO-8859-1 / 4: an UNKNOWN
    charset label ('x-martian', decoded via the utf-8 fallback and
    annotated) -- plus one hand-built Brotli-labeled record the stack
    cannot decode (http_decode_error, zero chars), one UNDECLARED
    cp1251 record with enough byte evidence for the round-7
    statistical sniffer (sniffed_charset:cp1251 -- properly decoded,
    detection call census-visible), and one undeclared record BELOW
    the sniffer's evidence floor (undeclared_nonutf8 annotation -- the
    residual mojibake tail stays census-visible). The (charset,
    content_encoding, status_class) rollup is then exact modular
    arithmetic in SQL: mojibake risk as one queryable table."""
    import os

    from parse_html_spark.sources.readers import (
        read_span_docs_warc,
        warc_charset_census,
    )

    d = _scratch_dir("spark_graft_charset_")
    path = os.path.join(d, "part-0.warc.gz")

    def writer(_g, pdf):
        import gzip

        from parse_html_spark.sources.readers import write_warc

        pages = []
        for i, t in zip(pdf["doc_id"], pdf["text"]):
            i = int(i)
            uri = f"http://cs/{i}"
            if i % 5 == 1:
                pages.append(
                    (uri, t.encode("utf-8"), {"content_encoding": "gzip"})
                )
            elif i % 5 == 2:
                pages.append(
                    (uri, t.encode("utf-8"),
                     {"chunked": True, "chunk_size": 9})
                )
            elif i % 5 == 3:
                pages.append(
                    (uri, t.encode("latin-1"), {"charset": "ISO-8859-1"})
                )
            elif i % 5 == 4:
                pages.append(
                    (uri, t.encode("utf-8"), {"charset": "x-martian"})
                )
            else:
                pages.append((uri, t.encode("utf-8")))
        write_warc(path, pages, gzip_members=True)
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n\x0b\x02\x80junk"
        )
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://cs/br\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )
        # one UNDECLARED legacy-charset record (round 7): cp1251 bytes,
        # no BOM, no header charset, no meta declaration -- Cyrillic
        # word-run bytes clear the sniffer's evidence floor, so the
        # census must show sniffed_charset (charset column 'cp1251',
        # all 20 chars recovered, zero U+FFFD), not clean 'ok' and not
        # mojibake-replace. The text contains 'я' (0xFF) like
        # essentially all real Russian -- the byte that is undefined
        # in cp1253 and resolves the Greek/Cyrillic strict-decode tie
        cp_payload = "привет я мир из 1251".encode("cp1251")
        # ...and one record BELOW the evidence floor (a single latin-1
        # byte): the sniffer must refuse and the utf-8-replace fallback
        # keeps the undeclared_nonutf8 bucket census-visible
        und_payload = b"menu: caf\xe9 special"
        recs = []
        for uri, payload in (
            ("http://cs/cp1251", cp_payload),
            ("http://cs/undecl", und_payload),
        ):
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + payload
            )
            recs.append(
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: " + uri.encode() + b"\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
                + body + b"\r\n\r\n"
            )
        with open(path, "ab") as fh:
            fh.write(gzip.compress(rec))
            for r in recs:
                fh.write(gzip.compress(r))

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.lit(0)),
        writer,
    )
    docs = read_span_docs_warc(spark, d, on_error="flag")
    return warc_charset_census(docs)


def _q_media_census(spark, sf_dir):
    """media_decode_census over REAL codec decodes UNDER THE ORACLE
    GATE -- including the round-5 progressive and non-interleaved
    multi-scan JPEG paths and the round-6 GIF decoder: each document
    becomes one payload by doc_id % 7 (baseline JPEG / PROGRESSIVE
    JPEG / NON-INTERLEAVED multi-scan JPEG / PNG / WAV / GIF /
    junk bytes), pixels/samples derived from the doc_id so every
    payload is distinct; extract_media_features (fake=False, flag
    mode) must decode every well-formed payload ('ok') and flag
    exactly the junk ('undecodable:unknown'), making the census
    counts pure modular arithmetic in SQL. Byte totals are
    codec-output-dependent, so the row checks (status_class,
    n_payloads, n_image, n_audio)."""
    import numpy as np
    import pandas as pd

    from parse_html_spark.functions.media import (
        extract_media_features,
        media_decode_census,
    )
    from parse_html_spark.session import ensure_py_files

    ensure_py_files(spark)
    docs = _documents(spark, sf_dir).select("doc_id")

    def make(batches):
        from parse_html_spark.functions.codecs import encode_png, encode_wav
        from parse_html_spark.functions.gif import encode_gif
        from parse_html_spark.functions.jpeg import (
            encode_jpeg,
            encode_jpeg_noninterleaved,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            refs, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                rng = np.random.RandomState(i)
                img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
                kind = i % 7
                if kind == 0:
                    p = encode_jpeg(img, quality=80)
                elif kind == 1:
                    p = encode_jpeg_progressive(img, quality=80)
                elif kind == 2:
                    p = encode_jpeg_noninterleaved(img, quality=80)
                elif kind == 3:
                    p = encode_png(img)
                elif kind == 4:
                    p = encode_wav(
                        (rng.randn(256) * 3000).astype(np.int16), 8000
                    )
                elif kind == 5:
                    # <=256 distinct colors (palette format)
                    pal = rng.randint(0, 256, (32, 3)).astype(np.uint8)
                    p = encode_gif(
                        pal[rng.randint(0, 32, (16, 16))],
                        interlace=bool(i % 2),
                    )
                else:
                    p = b"JUNK:" + str(i).encode()
                refs.append(f"media://{i}")
                payloads.append(p)
            yield pd.DataFrame({"media_ref": refs, "payload": payloads})

    pdf = docs.mapInPandas(make, schema="media_ref string, payload binary")
    # persist: census and the type-count twin below both aggregate this
    # frame -- uncached, every payload would be encoded+decoded twice
    feats = extract_media_features(pdf, fake=False, on_error="flag").persist()
    census = media_decode_census(feats).select("status_class", "n_payloads")
    types = feats.groupBy(
        F.concat_ws(":", F.slice(F.split(F.col("status"), ":"), 1, 2)).alias(
            "status_class"
        )
    ).agg(
        F.sum((F.col("media_type") == "image").cast("long")).alias("n_image"),
        F.sum((F.col("media_type") == "audio").cast("long")).alias("n_audio"),
    )
    return census.join(types, "status_class").orderBy("status_class")


def _q_jsonl_source(spark, sf_dir):
    """JSONL source reader under the oracle gate: interleaved span docs
    (text/media/text) written one JSON object per line, read back with
    the pinned schema (no inference) and the derived n_chars column
    (the file intentionally omits n_chars to exercise the derivation)."""
    import os

    from parse_html_spark.sources.readers import read_span_docs_jsonl

    d = _scratch_dir("spark_graft_jsonl_")
    path = os.path.join(d, "docs.jsonl")

    def writer(_g, pdf):
        import json

        with open(path, "w") as fh:
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                doc = {
                    "doc_id": str(i),
                    "spans": [
                        {"kind": "text", "text": t[:10], "media_ref": None,
                         "offset": 0},
                        {"kind": "media", "text": "",
                         "media_ref": f"media://{i}", "offset": 10},
                        {"kind": "text", "text": t[10:], "media_ref": None,
                         "offset": 11},
                    ],
                }
                fh.write(json.dumps(doc) + "\n")

    _build_fixtures_spark_side(
        spark,
        _documents(spark, sf_dir).select("doc_id", "text")
        .withColumn("g", F.lit(0)),
        writer,
    )
    df = read_span_docs_jsonl(spark, path)
    return df.select(
        F.col("doc_id"),
        F.size("spans").alias("n_spans"),
        F.col("n_chars"),
    )


def _q_node_counts(spark, sf_dir):
    """Exploded node table: per-doc tag histogram (relational form)."""
    from parse_html_spark.pipeline import node_table

    nodes = node_table(_doc_spans(spark, sf_dir))
    return (
        nodes.groupBy(F.col("doc_id").cast("bigint").alias("doc_id"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("tag") == "td", 1).otherwise(0)).alias("n_td"),
            F.sum(F.when(F.col("tag") == "input", 1).otherwise(0)).alias("n_input"),
        )
    )


def _q_node_descendants(spark, sf_dir):
    """Descendant matching as a broadcast range-containment join."""
    from parse_html_spark.pipeline import descendants_join, node_table

    nodes = node_table(_doc_spans(spark, sf_dir))
    hits = descendants_join(nodes, "table", "td")
    return hits.groupBy(F.col("doc_id").cast("bigint").alias("doc_id")).agg(
        F.count("*").alias("n_td_under_table")
    )


def _q_events_window(spark, sf_dir):
    """Tumbling event-time window aggregation over the events stream
    table (batch form of the streaming rollup)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            # string form avoids cross-engine timestamp stringification
            # differences in the hash compare
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")
            .alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum: exact + associative, so Spark and DuckDB agree
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def _q_window_eq(spark, sf_dir):
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # fully deterministic ordering: l_linenumber can repeat per order
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 2)
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )


def _q_anti_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


def _q_union_dedup(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    a = docs.filter(F.col("n_chars") > 300).select("doc_id")
    b = docs.filter(F.col("lang") == "en").select("doc_id")
    return a.unionByName(b).dropDuplicates(["doc_id"])


def _q_metrics_by_source(spark, sf_dir):
    from parse_html_spark.functions.textfn import token_count

    docs = _documents(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(token_count(F.col("text"))).alias("sum_tokens"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "selector_text": _q_selector_text,
        "selector_attr": _q_selector_attr,
        "selector_id": _q_selector_id,
        "condition_numeric": _q_condition_numeric,
        "eq_second": _q_eq_second,
        "multi_union": _q_multi_union,
        "extract_table": _q_extract_table,
        "extract_form": _q_extract_form,
        "post_form": _q_post_form,
        "refcompat_child": _q_refcompat_child,
        "refcompat_quoted": _q_refcompat_quoted,
        "op_string": _q_op_string,
        "op_range": _q_op_range,
        "children": _q_children,
        "value_only": _q_value_only,
        "text_striptags": _q_text_striptags,
        "traversal": _q_traversal,
        "spans_main": _q_spans_main,
        "spans_media": _q_spans_media,
        "text_metrics": _q_text_metrics,
        "lang_id": _q_lang_id,
        "quality": _q_quality,
        "gopher_quality": _q_gopher_quality,
        "top_token": _q_top_token,
        "bpe_tokens": _q_bpe_tokens,
        "pii_redact": _q_pii_redact,
        "line_dedup": _q_line_dedup,
        "hash_split": _q_hash_split,
        "fingerprint": _q_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "jaccard_pairs": _q_jaccard_pairs,
        "cosine_topk": _q_cosine_topk,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "dup_clusters": _q_dup_clusters,
        "embed_near_dup": _q_embed_near_dup,
        "page_full": _q_page_full,
        "ivf_topk": _q_ivf_topk,
        "lsh_topk": _q_lsh_topk,
        "topk_per_query": _q_topk_per_query,
        "stream_dedup": _q_stream_dedup,
        "stream_lsh": _q_stream_lsh,
        "mega_spans": _q_mega_spans,
        "warc_source": _q_warc_source,
        "wet_source": _q_wet_source,
        "pdf_source": _q_pdf_source,
        "pdf_census": _q_pdf_census,
        "url_canon": _q_url_canon,
        "url_dedup": _q_url_dedup,
        "chunk_dup": _q_chunk_dup,
        "decontaminate": _q_decontaminate,
        "url_domain_block": _q_url_domain_block,
        "stream_url_dedup": _q_stream_url_dedup,
        "pdf_media": _q_pdf_media,
        "warc_census": _q_warc_census,
        "charset_census": _q_charset_census,
        "media_census": _q_media_census,
        "jsonl_source": _q_jsonl_source,
        "node_counts": _q_node_counts,
        "node_descendants": _q_node_descendants,
        "events_window": _q_events_window,
        "window_eq": _q_window_eq,
        "anti_join": _q_anti_join,
        "union_dedup": _q_union_dedup,
        "metrics_by_source": _q_metrics_by_source,
    }


def oracle_sql() -> dict[str, str]:
    from parse_html_spark.functions.textfn import (
        BPE_TOKEN_RE,
        PII_PATTERNS,
    )

    bpe_re = BPE_TOKEN_RE.replace("'", "''")
    pii = {kind: (pat, repl) for kind, pat, repl in PII_PATTERNS}
    import hashlib

    _jpeg = _pdf_fixture_jpeg()
    jpeg_len, jpeg_md5 = len(_jpeg), hashlib.md5(_jpeg).hexdigest()
    # the _gopher_page doc_id%4 multiline derivation (shared by the
    # gopher_quality and line_dedup oracles)
    gq_page = (
        "SELECT doc_id, CASE doc_id % 4 "
        "WHEN 0 THEN substring(text,1,40) || chr(10) || "
        "substring(text,41,40) || chr(10) || chr(10) || "
        "substring(text,81,40) "
        "WHEN 1 THEN substring(text,1,40) || chr(10) || "
        "substring(text,41,40) || chr(10) || chr(10) || "
        "substring(text,1,40) || chr(10) || substring(text,41,40) "
        "WHEN 2 THEN substring(text,1,40) || chr(10) || '- item one' "
        "|| chr(10) || '- item two' || chr(10) || '- item three' || "
        "chr(10) || substring(text,41,40) "
        "ELSE substring(text,1,40) || '...' || chr(10) || "
        "substring(text,41,40) || '…' || chr(10) || "
        "substring(text,1,40) || '...' END AS page FROM documents"
    )
    stop_list = "'the','a','of','and','to','in','is','it','on','for'"
    ltok_f = (
        "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
        "t -> t <> '')"
    )
    mh_base = (
        "SELECT doc_id, text FROM documents WHERE doc_id < 60 "
        "UNION ALL SELECT doc_id + 20000000 AS doc_id, text || ' tail' "
        "AS text FROM documents WHERE doc_id < 60"
    )
    sh_base = (
        "SELECT doc_id, text FROM documents WHERE doc_id < 60 "
        "UNION ALL SELECT doc_id + 20000000 AS doc_id, text || ' x' "
        "AS text FROM documents WHERE doc_id < 60"
    )
    fp = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"
    tok = "regexp_split_to_array(trim(text), '\\s+')"
    ltok = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    lang_cnt = {
        "en": "'the','and','of','to','is'",
        "de": "'der','die','und','ist','das'",
        "fr": "'le','la','et','est','les'",
        "es": "'el','la','los','es','una'",
    }
    lang_score = {
        k: f"len(list_filter({ltok}, t -> t IN ({v})))" for k, v in lang_cnt.items()
    }
    best = f"greatest({lang_score['en']},{lang_score['de']},{lang_score['fr']},{lang_score['es']})"
    return {
        "selector_text": "SELECT doc_id, text AS extracted FROM documents",
        "selector_attr": "SELECT doc_id, n_chars AS n_chars_attr FROM documents",
        "selector_id": (
            "SELECT doc_id, CASE WHEN doc_id % 4 = 3 THEN 'content main extra' "
            "ELSE 'content main' END AS cls FROM documents"
        ),
        "condition_numeric": "SELECT doc_id FROM documents WHERE n_chars > 500",
        "eq_second": "SELECT doc_id, source AS second FROM documents",
        "multi_union": (
            "SELECT doc_id, CASE WHEN doc_id % 4 = 2 THEN 6 ELSE 5 END "
            "AS n_matches FROM documents"
        ),
        "extract_table": (
            "SELECT doc_id, '[\"' || lang || '\", \"' || source || '\"]' "
            "AS cells_json FROM documents "
            "UNION ALL SELECT doc_id, '\"ax\"' AS cells_json FROM documents "
            "WHERE doc_id % 4 = 2"
        ),
        "extract_form": (
            "SELECT doc_id, '{\"lang\": \"' || lang || '\", \"source\": \"' "
            "|| source || '\"' || CASE WHEN doc_id % 4 = 2 THEN "
            "', \"sel\": [\"o' || lang || '\", \"p\"]' "
            "WHEN doc_id % 4 = 3 THEN ', \"note\": \"n-' || lang || '\"' "
            "ELSE '' END || ', \"go\": \"S\"}' AS form_json FROM documents"
        ),
        "post_form": (
            "SELECT doc_id, '{\"lang\": \"' || lang || '\", \"source\": \"' "
            "|| source || '\"' || CASE WHEN doc_id % 4 = 2 THEN "
            "', \"sel\": [\"o' || lang || '\", \"p\"]' "
            "WHEN doc_id % 4 = 3 THEN ', \"note\": \"n-' || lang || '\"' "
            "ELSE '' END || '}' AS form_json FROM documents"
        ),
        "refcompat_child": (
            "SELECT doc_id, 'css' AS mode, 0 AS match_order, "
            "substr(text, 21) AS value FROM documents "
            "UNION ALL SELECT doc_id, 'ref', 0, substr(text, 1, 20) "
            "FROM documents "
            "UNION ALL SELECT doc_id, 'ref', 1, substr(text, 21) "
            "FROM documents"
        ),
        "refcompat_quoted": (
            "SELECT doc_id, 'css' AS mode, substr(text, 1, 20) AS value "
            "FROM documents "
            "UNION ALL SELECT doc_id, 'ref', substr(text, 21) "
            "FROM documents"
        ),
        "op_string": (
            "SELECT doc_id, 'contains' AS op, 'Mari ' || lang AS value "
            "FROM documents "
            "UNION ALL SELECT doc_id, 'word', 'Mari ' || lang "
            "FROM documents "
            "UNION ALL SELECT doc_id, 'prefix', 'top-' || source "
            "FROM documents "
            "UNION ALL SELECT doc_id, 'endswith', 'Mari ' || lang "
            "FROM documents WHERE lang LIKE '%s'"
        ),
        "op_range": (
            "SELECT doc_id, n_chars AS n FROM documents "
            "WHERE n_chars > 100 AND n_chars < 400"
        ),
        "children": (
            "SELECT doc_id, 2 AS n_children, lang AS first_cell FROM documents"
        ),
        "value_only": ("SELECT doc_id, lang AS val FROM documents"),
        "text_striptags": (
            "SELECT doc_id, 'T' || doc_id || 'x y' || text || lang || source "
            "|| CASE WHEN doc_id % 4 = 2 THEN 'z' ELSE '' END "
            "|| lang || source "
            "|| CASE WHEN doc_id % 4 = 2 THEN 'axAB' "
            "WHEN doc_id % 4 = 3 THEN 'n-' || lang ELSE '' END "
            "|| 'c' AS full_text FROM documents"
        ),
        "traversal": (
            "SELECT doc_id, 'main' AS parent_id, lang AS prev_text, "
            "CASE WHEN doc_id % 4 = 1 THEN 'wrap' ELSE 'main' END "
            "AS next_tag FROM documents"
        ),
        "spans_main": (
            'SELECT doc_id, 0 AS "order", \'text\' AS kind, text, '
            "CAST(NULL AS VARCHAR) AS media_ref FROM documents"
        ),
        "spans_media": (
            # m0 (doc_id%3=0): cut at 50; m1: cut at 20; m2: two media
            # spans with cuts at 20 and 40
            "WITH d AS (SELECT doc_id, text, doc_id % 3 AS m FROM documents) "
            "SELECT doc_id, 0 AS \"order\", 'text' AS kind, "
            "substring(text, 1, CASE WHEN m = 0 THEN 50 ELSE 20 END) AS text, "
            "CAST(NULL AS VARCHAR) AS media_ref FROM d "
            "UNION ALL SELECT doc_id, 1, 'media', '', 'media://' || doc_id "
            "FROM d "
            "UNION ALL SELECT doc_id, 2, 'text', substring(text, 51), NULL "
            "FROM d WHERE m = 0 AND length(text) > 50 "
            "UNION ALL SELECT doc_id, 2, 'text', substring(text, 21), NULL "
            "FROM d WHERE m = 1 AND length(text) > 20 "
            "UNION ALL SELECT doc_id, 2, 'text', substring(text, 21, 20), NULL "
            "FROM d WHERE m = 2 AND length(text) > 20 "
            "UNION ALL SELECT doc_id, 3, 'media', '', "
            "'media://' || doc_id || '/b' FROM d WHERE m = 2 "
            "UNION ALL SELECT doc_id, 4, 'text', substring(text, 41), NULL "
            "FROM d WHERE m = 2 AND length(text) > 40"
        ),
        "text_metrics": (
            f"SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE len({tok}) "
            "END AS token_count, length(text) - length(regexp_replace(text, "
            "'[^\\w\\s]', '', 'g')) AS punct_chars, "
            f"len(list_filter({ltok}, t -> t IN ({stop_list}))) AS stop_tokens "
            "FROM documents"
        ),
        "lang_id": (
            f"SELECT doc_id, CASE WHEN {best} = 0 THEN 'und' "
            f"WHEN {lang_score['en']} = {best} THEN 'en' "
            f"WHEN {lang_score['de']} = {best} THEN 'de' "
            f"WHEN {lang_score['fr']} = {best} THEN 'fr' "
            "ELSE 'es' END AS lang_pred FROM documents"
        ),
        "quality": (
            "SELECT doc_id, round(least(greatest("
            "0.4 * least((CASE WHEN ntok = 0 THEN 0 ELSE stop / ntok END) "
            "* 5.0, 1.0) + 0.4 * least(ntok / 100.0, 1.0) "
            "+ 0.2 * (1.0 - least((CASE WHEN total = 0 THEN 0 ELSE "
            "punct / total END) * 4.0, 1.0)), 0.0), 1.0), 4) AS quality "
            "FROM (SELECT doc_id, "
            f"CASE WHEN trim(text) = '' THEN 0 ELSE len({tok}) END AS ntok, "
            f"len(list_filter({ltok}, t -> t IN ({stop_list}))) AS stop, "
            "length(text) AS total, length(text) - length(regexp_replace("
            "text, '[^\\w\\s]', '', 'g')) AS punct FROM documents)"
        ),
        # gopher_quality: the SAME doc_id%4 page derivation, list ops,
        # and integer-arithmetic rule chain as _q_gopher_quality -- the
        # output has no floating-point surface at all
        "gopher_quality": (
            f"WITH p AS ({gq_page}), "
            "m AS (SELECT doc_id, "
            "list_filter(list_transform(string_split(page, chr(10)), "
            "x -> trim(x)), x -> x <> '') AS lines, "
            "list_filter(list_transform(regexp_split_to_array(page, "
            "'\\n\\n+'), x -> trim(x)), x -> x <> '') AS paras, "
            "len(regexp_split_to_array(trim(page), '\\s+')) AS n_tok, "
            "length(regexp_replace(page, '\\s', '', 'g')) AS tok_chars, "
            "length(page) - length(replace(page, '#', '')) AS hash_chars, "
            "CAST((length(page) - length(replace(page, '...', ''))) / 3 "
            "AS BIGINT) AS ell_seqs, "
            "len(list_filter(list_distinct(regexp_split_to_array("
            f"trim(lower(page)), '\\s+')), t -> t IN ({stop_list}))) "
            "AS n_stop FROM p), "
            "s AS (SELECT doc_id, len(lines) AS n_lines, "
            "len(lines) - len(list_distinct(lines)) AS dup_lines, "
            "len(paras) AS n_paras, "
            "len(paras) - len(list_distinct(paras)) AS dup_paras, "
            "len(list_filter(lines, x -> starts_with(x, '- ') OR "
            "starts_with(x, '* ') OR starts_with(x, '•'))) "
            "AS bullet_lines, "
            "len(list_filter(lines, x -> ends_with(x, '...') OR "
            "ends_with(x, '…'))) AS ellipsis_lines, "
            "n_tok, tok_chars, hash_chars, ell_seqs, n_stop FROM m) "
            "SELECT doc_id, n_lines, dup_lines, n_paras, dup_paras, "
            "bullet_lines, ellipsis_lines, reason = 'keep' AS keep, "
            "reason FROM (SELECT *, CASE "
            "WHEN n_tok < 10 THEN 'too_few_tokens' "
            "WHEN n_tok > 100000 THEN 'too_many_tokens' "
            "WHEN tok_chars < 3 * n_tok THEN 'bad_mean_token_len' "
            "WHEN tok_chars > 10 * n_tok THEN 'bad_mean_token_len' "
            "WHEN (hash_chars + ell_seqs) * 10 > n_tok "
            "THEN 'symbol_ratio' "
            "WHEN bullet_lines * 10 > n_lines * 9 THEN 'bullet_lines' "
            "WHEN ellipsis_lines * 10 > n_lines * 3 "
            "THEN 'ellipsis_lines' "
            "WHEN dup_lines * 10 > n_lines * 3 THEN 'dup_lines' "
            "WHEN dup_paras * 10 > n_paras * 3 THEN 'dup_paras' "
            "WHEN n_stop < 2 THEN 'too_few_stopwords' "
            "ELSE 'keep' END AS reason FROM s)"
        ),
        # hash_split: 3277 = 0xccd, 3277+410 = 3687 = 0xe67,
        # sample threshold 2048 = 0x800
        "hash_split": (
            "SELECT doc_id, CASE "
            "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 30, 3) < 'ccd' "
            "THEN 'train' "
            "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 30, 3) < 'e67' "
            "THEN 'val' ELSE 'test' END AS split FROM documents "
            "WHERE substring(md5(CAST(doc_id AS VARCHAR) || 's7'), 30, 3) "
            "< '800'"
        ),
        "line_dedup": (
            f"WITH p AS ({gq_page}), "
            "l AS (SELECT doc_id, "
            "unnest(string_split(page, chr(10))) AS line, "
            "generate_subscripts(string_split(page, chr(10)), 1) AS pos "
            "FROM p), "
            "k AS (SELECT doc_id, pos, line, length(line) < 5 OR "
            "row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) "
            "= 1 AS keep FROM l) "
            "SELECT doc_id, coalesce(string_agg("
            "CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') "
            "AS text_dedup, "
            "CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept, "
            "CAST(count(*) - count(CASE WHEN keep THEN 1 END) AS BIGINT) "
            "AS n_dropped FROM k GROUP BY doc_id"
        ),
        "bpe_tokens": (
            "SELECT doc_id, len(list_filter(regexp_extract_all(text, "
            f"'{bpe_re}'), m -> trim(m) <> '')) AS bpe_tokens, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END "
            "AS ws_tokens FROM documents"
        ),
        "pii_redact": (
            "WITH p AS (SELECT doc_id, text || CASE doc_id % 4 "
            "WHEN 1 THEN ' contact bob.smith+x@example.co.uk now' "
            "WHEN 2 THEN ' from host 10.0.0.255 today' "
            "WHEN 3 THEN ' call +15551234567 soon' ELSE '' END AS t "
            "FROM documents) "
            "SELECT doc_id, regexp_replace(regexp_replace("
            f"regexp_replace(t, '{pii['email'][0]}', "
            f"'{pii['email'][1]}', 'g'), '{pii['ipv4'][0]}', "
            f"'{pii['ipv4'][1]}', 'g'), '{pii['phone'][0]}', "
            f"'{pii['phone'][1]}', 'g') AS redacted, "
            f"len(regexp_extract_all(t, '{pii['email'][0]}')) AS n_email, "
            f"len(regexp_extract_all(t, '{pii['ipv4'][0]}')) AS n_ipv4, "
            f"len(regexp_extract_all(t, '{pii['phone'][0]}')) AS n_phone "
            "FROM p"
        ),
        "top_token": (
            f"WITH toks AS (SELECT doc_id, unnest({ltok_f}) AS tok "
            "FROM documents), "
            "counts AS (SELECT doc_id, tok, count(*) AS c FROM toks "
            "GROUP BY 1, 2), "
            "r AS (SELECT doc_id, tok, c, "
            "CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) "
            "AS n_tokens, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY c DESC, tok DESC) AS rn FROM counts) "
            "SELECT doc_id, tok AS top_tok, c AS top_count, n_tokens, "
            "round(c / n_tokens, 4) AS top_frac FROM r WHERE rn = 1"
        ),
        "fingerprint": f"SELECT doc_id, {fp} AS fp FROM documents",
        "dedup_exact": (
            f"WITH doubled AS (SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 10000000, text FROM documents) "
            f"SELECT {fp} AS fp, count(*) AS n_docs, min(doc_id) AS keeper "
            "FROM doubled GROUP BY 1 HAVING count(*) > 1"
        ),
        "jaccard_pairs": (
            "WITH toks AS (SELECT DISTINCT doc_id AS id, unnest("
            "regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok "
            "FROM documents WHERE doc_id < 40), "
            "toks2 AS (SELECT id, tok FROM toks WHERE tok <> ''), "
            "sizes AS (SELECT id, count(*) AS n_tok FROM toks2 GROUP BY id), "
            "common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common "
            "FROM toks2 a JOIN toks2 b ON a.tok = b.tok AND a.id < b.id "
            "GROUP BY 1, 2) "
            "SELECT id_a, id_b, round(common / (sa.n_tok + sb.n_tok - common), 4) "
            "AS jaccard FROM common "
            "JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b "
            "WHERE round(common / (sa.n_tok + sb.n_tok - common), 4) >= 0.2"
        ),
        # the verified-minhash output equals ALL pairs with shingle
        # Jaccard >= 0.6 (LSH banding is recall-certain far above the
        # data's threshold gap) -- DuckDB computes that side exactly
        "minhash_pairs": (
            f"WITH base AS ({mh_base}), "
            f"tok AS (SELECT doc_id, unnest({ltok_f}) AS tok, "
            f"generate_subscripts({ltok_f}, 1) AS pos FROM base), "
            "sh AS (SELECT DISTINCT doc_id AS id, tok || ' ' || "
            "lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle "
            "FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos) "
            "QUALIFY lead(tok, 2) OVER w IS NOT NULL "
            # docs with <3 tokens collapse to ONE joined-token shingle
            # (matching shingles_col / _minhash_sig exactly)
            f"UNION SELECT doc_id, coalesce(array_to_string({ltok_f}, ' '), '') "
            f"FROM base WHERE len({ltok_f}) < 3), "
            "sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id), "
            "common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c "
            "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id "
            "GROUP BY 1, 2) "
            "SELECT id_a, id_b, round(c / (sa.n + sb.n - c), 4) AS jaccard "
            "FROM common JOIN sizes sa ON sa.id = id_a "
            "JOIN sizes sb ON sb.id = id_b "
            "WHERE round(c / (sa.n + sb.n - c), 4) >= 0.6"
        ),
        # the COMPLETE simhash algorithm in SQL: token hash is DuckDB's
        # md5_number_upper; chunk banding is pigeonhole-lossless so the
        # Spark output is exactly all pairs within Hamming radius 8
        "simhash_pairs": (
            f"WITH base AS ({sh_base}), "
            f"toks AS (SELECT doc_id, unnest({ltok_f}) AS tok FROM base), "
            "bits AS (SELECT doc_id, b.bit, SUM(CASE WHEN "
            "(md5_number_upper(tok) >> (63 - b.bit)) & 1 = 1 "
            "THEN 1 ELSE -1 END) AS acc FROM toks "
            "CROSS JOIN (SELECT unnest(range(64)) AS bit) b GROUP BY 1, 2), "
            "sims AS (SELECT doc_id, CAST(SUM(CASE WHEN acc > 0 THEN "
            "CASE WHEN bit = 0 THEN -9223372036854775808 "
            "ELSE (CAST(1 AS BIGINT) << CAST(63 - bit AS INT)) END "
            "ELSE 0 END) AS BIGINT) AS sh FROM bits GROUP BY 1) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming "
            "FROM sims a JOIN sims b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.sh, b.sh)) <= 8"
        ),
        # iterative connected components vs a recursive-CTE transitive
        # closure: cluster = min reachable doc_id over the same exact
        # Jaccard pair graph the green jaccard_pairs oracle uses
        "dup_clusters": (
            "WITH RECURSIVE toks AS (SELECT DISTINCT doc_id AS id, unnest("
            "regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok "
            "FROM documents WHERE doc_id < 40), "
            "toks2 AS (SELECT id, tok FROM toks WHERE tok <> ''), "
            "sizes AS (SELECT id, count(*) AS n_tok FROM toks2 GROUP BY id), "
            "common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common "
            "FROM toks2 a JOIN toks2 b ON a.tok = b.tok AND a.id < b.id "
            "GROUP BY 1, 2), "
            "pairs AS (SELECT id_a, id_b FROM common "
            "JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b "
            "WHERE round(common / (sa.n_tok + sb.n_tok - common), 4) >= 0.2), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs), "
            "reach(src, dst) AS (SELECT a, a FROM edges UNION "
            "SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst) "
            "SELECT src AS doc_id, min(dst) AS cluster FROM reach "
            "GROUP BY src"
        ),
        "topk_per_query": (
            "WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) "
            "AS qv FROM embeddings WHERE vec_id < 3), "
            "s AS (SELECT q.q_id, e.vec_id, round(list_cosine_similarity("
            "CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cosine "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT q_id, vec_id, cosine, rank FROM ("
            "SELECT *, CAST(row_number() OVER (PARTITION BY q_id "
            "ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s) "
            "WHERE rank <= 5"
        ),
        "lsh_topk": (
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            "), 4) AS cosine FROM embeddings "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "ivf_topk": (
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            "), 4) AS cosine FROM embeddings "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "page_full": (
            "SELECT doc_id, 'T' || doc_id AS title, "
            "CAST(CASE doc_id % 4 WHEN 0 THEN 21 WHEN 1 THEN 23 "
            "WHEN 2 THEN 28 ELSE 24 END AS BIGINT) AS n_nodes, "
            "'[[\"' || lang || '\", \"' || source || '\"]' || "
            "CASE WHEN doc_id % 4 = 2 THEN ', \"ax\"]' ELSE ']' END "
            "AS tables_json, "
            "'{\"lang\": \"' || lang || '\", \"source\": \"' || source "
            "|| '\"' || CASE WHEN doc_id % 4 = 2 THEN "
            "', \"sel\": [\"o' || lang || '\", \"p\"]' "
            "WHEN doc_id % 4 = 3 THEN ', \"note\": \"n-' || lang || '\"' "
            "ELSE '' END || ', \"go\": \"S\"}' AS form_json FROM documents"
        ),
        "embed_near_dup": (
            "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings WHERE vec_id < 40 "
            "UNION ALL SELECT vec_id + 100000, "
            "[CAST(embedding[1] AS DOUBLE) + 0.01] || "
            "CAST(embedding[2:] AS DOUBLE[]) "
            "FROM embeddings WHERE vec_id < 40) "
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(a.v, b.v), 4) AS cosine "
            "FROM base a JOIN base b ON a.vec_id < b.vec_id "
            "WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.95"
        ),
        "cosine_topk": (
            "SELECT vec_id, round(list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            "), 4) AS cosine FROM embeddings "
            "ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "stream_dedup": (
            "WITH doubled AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text "
            "FROM documents UNION ALL SELECT CAST(doc_id + 10000000 AS "
            "VARCHAR), text FROM documents) "
            "SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM doubled "
            "GROUP BY text"
        ),
        "stream_lsh": (
            "WITH kept AS (SELECT doc_id FROM documents a "
            "WHERE NOT EXISTS (SELECT 1 FROM documents b "
            "WHERE b.text = a.text AND b.doc_id < a.doc_id) "
            "AND NOT EXISTS (SELECT 1 FROM documents b "
            "WHERE length(b.text) < length(a.text) "
            "AND starts_with(a.text, b.text))) "
            "SELECT greatest(CAST(doc_id AS VARCHAR), "
            "CAST(doc_id + 20000000 AS VARCHAR)) AS doc_id, "
            "least(CAST(doc_id AS VARCHAR), "
            "CAST(doc_id + 20000000 AS VARCHAR)) AS dup_of, "
            "CAST(1.0 AS DOUBLE) AS est_jaccard FROM kept"
        ),
        "mega_spans": (
            'SELECT doc_id, 0 AS "order", md5(repeat(text, 1000)) AS '
            "text_md5, CAST(length(text) * 1000 AS BIGINT) AS n_len "
            "FROM documents WHERE doc_id < 50"
        ),
        "warc_source": (
            "SELECT 'http://d/' || doc_id AS uri, "
            "CASE WHEN doc_id % 4 = 3 THEN 'café ' || text ELSE text END "
            "AS text, "
            "CAST(length(text) + CASE WHEN doc_id % 4 = 3 THEN 5 ELSE 0 END "
            "AS BIGINT) AS n_chars FROM documents"
        ),
        "charset_census": (
            "SELECT 'iso8859-1' AS charset, 'identity' AS content_encoding, "
            "'ok' AS status_class, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(text)) AS BIGINT) AS total_chars "
            "FROM documents WHERE doc_id % 5 = 3 "
            "UNION ALL SELECT 'cp1251', 'identity', 'sniffed_charset', "
            "CAST(1 AS BIGINT), CAST(20 AS BIGINT) "
            "UNION ALL SELECT 'utf-8', 'br', 'http_decode_error', "
            "CAST(1 AS BIGINT), CAST(0 AS BIGINT) "
            "UNION ALL SELECT 'utf-8', 'gzip', 'ok', "
            "CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) "
            "FROM documents WHERE doc_id % 5 = 1 "
            "UNION ALL SELECT 'utf-8', 'identity', 'ok', "
            "CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) "
            "FROM documents WHERE doc_id % 5 IN (0, 2) "
            "UNION ALL SELECT 'utf-8', 'identity', 'undeclared_nonutf8', "
            "CAST(1 AS BIGINT), CAST(18 AS BIGINT) "
            "UNION ALL SELECT 'utf-8', 'identity', 'unknown_charset', "
            "CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) "
            "FROM documents WHERE doc_id % 5 = 4"
        ),
        "media_census": (
            "SELECT 'ok' AS status_class, "
            "CAST(sum(CASE WHEN doc_id % 7 < 6 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_payloads, "
            "CAST(sum(CASE WHEN doc_id % 7 IN (0,1,2,3,5) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_image, "
            "CAST(sum(CASE WHEN doc_id % 7 = 4 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_audio FROM documents "
            "UNION ALL SELECT 'undecodable:unknown', "
            "CAST(sum(CASE WHEN doc_id % 7 = 6 THEN 1 ELSE 0 END) AS BIGINT), "
            "CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM documents"
        ),
        "warc_census": (
            "SELECT 'archive_error' AS status, CAST(3 AS BIGINT) AS n_docs, "
            "CAST(0 AS BIGINT) AS total_chars "
            "UNION ALL SELECT 'bad_content_length', 3, 0 "
            "UNION ALL SELECT 'ok', CAST(count(*) AS BIGINT), "
            "CAST(sum(length(text)) AS BIGINT) FROM documents"
        ),
        "wet_source": (
            "SELECT 'http://w/' || doc_id AS uri, "
            "CASE WHEN doc_id % 5 = 0 THEN 'HTTP/1.1 200 OK' || chr(13) || "
            "chr(10) || chr(13) || chr(10) || text ELSE text END AS text, "
            "CAST(length(text) + CASE WHEN doc_id % 5 = 0 THEN 19 ELSE 0 END "
            "AS BIGINT) AS n_chars FROM documents"
        ),
        "jsonl_source": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, 3 AS n_spans, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM documents"
        ),
        "pdf_media": (
            # one dct row per image-bearing doc; payload byte-identity
            # via interpolated length + md5 of the deterministic
            # fixture JPEG (computed from the package at oracle time)
            f"SELECT doc_id, 'pdf:Im1:8x8' AS media_ref, "
            f"'dct' AS codec, CAST({jpeg_len} AS BIGINT) AS n_bytes, "
            f"'{jpeg_md5}' AS payload_md5 "
            f"FROM documents WHERE doc_id % 7 = 0"
        ),
        "stream_url_dedup": (
            "WITH u AS (SELECT CAST(doc_id AS VARCHAR) AS sid, "
            "CASE doc_id % 5 "
            "WHEN 0 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.example.com/art/' || CAST(doc_id AS VARCHAR) "
            "|| '?a=1&b=2' "
            "WHEN 1 THEN 'https://site' || CAST((doc_id - 1) % 7 AS "
            "VARCHAR) || '.example.com/art/' || CAST(doc_id - 1 AS "
            "VARCHAR) || '?a=1&b=2' "
            "WHEN 2 THEN 'http://blocked' || CAST(doc_id % 3 AS VARCHAR) "
            "|| '.spam.org/page' "
            "WHEN 3 THEN chr(0) || 'nonurl:' || CAST(doc_id AS VARCHAR) "
            "WHEN 4 THEN 'http://plain' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.org/x' END AS url_key FROM documents) "
            "SELECT url_key, min(sid) AS doc_id FROM u GROUP BY url_key"
        ),
        "url_domain_block": (
            "SELECT doc_id, CASE doc_id % 5 "
            "WHEN 0 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.example.com' "
            "WHEN 1 THEN 'site' || CAST((doc_id - 1) % 7 AS VARCHAR) "
            "|| '.example.com' "
            "WHEN 4 THEN 'plain' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.org' END AS host "
            "FROM documents WHERE doc_id % 5 <> 2"
        ),
        "decontaminate": (
            # stride-1 8-token shingles, shingles_col's short-doc rule
            # (len < k collapses to one whole-doc shingle); benchmark =
            # doc_id % 31 == 0
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            "x -> x <> '') AS t FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, "
            "CASE WHEN len(t) < 8 THEN array_to_string(t, ' ') "
            "ELSE array_to_string(t[j+1:j+8], ' ') END AS s "
            "FROM toks, UNNEST(range(GREATEST(len(t) - 7, 1))) AS u(j)), "
            "hits AS (SELECT a.doc_id, count(*) AS n FROM sh a "
            "WHERE a.s IN (SELECT s FROM sh WHERE doc_id % 31 = 0) "
            "GROUP BY a.doc_id) "
            "SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS "
            "n_hits, coalesce(h.n, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN hits h USING(doc_id)"
        ),
        "chunk_dup": (
            # identical chunking recipe: lower/trim, \s+ split, empties
            # removed, non-overlapping full 10-token windows
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            "x -> x <> '') AS t FROM documents), "
            "occ AS (SELECT doc_id, "
            "array_to_string(t[j*10+1:j*10+10], ' ') AS chunk "
            "FROM toks, UNNEST(range(CAST(floor(len(t)/10.0) AS "
            "BIGINT))) AS u(j)), "
            "cnt AS (SELECT chunk, count(*) AS c FROM occ GROUP BY "
            "chunk), "
            "st AS (SELECT occ.doc_id, count(*) AS n_chunks, "
            "sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS n_dup "
            "FROM occ JOIN cnt USING(chunk) GROUP BY occ.doc_id) "
            "SELECT d.doc_id, CAST(coalesce(st.n_chunks, 0) AS BIGINT) "
            "AS n_chunks, CAST(coalesce(st.n_dup, 0) AS BIGINT) AS "
            "n_dup_chunks, round(coalesce(st.n_dup, 0) * 1.0 / "
            "greatest(coalesce(st.n_chunks, 0), 1), 4) AS dup_ratio "
            "FROM documents d LEFT JOIN st USING(doc_id)"
        ),
        "url_canon": (
            # the oracle writes the CANONICAL forms straight from the
            # doc_id % 5 recipe (_url_col builds the messy inputs)
            "SELECT doc_id, "
            "CASE doc_id % 5 "
            "WHEN 0 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.example.com/art/' || CAST(doc_id AS VARCHAR) "
            "|| '?a=1&b=2' "
            "WHEN 1 THEN 'https://site' || CAST((doc_id - 1) % 7 AS "
            "VARCHAR) || '.example.com/art/' || CAST(doc_id - 1 AS "
            "VARCHAR) || '?a=1&b=2' "
            "WHEN 2 THEN 'http://blocked' || CAST(doc_id % 3 AS VARCHAR) "
            "|| '.spam.org/page' "
            "WHEN 4 THEN 'http://plain' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.org/x' END AS canonical_url, "
            "CASE doc_id % 5 "
            "WHEN 0 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.example.com' "
            "WHEN 1 THEN 'site' || CAST((doc_id - 1) % 7 AS VARCHAR) "
            "|| '.example.com' "
            "WHEN 2 THEN 'blocked' || CAST(doc_id % 3 AS VARCHAR) "
            "|| '.spam.org' "
            "WHEN 4 THEN 'plain' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.org' END AS host, "
            "CASE doc_id % 5 "
            "WHEN 0 THEN 'example.com' WHEN 1 THEN 'example.com' "
            "WHEN 2 THEN 'spam.org' "
            "WHEN 4 THEN 'plain' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.org' END AS reg_domain "
            "FROM documents"
        ),
        "url_dedup": (
            "WITH u AS (SELECT doc_id, CASE doc_id % 5 "
            "WHEN 0 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.example.com/art/' || CAST(doc_id AS VARCHAR) "
            "|| '?a=1&b=2' "
            "WHEN 1 THEN 'https://site' || CAST((doc_id - 1) % 7 AS "
            "VARCHAR) || '.example.com/art/' || CAST(doc_id - 1 AS "
            "VARCHAR) || '?a=1&b=2' "
            "WHEN 4 THEN 'http://plain' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '.org/x' END AS canonical_url "
            "FROM documents WHERE doc_id % 5 <> 2) "
            "SELECT doc_id, canonical_url FROM u a "
            "WHERE a.canonical_url IS NULL "
            "OR a.doc_id = (SELECT min(b.doc_id) FROM u b "
            "WHERE b.canonical_url = a.canonical_url)"
        ),
        "pdf_census": (
            # wrapped chars = len + ceil(len/64) - 1 (single text span);
            # damaged-startxref docs (%9=7) recover fully via xref
            # reconstruction, encrypted (%9=1) and catalog-less (%9=4)
            # decode nothing
            "SELECT 'ok' AS status_class, CAST(count(*) AS BIGINT) AS "
            "n_docs, CAST(sum(length(text) + CAST(ceil(length(text) / "
            "64.0) AS BIGINT) - 1) AS BIGINT) AS total_chars "
            "FROM documents WHERE doc_id % 9 NOT IN (1, 4, 7) "
            "UNION ALL SELECT 'ok_with_warnings', CAST(count(*) AS "
            "BIGINT), CAST(sum(length(text) + CAST(ceil(length(text) / "
            "64.0) AS BIGINT) - 1) AS BIGINT) "
            "FROM documents WHERE doc_id % 9 = 7 "
            "UNION ALL SELECT 'pdf_error', CAST(count(*) AS BIGINT), "
            "CAST(0 AS BIGINT) FROM documents WHERE doc_id % 9 IN (1, 4)"
        ),
        "pdf_source": (
            # wrapped = text split into 64-char PDF lines joined by \n;
            # two-page image docs (id%7=0, >1 line) lose one joining
            # newline to the text-span split around the media span
            "SELECT doc_id, "
            "rtrim(regexp_replace(text, '(.{64})', '\\1' || chr(10), 'g'), "
            "chr(10)) AS text, "
            "CAST(length(text) + CAST(ceil(length(text) / 64.0) AS BIGINT) "
            "- 1 - CASE WHEN doc_id % 7 = 0 AND length(text) > 64 "
            "THEN 1 ELSE 0 END AS BIGINT) AS n_chars, "
            "CAST(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 1 END AS INT) "
            "AS n_pages, "
            "CASE WHEN doc_id % 7 = 0 THEN 'pdf:Im1:8x8' END AS media_ref, "
            "'ok' AS status FROM documents"
        ),
        "node_counts": (
            "SELECT doc_id, CAST(CASE doc_id % 4 WHEN 0 THEN 21 WHEN 1 THEN 23 "
            "WHEN 2 THEN 28 ELSE 24 END AS BIGINT) AS n_nodes, "
            "CAST(CASE WHEN doc_id % 4 = 2 THEN 3 ELSE 2 END AS BIGINT) AS n_td, "
            "CAST(3 AS BIGINT) AS n_input FROM documents"
        ),
        "node_descendants": (
            "SELECT doc_id, CAST(CASE WHEN doc_id % 4 = 2 THEN 3 ELSE 2 END "
            "AS BIGINT) AS n_td_under_table FROM documents"
        ),
        "events_window": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') "
            "AS hour, event_type, "
            "count(*) AS n_events, "
            "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "window_eq": (
            "SELECT l_orderkey, l_partkey, l_linenumber FROM ("
            "SELECT l_orderkey, l_partkey, l_linenumber, row_number() OVER ("
            "PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, "
            "l_suppkey, l_extendedprice) AS rn FROM lineitem"
            ") WHERE rn = 2"
        ),
        "anti_join": (
            "SELECT o_orderkey, o_totalprice FROM orders o WHERE NOT EXISTS ("
            "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"
        ),
        "union_dedup": (
            "SELECT DISTINCT doc_id FROM (SELECT doc_id FROM documents WHERE "
            "n_chars > 300 UNION ALL SELECT doc_id FROM documents WHERE "
            "lang = 'en')"
        ),
        "metrics_by_source": (
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(sum(CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len({tok}) END) AS BIGINT) AS sum_tokens "
            "FROM documents GROUP BY source"
        ),
    }


if __name__ == "__main__":
    from parse_html_spark.session import get_spark

    spark = get_spark(cpus=8)
    df = entry(spark)
    print("entry() rows:", df.count())
    df.show(5, truncate=50)
    spark.stop()
