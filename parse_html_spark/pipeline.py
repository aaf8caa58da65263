"""Distributed extraction pipelines over interleaved span documents.

Input table (BASELINE.json input_hint):
    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

The per-doc HTML byte stream is the offset-ordered concatenation of
kind='text' span texts; media spans occupy their offset slots and surface
as kind='media' output spans.

All pipelines are stateless mapInPandas stages (Arrow-vectorized, no
per-row Python at the JVM boundary) followed by native DataFrame ops, so
Catalyst handles pushdown/pruning and the same code runs under
readStream ... foreachBatch unchanged.
"""

from __future__ import annotations

import time
from operator import itemgetter
from typing import Iterator

from .boilerplate import main_content_spans
from .dom import PH
from .extract import extract_form, extract_node, to_plain, value_only
from .matcher import find_nodes
from .selector import compile_selector
from .tokenizer import DocIndex

SPAN_SCHEMA = (
    "doc_id string, `order` int, kind string, text string, media_ref string"
)
MATCH_SCHEMA = "doc_id string, match_order int, value string"


def _map_in_pandas(df, run, schema, inputs=("doc_id", "spans")):
    """mapInPandas with COLUMN PRUNING at the Python boundary: only the
    columns the stage reads cross the Arrow bridge. mapInPandas itself
    cannot tell Catalyst which columns it uses, so without this a wide
    input table (ingest metadata, lineage columns, ...) would be
    serialized into every Python worker for nothing."""
    from .session import ensure_py_files

    ensure_py_files(df.sparkSession)
    need = [c for c in inputs if c in df.columns]
    if len(need) == len(inputs) and len(df.columns) > len(need):
        df = df.select(*need)
    return df.mapInPandas(run, schema=schema)


_OFFSET_KEY = itemgetter("offset")


def assemble(spans) -> tuple[str, list[tuple[int, str]]]:
    """Concatenate text spans in offset order; media spans become
    (assembled_char_position, media_ref) slots."""
    parts: list[str] = []
    media: list[tuple[int, str]] = []
    pos = 0
    for s in sorted(spans, key=_OFFSET_KEY):
        if s["kind"] == "text":
            txt = s["text"] or ""
            parts.append(txt)
            pos += len(txt)
        else:
            media.append((pos, s["media_ref"] or ""))
    return "".join(parts), media


def _spans_of_row(row_spans) -> list[dict]:
    # pandas delivers array<struct> as a numpy array of dicts (Arrow path)
    if row_spans is None:
        return []
    return [s if isinstance(s, dict) else s.asDict() for s in row_spans]


def extract_spans(df, with_partition_id: bool = False):
    """Main-content extraction: span docs -> ordered output spans
    (doc_id, order, kind, text, media_ref). The flagship pipeline.

    The exploded row form is produced as compact parallel arrays in
    Python (the cheap Arrow shape) and exploded JVM-SIDE via posexplode:
    per-span Python rows never exist, so the row form costs the same
    map stage as extract_spans_compact plus a codegen'd generate.

    with_partition_id=True appends the physical partition id (via
    TaskContext) so per-partition extraction metrics/lineage can be
    aggregated relationally downstream (SURVEY.md 2.9); that path keeps
    the direct row emitter so the id rides every span row."""
    import pandas as pd

    if not with_partition_id:
        return explode_compact(extract_spans_compact(df))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = -1
        if with_partition_id:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            out_doc, out_ord, out_kind, out_text, out_ref = [], [], [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, media = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                spans = main_content_spans(doc, media)
                for i, (kind, text, ref) in enumerate(spans):
                    out_doc.append(doc_id)
                    out_ord.append(i)
                    out_kind.append(kind)
                    out_text.append(text)
                    out_ref.append(ref)
            cols = {
                "doc_id": out_doc,
                "order": pd.array(out_ord, dtype="int32"),
                "kind": out_kind,
                "text": out_text,
                "media_ref": out_ref,
            }
            if with_partition_id:
                cols["partition_id"] = pd.array(
                    [pid] * len(out_doc), dtype="int32"
                )
            yield pd.DataFrame(cols)

    schema = SPAN_SCHEMA + (", partition_id int" if with_partition_id else "")
    return _map_in_pandas(df, run, schema)


def partition_metrics(df_spans_with_pid):
    """Per-partition extraction metrics from extract_spans(...,
    with_partition_id=True) output: docs, spans, text chars."""
    from pyspark.sql import functions as F

    return df_spans_with_pid.groupBy("partition_id").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_spans"),
        F.sum(F.length("text")).alias("n_text_chars"),
    )


NESTED_SPAN_SCHEMA = (
    "doc_id string, spans array<struct<`order`:int,kind:string,"
    "text:string,media_ref:string>>"
)


def extract_spans_nested(df):
    """Production sink shape: ONE row per document carrying the ordered
    span sequence as array<struct>. Same semantics as extract_spans, but
    ~50x fewer output rows -- Arrow/JVM serialization drops from the
    dominant cost to noise, and downstream per-doc ops need no groupBy."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, span_lists = [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, media = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                spans = main_content_spans(doc, media)
                ids.append(doc_id)
                span_lists.append(
                    [
                        {"order": i, "kind": k, "text": t, "media_ref": r}
                        for i, (k, t, r) in enumerate(spans)
                    ]
                )
            yield pd.DataFrame({"doc_id": ids, "spans": span_lists})

    return _map_in_pandas(df, run, NESTED_SPAN_SCHEMA)


COMPACT_SPAN_SCHEMA = (
    "doc_id string, is_media array<boolean>, texts array<string>, "
    "media_refs array<string>"
)


def extract_spans_compact(df):
    """Fastest span-preserving sink shape: the per-doc span sequence as
    PARALLEL PRIMITIVE ARRAYS (is_media / texts / media_refs, order =
    array index). Exactly the (kind, text, media_ref, order) tuple of
    the north rule, but Arrow serializes plain string/bool lists instead
    of per-span structs: ~2.5-3x the throughput of the struct shapes.
    explode_compact() recovers the row form losslessly."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, kinds, texts, refs = [], [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, media = assemble(_spans_of_row(row_spans))
                spans = main_content_spans(DocIndex(html), media)
                ids.append(doc_id)
                kinds.append([k == "media" for k, _t, _r in spans])
                texts.append([t for _k, t, _r in spans])
                refs.append([r for _k, _t, r in spans])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "is_media": kinds,
                    "texts": texts,
                    "media_refs": refs,
                }
            )

    return _map_in_pandas(df, run, COMPACT_SPAN_SCHEMA)


def explode_compact(df):
    """Compact columnar spans -> the exploded row form of extract_spans."""
    from pyspark.sql import functions as F

    z = F.arrays_zip("is_media", "texts", "media_refs")
    ex = df.select("doc_id", F.posexplode(z).alias("order", "s"))
    return ex.select(
        "doc_id",
        F.col("order").cast("int").alias("order"),
        F.when(F.col("s.is_media"), F.lit("media"))
        .otherwise(F.lit("text"))
        .alias("kind"),
        F.col("s.texts").alias("text"),
        F.col("s.media_refs").alias("media_ref"),
    )


def extract_docs(df):
    """Fused extract + reassemble: (doc_id, text, media_refs) in ONE map
    pass -- no span-row explosion, no groupBy shuffle. text = the span
    texts joined with ' ' (media spans contribute their empty text),
    byte-identical to reassemble_docs(extract_spans(df))."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, texts, refs = [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, media = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                spans = main_content_spans(doc, media)
                ids.append(doc_id)
                texts.append(" ".join(t for _k, t, _r in spans))
                refs.append([r for k, _t, r in spans if r is not None])
            yield pd.DataFrame(
                {"doc_id": ids, "text": texts, "media_refs": refs}
            )

    return _map_in_pandas(
        df, run, "doc_id string, text string, media_refs array<string>"
    )


def select_spans(
    df,
    selector: str,
    mode: str = "text",
    attr_name: str | None = None,
    ref_compat: bool = False,
):
    """Run a CSS selector over every document; one output row per match.

    mode: 'text' | 'html' | 'attr' (attr_name required for 'attr').
    The selector is compiled ONCE on the driver and closure-captured
    (ref_compat=True compiles in reference-bug-compatible mode,
    SURVEY 2.11 A.8/A.12)."""
    import pandas as pd

    plan = compile_selector(selector, ref_compat=ref_compat)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_doc, out_ord, out_val = [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                if plan is None:
                    continue
                html, _ = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                ids = find_nodes(doc, plan, [(0, len(html))])
                for k, n in enumerate(ids):
                    if mode == "text":
                        val = doc.text_between(doc.start_l[n], doc.end_l[n])
                    elif mode == "html":
                        val = doc.outer(n)
                    else:
                        val = doc.attrs(n, validate=True).get(attr_name)
                    out_doc.append(doc_id)
                    out_ord.append(k)
                    out_val.append(val)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "match_order": pd.array(out_ord, dtype="int32"),
                    "value": pd.array(out_val, dtype=object),
                }
            )

    return _map_in_pandas(df, run, MATCH_SCHEMA)


def select_spans_multi(
    df, selectors: dict[str, str], mode: str = "text", ref_compat: bool = False
):
    """Run MANY selectors in one pass: the document is tokenized once
    and every compiled plan is evaluated against the same node index --
    amortizing the tokenizer across queries is the right shape when a
    production job extracts dozens of fields per page.

    Output: (doc_id, query, match_order, value)."""
    import pandas as pd

    plans = {
        name: compile_selector(sel, ref_compat=ref_compat)
        for name, sel in selectors.items()
    }

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_doc, out_q, out_ord, out_val = [], [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, _ = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                scopes = [(0, len(html))]
                for name, plan in plans.items():
                    if plan is None:
                        continue
                    for k, n in enumerate(find_nodes(doc, plan, scopes)):
                        if mode == "text":
                            val = doc.text_between(
                                doc.start_l[n], doc.end_l[n]
                            )
                        else:
                            val = doc.outer(n)
                        out_doc.append(doc_id)
                        out_q.append(name)
                        out_ord.append(k)
                        out_val.append(val)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "query": out_q,
                    "match_order": pd.array(out_ord, dtype="int32"),
                    "value": pd.array(out_val, dtype=object),
                }
            )

    return _map_in_pandas(
        df, run, "doc_id string, query string, match_order int, value string"
    )


def extract_tables_df(df, selector: str = "table"):
    """extractTable over every doc -> (doc_id, table_order, cells_json)."""
    import json

    import pandas as pd

    from .extract import extract_table_list

    def run(batches):
        for pdf in batches:
            out_doc, out_ord, out_json = [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, _ = assemble(_spans_of_row(row_spans))
                ph = PH(html).find(selector)
                tables = extract_table_list(ph, val_only=True)
                for k, t in enumerate(tables):
                    out_doc.append(doc_id)
                    out_ord.append(k)
                    out_json.append(json.dumps(to_plain(t), ensure_ascii=False))
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "table_order": pd.array(out_ord, dtype="int32"),
                    "cells_json": out_json,
                }
            )

    return _map_in_pandas(df, run, "doc_id string, table_order int, cells_json string")


def extract_forms_df(df):
    """extractForm over every doc -> (doc_id, form_json)."""
    import json

    import pandas as pd

    def run(batches):
        for pdf in batches:
            out_doc, out_json = [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, _ = assemble(_spans_of_row(row_spans))
                fields = to_plain(extract_form(PH(html)))
                out_doc.append(doc_id)
                out_json.append(json.dumps(fields, ensure_ascii=False))
            yield pd.DataFrame({"doc_id": out_doc, "form_json": out_json})

    return _map_in_pandas(df, run, "doc_id string, form_json string")


NODE_SCHEMA = (
    "doc_id string, node_id int, tag string, start long, `end` long, "
    "cstart long, cend long, parent int, depth int"
)


def node_table(df, with_attrs: bool = False):
    """Exploded relational node table (SURVEY.md 1.2): one row per
    element across the corpus. Cross-document structural work then stays
    in native DataFrame ops -- descendant matching is a range-containment
    join, direct-child an equi-join on parent, and Catalyst/AQE pick the
    join strategy (broadcast the ancestor side when small).

    ``attrs`` is OPT-IN (with_attrs=True): most node-table consumers
    (tag histograms, descendant joins) never read attributes, and the
    map column is the only non-primitive in the row. When requested it
    crosses the Arrow bridge as parallel key/value arrays (primitive
    string columns, no per-node Python dicts) and becomes a MapType
    JVM-side via map_from_arrays."""
    import pandas as pd

    import numpy as np

    def run(batches):
        for pdf in batches:
            # parallel column lists (NOT per-node dicts): the numeric node
            # arrays are appended whole per doc and concatenated once per
            # batch -- Arrow serializes primitive columns, never row objects
            col_doc, col_nid, col_tag = [], [], []
            col_ak, col_av = [], []
            num_chunks = []  # per-doc (6, n) int64 blocks
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, _ = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                n = doc.n
                if n == 0:
                    continue
                col_doc.extend([doc_id] * n)
                col_nid.append(np.arange(n, dtype=np.int32))
                col_tag.extend(doc.tag)
                num_chunks.append(
                    np.stack(
                        (doc.start, doc.end, doc.cstart, doc.cend,
                         doc.parent, doc.depth)
                    )
                )
                if with_attrs:
                    for i in range(n):
                        items = doc.attrs(i)
                        col_ak.append(list(items.keys()))
                        col_av.append(
                            ["" if v is None else v for v in items.values()]
                        )
            if not col_doc:
                cols = {
                    "doc_id": [], "node_id": [], "tag": [], "start": [],
                    "end": [], "cstart": [], "cend": [], "parent": [],
                    "depth": [],
                }
                if with_attrs:
                    cols["attrs_keys"] = []
                    cols["attrs_vals"] = []
                yield pd.DataFrame(cols)
                continue
            nums = np.concatenate(num_chunks, axis=1)
            cols = {
                "doc_id": col_doc,
                "node_id": np.concatenate(col_nid),
                "tag": col_tag,
                "start": nums[0],
                "end": nums[1],
                "cstart": nums[2],
                "cend": nums[3],
                "parent": nums[4].astype(np.int32),
                "depth": nums[5].astype(np.int32),
            }
            if with_attrs:
                cols["attrs_keys"] = col_ak
                cols["attrs_vals"] = col_av
            yield pd.DataFrame(cols)

    if not with_attrs:
        return _map_in_pandas(df, run, NODE_SCHEMA)
    from pyspark.sql import functions as F

    wide = _map_in_pandas(
        df, run,
        NODE_SCHEMA + ", attrs_keys array<string>, attrs_vals array<string>",
    )
    return wide.select(
        "doc_id", "node_id", "tag", "start", "end", "cstart", "cend",
        "parent", "depth",
        F.map_from_arrays("attrs_keys", "attrs_vals").alias("attrs"),
    )


def descendants_join(nodes, ancestor_tag: str, desc_tag: str, broadcast_ancestors: bool = True):
    """Descendant matching in pure relational form: range containment
    join between the ancestor and descendant node sets (SURVEY.md 2.9).
    The filtered ancestor side is usually tiny -> broadcast it."""
    from pyspark.sql import functions as F

    anc = nodes.filter(F.col("tag") == ancestor_tag).select(
        F.col("doc_id").alias("a_doc"),
        F.col("node_id").alias("anc_id"),
        F.col("cstart").alias("a_lo"),
        F.col("cend").alias("a_hi"),
    )
    if broadcast_ancestors:
        anc = F.broadcast(anc)
    desc = nodes.filter(F.col("tag") == desc_tag)
    return desc.join(
        anc,
        (desc.doc_id == anc.a_doc)
        & (desc.start >= anc.a_lo)
        & (desc.start < anc.a_hi),
    ).select("doc_id", "node_id", "anc_id", "tag", "start")


def apply_ph(df, fn, schema: str):
    """Generic per-document API hook: fn(PH) -> dict of column values
    (one output row per doc, doc_id added automatically). This is the
    distributed form of the reference's chainable per-document API."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, _ = assemble(_spans_of_row(row_spans))
                vals = fn(PH(html))
                vals["doc_id"] = doc_id
                rows.append(vals)
            yield pd.DataFrame(rows)

    return _map_in_pandas(df, run, schema)


def extract_post_forms_df(df, trigger: str):
    """preparePostForm over every doc -> (doc_id, form_json): all
    [type=submit] fields except the trigger are dropped (anti-join
    semantics, SURVEY.md 2.7)."""
    import json

    import pandas as pd

    from .extract import prepare_post_form

    def run(batches):
        for pdf in batches:
            out_doc, out_json = [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, _ = assemble(_spans_of_row(row_spans))
                fields = to_plain(prepare_post_form(PH(html), trigger))
                out_doc.append(doc_id)
                out_json.append(json.dumps(fields, ensure_ascii=False))
            yield pd.DataFrame({"doc_id": out_doc, "form_json": out_json})

    return _map_in_pandas(df, run, "doc_id string, form_json string")


# -- scale infrastructure --------------------------------------------------

MEGA_DOC_CHARS = 500_000


def fan_out_small(df, factor: int = 1):
    """Round-robin fan-out for a SMALL input feeding an expensive
    per-row stage (engine mapInPandas, signature UDFs, interpreted
    array exprs).

    Scan split sizing is byte-based (maxPartitionBytes floored by
    openCostInBytes), so a KB-scale single-row-group parquet file plans
    1-2 splits and the compute-bound stage serializes on one core while
    the rest of the cluster idles (guide 2.5: input parallelism fixed
    right after the read). A no-op whenever the input already has >=
    defaultParallelism * factor partitions -- a production-scale table
    never repartitions; only the pathological small-file case pays the
    (tiny) shuffle."""
    if df.isStreaming:
        return df  # micro-batch sizing is the trigger's job, and
        # .rdd is undefined on a streaming DataFrame
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


PAGE_SCHEMA = (
    "doc_id string, is_media array<boolean>, texts array<string>, "
    "media_refs array<string>, tables_json string, form_json string, "
    "title string, n_nodes int"
)


def extract_page(df):
    """One-pass full-page extraction: the document is tokenized ONCE and
    every extractor runs over the same node index -- main-content spans
    (compact shape), all tables (valueOnly JSON), form fields, title,
    node count. This is the production job shape: at 100 TB you never
    pay the tokenizer twice for the same page."""
    import json

    import pandas as pd

    from .extract import extract_form, extract_table_list, to_plain

    def run(batches):
        for pdf in batches:
            # parallel column lists, not per-doc dicts: pandas' records
            # path re-dispatches per cell (round-8)
            c_id, c_km, c_tx, c_rf = [], [], [], []
            c_tab, c_frm, c_ti, c_nn = [], [], [], []
            for doc_id, row_spans in zip(pdf["doc_id"], pdf["spans"]):
                html, media = assemble(_spans_of_row(row_spans))
                doc = DocIndex(html)
                spans = main_content_spans(doc, media)
                ph = PH(html, doc=doc)
                title_sel = ph.find("title")
                tables = extract_table_list(ph.find("table"), val_only=True)
                form = to_plain(extract_form(ph))
                c_id.append(doc_id)
                c_km.append([k == "media" for k, _t, _r in spans])
                c_tx.append([t for _k, t, _r in spans])
                c_rf.append([r for _k, _t, r in spans])
                c_tab.append(
                    json.dumps([to_plain(t) for t in tables], ensure_ascii=False)
                )
                c_frm.append(json.dumps(form, ensure_ascii=False))
                c_ti.append(title_sel.text())
                c_nn.append(doc.n)
            yield pd.DataFrame(
                {
                    "doc_id": c_id,
                    "is_media": c_km,
                    "texts": c_tx,
                    "media_refs": c_rf,
                    "tables_json": c_tab,
                    "form_json": c_frm,
                    "title": c_ti,
                    "n_nodes": pd.array(c_nn, dtype="int32"),
                }
            )

    return _map_in_pandas(df, run, PAGE_SCHEMA)


def doc_size_col():
    from pyspark.sql import functions as F

    return F.aggregate(
        "spans", F.lit(0), lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit("")))
    )


def prepare_partitions(
    df,
    partitions: int,
    mega_chars: int = MEGA_DOC_CHARS,
    shuffle_small: bool = False,
    size_col: str = "n_chars",
):
    """Skew defusal: spread mega-docs round-robin so the longest task is
    one biggest document, not a packet of them. AQE cannot rebalance a
    Python map stage by value skew (SURVEY.md section 4.3).

    When the input carries an INGEST-TIME size column (``size_col``,
    written by the corpus generator), the mega split is a pushed-down
    parquet predicate: row groups whose max(n_chars) stats clear the
    threshold are pruned from the mega branch without touching span
    bytes, and NO driver action runs before the real job. Without the
    column, size is derived from span lengths (one extra columnar scan).

    Mega docs are round-robin repartitioned into ``partitions`` slots --
    no count() action is needed; with the mega fraction ~0.2% and
    partitions sized at ~4x cores, each mega lands alone in its slot.

    Normal docs are NOT shuffled by default: byte-sized parquet scan
    splits already spread them evenly, and shuffling the full corpus
    through the exchange costs more than it saves (measured). Pass
    shuffle_small=True to force hash placement (needed when the input
    layout is pathological, e.g. one giant unsplittable file)."""
    from pyspark.sql import functions as F

    if size_col in df.columns:
        size = F.col(size_col)  # ingest column: predicate pushes to scan
        # NULL size (e.g. a source that did not populate the ingest
        # column) routes to the normal branch -- rows must never vanish
        # because both strict comparisons are false on NULL
        small = df.filter((size <= mega_chars) | size.isNull())
        big_rows = df.filter(size > mega_chars)
    else:
        sized = df.withColumn("_n_chars", doc_size_col())
        small = sized.filter(F.col("_n_chars") <= mega_chars).drop("_n_chars")
        big_rows = sized.filter(F.col("_n_chars") > mega_chars).drop("_n_chars")
    if shuffle_small:
        small = small.repartition(partitions, F.col("doc_id"))
    big = big_rows.repartition(partitions)  # round-robin mega placement
    return small.unionByName(big)


def write_bucketed(df, path: str, buckets: int = 8, size_col: str = "n_chars") -> None:
    """Materialize a span-doc table partitioned by deterministic doc_id
    hash bucket (directory layout bucket=N/). Resume jobs over this
    layout get TRUE partition pruning: pending buckets are selected by
    path, and completed buckets' bytes are never read.

    When the ingest size column is present, rows are additionally SIZE-
    CLUSTERED within each bucket (sortWithinPartitions on size): megas
    sort to the file tail, so row-group min/max stats isolate them and
    prepare_partitions' skew split prunes at read time -- the parquet
    stand-in for an Iceberg sort-order spec."""
    from pyspark.sql import functions as F

    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets))
    )
    if size_col in df.columns:
        out = out.repartition(buckets, "bucket").sortWithinPartitions(
            "bucket", size_col
        )
    out.write.partitionBy("bucket").mode("overwrite").parquet(path)


def run_resumable(
    spark,
    input_path: str,
    output_dir: str,
    buckets: int = 8,
    partitions: int = 64,
    bucketed_input: bool = False,
):
    """Checkpoint-resumable extraction with per-bucket lineage + metrics.

    Work units are deterministic hash buckets of doc_id (stable across
    cluster sizes and retries). Completed buckets are recorded in
    <output_dir>/_manifest.json and skipped on rerun; per-bucket metrics
    commit as immutable snapshots of the <output_dir>/_metrics_wh
    warehouse table (Iceberg stand-in: atomic manifest, lineage,
    time travel). Output is idempotent: each bucket
    writes its own subdirectory with mode=overwrite.

    bucketed_input=True expects a write_bucketed() layout and reads ONLY
    the pending bucket's directory (partition pruning -- completed work's
    input bytes are never scanned, which is what makes resume cheap at
    100 TB). Default reads a flat table and filters on the hash, which
    still recomputes nothing but must scan doc_ids."""
    import json
    import os

    from pyspark.sql import functions as F

    os.makedirs(output_dir, exist_ok=True)
    manifest_path = os.path.join(output_dir, "_manifest.json")
    manifest = {"input": input_path, "buckets": buckets, "done": []}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        if manifest.get("buckets") != buckets or manifest.get("input") != input_path:
            raise ValueError("manifest does not match job config")

    df = None
    if not bucketed_input:
        df = spark.read.parquet(input_path)
    bucket_col = F.pmod(F.xxhash64("doc_id"), F.lit(buckets))
    metrics_rows = []
    for b in range(buckets):
        if b in manifest["done"]:
            continue
        if bucketed_input:
            part = spark.read.parquet(os.path.join(input_path, f"bucket={b}"))
            keep = [c for c in ("doc_id", "spans", "n_chars") if c in part.columns]
            part = part.select(*keep)
        else:
            part = df.filter(bucket_col == b)
        part = prepare_partitions(part, partitions)
        out = extract_spans(part)
        # span count rides the WRITE action itself (CollectMetrics):
        # no post-write re-read -- at 100 TB a metrics-only second pass
        # over everything written would double the job's input volume
        from pyspark.sql import Observation

        obs = Observation(f"extract_bucket_{b}")
        out = out.observe(obs, F.count(F.lit(1)).alias("n_spans"))
        t0 = time.time()
        out_path = os.path.join(output_dir, f"bucket={b}")
        out.write.mode("overwrite").parquet(out_path)
        wall = time.time() - t0
        n_spans = int(obs.get["n_spans"])
        metrics_rows.append((b, n_spans, float(wall)))
        manifest["done"].append(b)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, manifest_path)  # atomic lineage commit
    if metrics_rows:
        mdf = spark.createDataFrame(
            metrics_rows, "bucket int, n_spans long, wall_sec double"
        )
        # metrics go to the snapshot-manifest warehouse (Iceberg stand-in,
        # sources/warehouse.py): each resume leg commits ONE immutable
        # snapshot whose lineage records which buckets it covered, so the
        # metrics table is itself time-travelable and atomically visible
        from .sources.warehouse import Warehouse

        wh = Warehouse(spark, os.path.join(output_dir, "_metrics_wh"))
        wh.append(
            mdf,
            "extraction_metrics",
            lineage={"input": input_path, "buckets": [r[0] for r in metrics_rows]},
        )
    return os.path.join(output_dir, "bucket=*")
