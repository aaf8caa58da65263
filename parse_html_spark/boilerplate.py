"""Main-content extraction: link-density / text-mass scoring over the
node index, emitting ordered (kind, text, media_ref, order) spans.

Public heuristic lineage: Kohlschuetter et al., "Boilerplate Detection
using Shallow Text Features" (WSDM 2010) -- link density + text mass;
re-expressed as vectorized interval arithmetic over the tokenizer's text
regions (prefix sums + batched searchsorted, O(nodes log regions) per
document with NO per-node Python in the scoring loop). The exact rules
below are the PINNED SPEC: the pure-Python oracle in tests uses the same
definitions, and the Spark pipeline must reproduce them byte-for-byte.

Pinned algorithm (deterministic):

1. non-anchor text mass m(x) = text chars in x minus text chars inside
   top-level <a> subtrees.
2. main container = start at the whole document; while some element
   child c of the current container has m(c) >= 0.7 * m(current),
   descend into the child with the largest m (ties: earliest start).
3. inside the container, prune any element subtree whose tag is in
   {nav, footer, aside, header, script, style, form, iframe, noscript}
   or that has >= 2 top-level anchors and anchor chars > 0.65 * text
   chars (link-density boilerplate).
4. emit, in byte order: trimHtml'd non-empty text pieces (kind='text')
   from unpruned text regions -- split additionally at input-media
   positions -- and media refs (kind='media') for unpruned img/embed
   nodes (media_ref = src, else data-src, else ''). Input media spans
   interleave by assembled byte position (inclusive container end).
5. order = 0..n-1 over the emitted sequence.
"""

from __future__ import annotations

import bisect

import numpy as np

from .tokenizer import DocIndex, trim_html

BOILER_TAGS = frozenset(
    "nav footer aside header script style form iframe noscript".split()
)
MEDIA_TAGS = ("img", "embed")

DESCEND_FRACTION = 0.7
LINK_DENSITY_MAX = 0.65
MIN_ANCHORS = 2

_EMPTY = np.zeros(0, dtype=np.int64)


def _mass_many(starts, ends, cum, lo, hi):
    """Vectorized: total covered length of [lo_i, hi_i) against the
    sorted disjoint regions (starts, ends) with prefix sums cum."""
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    if len(starts) == 0:
        return np.zeros(len(lo), dtype=np.int64)
    a = np.searchsorted(ends, lo, side="right")
    b = np.searchsorted(starts, hi, side="left")
    valid = b > a
    a_c = np.minimum(a, len(starts) - 1)
    b_c = np.maximum(b - 1, 0)
    total = cum[b] - cum[a]
    left = np.maximum(0, lo - starts[a_c])
    right = np.maximum(0, ends[b_c] - hi)
    out = np.where(valid, total - left - right, 0)
    return np.maximum(out, 0)


def _mass_one(ts_l, te_l, cum_l, lo: int, hi: int) -> int:
    """Scalar interval mass via C bisect over Python lists -- numpy call
    overhead dwarfs the work for the tiny queries in container descent."""
    if hi <= lo or not ts_l:
        return 0
    a = bisect.bisect_right(te_l, lo)
    b = bisect.bisect_left(ts_l, hi)
    if a >= b:
        return 0
    total = cum_l[b] - cum_l[a]
    if lo > ts_l[a]:
        total -= lo - ts_l[a]
    if te_l[b - 1] > hi:
        total -= te_l[b - 1] - hi
    return total if total > 0 else 0


class TextMass:
    """Batched prefix-sum index over text regions + top-level anchors."""

    def __init__(self, doc: DocIndex):
        self.doc = doc
        self.ts = doc.tstart
        self.te = doc.tend
        self.cum = np.concatenate(([0], np.cumsum(self.te - self.ts)))
        # list twins for the scalar bisect paths
        self.ts_l = doc.tstart.tolist()
        self.te_l = doc.tend.tolist()
        self.cum_l = self.cum.tolist()

        # top-level <a> nodes: in doc order, an <a> is top-level iff it
        # starts at/after the end of the previous top-level <a> (nested
        # anchors are contained intervals)
        tag_arr = doc.tag_arr
        a_ids = np.flatnonzero(tag_arr == "a")
        top: list[int] = []
        cur_end = -1
        for i in a_ids:
            s = int(doc.start[i])
            if s >= cur_end:
                top.append(int(i))
                cur_end = int(doc.end[i])
        self.top_anchors = top
        if top:
            t_arr = np.asarray(top, dtype=np.int64)
            self.anchor_starts = doc.start[t_arr]
            # anchor text regions = text regions clipped to anchor contents
            alo = doc.cstart[t_arr]
            ahi = doc.cend[t_arr]
            astarts: list[np.ndarray] = []
            aends: list[np.ndarray] = []
            a_idx = np.searchsorted(self.te, alo, side="right")
            b_idx = np.searchsorted(self.ts, ahi, side="left")
            for k in range(len(t_arr)):
                a_k, b_k = int(a_idx[k]), int(b_idx[k])
                if a_k >= b_k:
                    continue
                s_clip = np.maximum(self.ts[a_k:b_k], alo[k])
                e_clip = np.minimum(self.te[a_k:b_k], ahi[k])
                keep = e_clip > s_clip
                astarts.append(s_clip[keep])
                aends.append(e_clip[keep])
            self.ats = np.concatenate(astarts) if astarts else _EMPTY
            self.ate = np.concatenate(aends) if aends else _EMPTY
        else:
            self.anchor_starts = _EMPTY
            self.ats = _EMPTY
            self.ate = _EMPTY
        self.acum = np.concatenate(([0], np.cumsum(self.ate - self.ats)))
        self.ats_l = self.ats.tolist()
        self.ate_l = self.ate.tolist()
        self.acum_l = self.acum.tolist()

    # vectorized forms ------------------------------------------------------

    def text_len_many(self, lo, hi):
        return _mass_many(self.ts, self.te, self.cum, lo, hi)

    def anchor_len_many(self, lo, hi):
        return _mass_many(self.ats, self.ate, self.acum, lo, hi)

    def anchors_in_many(self, lo, hi):
        return np.searchsorted(self.anchor_starts, hi, side="left") - np.searchsorted(
            self.anchor_starts, lo, side="left"
        )

    # scalar conveniences ---------------------------------------------------

    def text_len(self, lo: int, hi: int) -> int:
        return _mass_one(self.ts_l, self.te_l, self.cum_l, lo, hi)

    def anchor_len(self, lo: int, hi: int) -> int:
        return _mass_one(self.ats_l, self.ate_l, self.acum_l, lo, hi)

    def anchors_in(self, lo: int, hi: int) -> int:
        a = int(np.searchsorted(self.anchor_starts, lo, side="left"))
        b = int(np.searchsorted(self.anchor_starts, hi, side="left"))
        return b - a

    def nonanchor(self, lo: int, hi: int) -> int:
        return self.text_len(lo, hi) - self.anchor_len(lo, hi)


def find_main_container(doc: DocIndex, tm: TextMass) -> tuple[int, int]:
    """Byte range of the main-content container (rule 2)."""
    lo, hi = 0, len(doc.html)
    cur_node = -1
    m_cur = tm.nonanchor(lo, hi)  # computed once; children reuse m[j]
    ts_l, te_l, cum_l = tm.ts_l, tm.te_l, tm.cum_l
    ats_l, ate_l, acum_l = tm.ats_l, tm.ate_l, tm.acum_l
    cstart, cend = doc.cstart, doc.cend
    while True:
        if m_cur <= 0:
            return lo, hi
        kids = doc.roots() if cur_node < 0 else doc.children_of(cur_node)
        if not kids:
            return lo, hi
        # child sets are tiny (2-8): scalar bisect beats numpy dispatch
        best = -1
        best_m = -1
        for k in kids:
            klo = int(cstart[k])
            khi = int(cend[k])
            mk = _mass_one(ts_l, te_l, cum_l, klo, khi) - _mass_one(
                ats_l, ate_l, acum_l, klo, khi
            )
            if mk > best_m:  # ties: first (earliest start) wins
                best_m = mk
                best = k
        if best < 0 or best_m < DESCEND_FRACTION * m_cur:
            return lo, hi
        cur_node = best
        lo, hi = int(cstart[best]), int(cend[best])
        m_cur = best_m


def pruned_ranges(
    doc: DocIndex, tm: TextMass, lo: int, hi: int
) -> list[tuple[int, int]]:
    """Outer byte ranges of boilerplate subtrees inside [lo, hi) (rule 3),
    computed with one vectorized scoring pass over candidate nodes."""
    ids = doc.nodes_in_range(lo, hi)
    if len(ids) == 0:
        return []
    tag_list = doc.tag
    a0 = int(ids[0])
    boiler = np.fromiter(
        (tag_list[j] in BOILER_TAGS for j in range(a0, a0 + len(ids))),
        dtype=bool,
        count=len(ids),
    )
    cs = doc.cstart[ids]
    ce = doc.cend[ids]
    tl = tm.text_len_many(cs, ce)
    al = tm.anchor_len_many(cs, ce)
    na = tm.anchors_in_many(cs, ce)
    dense = (na >= MIN_ANCHORS) & (tl > 0) & (al > LINK_DENSITY_MAX * tl)
    cand = np.flatnonzero(boiler | dense)
    out: list[tuple[int, int]] = []
    last_end = -1
    for k in cand:
        j = int(ids[k])
        s, e = int(doc.start[j]), int(doc.end[j])
        if s < last_end:
            continue  # nested inside an already-pruned subtree
        out.append((s, e))
        last_end = e
    return out


_BOILER_ARR = np.asarray(sorted(BOILER_TAGS), dtype=object)


def main_content_spans(
    doc: DocIndex,
    media_positions: list[tuple[int, str]] | None = None,
) -> list[tuple[str, str, str | None]]:
    """Ordered output spans (kind, text, media_ref) for one document."""
    tm = TextMass(doc)
    lo, hi = find_main_container(doc, tm)
    pruned = pruned_ranges(doc, tm, lo, hi)
    plo = [p[0] for p in pruned]

    def in_pruned(pos: int) -> bool:
        k = bisect.bisect_right(plo, pos) - 1
        return k >= 0 and pos < pruned[k][1]

    events: list[tuple[int, int, str, str, str | None]] = []
    # input media spans split text regions: the interleaved sequence must
    # keep text-before / media / text-after as separate output spans
    media_cuts = sorted(p for p, _ in (media_positions or []))
    ts, te = doc.tstart, doc.tend
    a = int(np.searchsorted(te, lo, side="right"))
    b = int(np.searchsorted(ts, hi, side="left"))
    html = doc.html
    for k in range(a, b):
        s = max(int(ts[k]), lo)
        e = min(int(te[k]), hi)
        if e <= s:
            continue
        pos = s
        ci = bisect.bisect_right(media_cuts, s)
        cuts = []
        while ci < len(media_cuts) and media_cuts[ci] < e:
            cuts.append((media_cuts[ci], media_cuts[ci]))
            ci += 1
        breaks = sorted(pruned + cuts) if (pruned or cuts) else ()
        for ps, pe in breaks:
            if pe < pos or ps >= e:
                continue
            if ps > pos:
                t = trim_html(html[pos:ps])
                if t:
                    events.append((pos, 1, "text", t, None))
            pos = max(pos, pe)
        if pos < e:
            t = trim_html(html[pos:e])
            if t:
                events.append((pos, 1, "text", t, None))
    # media nodes (img/embed) inside the container, unpruned; priority 0:
    # an input media span at a text boundary precedes the following text
    ids = doc.nodes_in_range(lo, hi)
    if len(ids):
        tag_list = doc.tag
        for j in range(int(ids[0]), int(ids[0]) + len(ids)):
            if tag_list[j] in MEDIA_TAGS and not in_pruned(int(doc.start[j])):
                attrs = doc.attrs(j)
                ref = attrs.get("src") or attrs.get("data-src") or ""
                events.append((int(doc.start[j]), 0, "media", "", ref))
    if media_positions:
        for pos, ref in media_positions:
            # inclusive upper bound: media exactly at the container's
            # content end still belongs to the document tail
            if lo <= pos <= hi and not in_pruned(pos):
                events.append((pos, 0, "media", "", ref))
    events.sort(key=lambda ev: (ev[0], ev[1]))
    return [(kind, text, ref) for _, _, kind, text, ref in events]
