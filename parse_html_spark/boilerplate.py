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
from itertools import accumulate
from operator import itemgetter, sub

import numpy as np

from .tokenizer import BOILER_TAGS, MEDIA_TAGS, DocIndex, trim_html

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
    # ndarray method form skips the np.searchsorted dispatch wrapper
    a = ends.searchsorted(lo, side="right")
    b = starts.searchsorted(hi, side="left")
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
        # the tokenizer keeps list + numpy twins from birth (round 6
        # profiling: the tolist()/cumsum/concatenate round-trips here
        # were ~1/3 of per-doc extraction wall on the bench mix)
        self.ts = doc.tstart
        self.te = doc.tend
        ts_l = self.ts_l = doc.tstart_l
        te_l = self.te_l = doc.tend_l
        # map(sub, te, ts) keeps the length pipeline fully in C (the
        # genexpr form was a measured per-doc cost at 60k-doc scale)
        cum_l = self.cum_l = list(
            accumulate(map(sub, te_l, ts_l), initial=0)
        )
        self.cum = np.asarray(cum_l, dtype=np.int64)

        # top-level <a> nodes: in doc order, an <a> is top-level iff it
        # starts at/after the end of the previous top-level <a> (nested
        # anchors are contained intervals); anchor ids come straight
        # from the tokenizer pass
        start_l = doc.start_l
        end_l = doc.end_l
        top: list[int] = []
        cur_end = -1
        for i in doc.a_ids:
            if start_l[i] >= cur_end:
                top.append(i)
                cur_end = end_l[i]
        self.top_anchors = top
        ats_l: list[int] = []
        ate_l: list[int] = []
        if top:
            self.anchor_starts = np.asarray(
                [start_l[i] for i in top], dtype=np.int64
            )
            # anchor text regions = text regions clipped to anchor
            # contents (anchors per doc are few: scalar bisect beats
            # numpy dispatch here, same reasoning as _mass_one)
            cstart_l = doc.cstart_l
            cend_l = doc.cend_l
            for i in top:
                alo = cstart_l[i]
                ahi = cend_l[i]
                a_k = bisect.bisect_right(te_l, alo)
                b_k = bisect.bisect_left(ts_l, ahi)
                for k in range(a_k, b_k):
                    s_c = ts_l[k]
                    e_c = te_l[k]
                    if s_c < alo:
                        s_c = alo
                    if e_c > ahi:
                        e_c = ahi
                    if e_c > s_c:
                        ats_l.append(s_c)
                        ate_l.append(e_c)
            self.ats = np.asarray(ats_l, dtype=np.int64)
            self.ate = np.asarray(ate_l, dtype=np.int64)
        else:
            self.anchor_starts = _EMPTY
            self.ats = _EMPTY
            self.ate = _EMPTY
        acum_l = self.acum_l = list(
            accumulate(map(sub, ate_l, ats_l), initial=0)
        )
        self.acum = np.asarray(acum_l, dtype=np.int64)
        self.ats_l = ats_l
        self.ate_l = ate_l

    # vectorized forms ------------------------------------------------------

    def text_len_many(self, lo, hi):
        return _mass_many(self.ts, self.te, self.cum, lo, hi)

    def anchor_len_many(self, lo, hi):
        return _mass_many(self.ats, self.ate, self.acum, lo, hi)

    def anchors_in_many(self, lo, hi):
        a_s = self.anchor_starts
        return a_s.searchsorted(hi, side="left") - a_s.searchsorted(
            lo, side="left"
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


def node_masses(doc: DocIndex, tm: TextMass):
    """Per-node (text_len, anchor_len) over contents spans, computed in
    TWO vectorized passes for the whole document (round-8 profiling: the
    container descent + prune pass together issued ~60 scalar bisect
    masses per doc; one batched pass serves both consumers)."""
    if doc.n == 0:
        return _EMPTY, _EMPTY
    cs = doc.cstart
    ce = doc.cend
    return tm.text_len_many(cs, ce), tm.anchor_len_many(cs, ce)


def find_main_container(
    doc: DocIndex, tm: TextMass, m_all: list | None = None
) -> tuple[int, int]:
    """Byte range of the main-content container (rule 2).

    ``m_all`` is the optional precomputed per-node non-anchor mass (from
    node_masses); children of the current container are found by a scan
    of the parent array over the container's contiguous subtree index
    range (nodes are in start order, so a subtree is one slice) -- no
    per-node children lists or roots() list are ever materialized."""
    lo, hi = 0, len(doc.html)
    n = doc.n
    if n == 0:
        return lo, hi
    cur_node = -1
    m_cur = tm.nonanchor(lo, hi)  # computed once; children reuse m[j]
    if m_all is None:
        tl, al = node_masses(doc, tm)
        m_all = (tl - al).tolist()
    cstart, cend = doc.cstart_l, doc.cend_l
    parent_l = doc.parent_l
    start_l, end_l = doc.start_l, doc.end_l
    while True:
        if m_cur <= 0:
            return lo, hi
        if cur_node < 0:
            kids = [i for i in range(n) if parent_l[i] < 0]
        else:
            # subtree of cur_node = contiguous node ids [cur+1, sub_hi)
            sub_hi = bisect.bisect_left(
                start_l, end_l[cur_node], cur_node + 1
            )
            kids = [
                i
                for i in range(cur_node + 1, sub_hi)
                if parent_l[i] == cur_node
            ]
        if not kids:
            return lo, hi
        best = -1
        best_m = -1
        for k in kids:
            mk = m_all[k]
            if mk > best_m:  # ties: first (earliest start) wins
                best_m = mk
                best = k
        if best < 0 or best_m < DESCEND_FRACTION * m_cur:
            return lo, hi
        cur_node = best
        lo, hi = cstart[best], cend[best]
        m_cur = best_m


def pruned_ranges(
    doc: DocIndex,
    tm: TextMass,
    lo: int,
    hi: int,
    tl=None,
    al=None,
) -> list[tuple[int, int]]:
    """Outer byte ranges of boilerplate subtrees inside [lo, hi) (rule 3),
    computed with one vectorized scoring pass over candidate nodes.
    ``tl``/``al`` accept the precomputed full-document per-node masses
    from node_masses() (sliced here); omitted, they are computed for the
    candidate range only."""
    a0 = bisect.bisect_left(doc.start_l, lo)
    b0 = bisect.bisect_left(doc.start_l, hi)
    if a0 >= b0:
        return []
    # boilerplate-tag mask comes pre-classified from the tokenizer pass;
    # only the candidate subrange is lifted to numpy (the full-array
    # twins stay lazy -- round-7 profiling)
    boiler = np.asarray(doc.boiler_l[a0:b0], dtype=bool)
    if tl is None:
        cs = np.asarray(doc.cstart_l[a0:b0], dtype=np.int64)
        ce = np.asarray(doc.cend_l[a0:b0], dtype=np.int64)
        tl = tm.text_len_many(cs, ce)
        al = tm.anchor_len_many(cs, ce)
        na = tm.anchors_in_many(cs, ce)
    else:
        tl = tl[a0:b0]
        al = al[a0:b0]
        na = tm.anchors_in_many(doc.cstart[a0:b0], doc.cend[a0:b0])
    dense = (na >= MIN_ANCHORS) & (tl > 0) & (al > LINK_DENSITY_MAX * tl)
    cand = np.flatnonzero(boiler | dense)
    start_l, end_l = doc.start_l, doc.end_l
    out: list[tuple[int, int]] = []
    last_end = -1
    for k in cand:
        j = a0 + int(k)
        s, e = start_l[j], end_l[j]
        if s < last_end:
            continue  # nested inside an already-pruned subtree
        out.append((s, e))
        last_end = e
    return out


def main_content_spans(
    doc: DocIndex,
    media_positions: list[tuple[int, str]] | None = None,
) -> list[tuple[str, str, str | None]]:
    """Ordered output spans (kind, text, media_ref) for one document."""
    tm = TextMass(doc)
    tl_all, al_all = node_masses(doc, tm)
    m_all = (tl_all - al_all).tolist()
    lo, hi = find_main_container(doc, tm, m_all)
    pruned = pruned_ranges(doc, tm, lo, hi, tl_all, al_all)
    plo = [p[0] for p in pruned]

    def in_pruned(pos: int) -> bool:
        k = bisect.bisect_right(plo, pos) - 1
        return k >= 0 and pos < pruned[k][1]

    events: list[tuple[int, int, str, str, str | None]] = []
    # input media spans split text regions: the interleaved sequence must
    # keep text-before / media / text-after as separate output spans.
    # Breaks (pruned ranges + zero-width media cuts) are merged ONCE per
    # document instead of sorted(pruned + cuts) per text region (round-7
    # profiling): out-of-region breaks are no-ops under the same skip
    # rules the per-region sort obeyed (a cut at pos==s advances nothing,
    # ps >= e terminates the sorted scan), so one monotone pointer over
    # the merged list reproduces the per-region behavior exactly.
    ts_l, te_l = doc.tstart_l, doc.tend_l
    a = bisect.bisect_right(te_l, lo)
    b = bisect.bisect_left(ts_l, hi)
    if media_positions:
        breaks = sorted(pruned + [(p, p) for p, _ in media_positions])
    else:
        breaks = pruned  # already sorted, disjoint
    nb = len(breaks)
    gi = 0  # breaks before gi have pe <= every later region start: dead
    html = doc.html
    for k in range(a, b):
        s = ts_l[k]
        if s < lo:
            s = lo
        e = te_l[k]
        if e > hi:
            e = hi
        if e <= s:
            continue
        pos = s
        while gi < nb and breaks[gi][1] <= s:
            gi += 1
        for bi in range(gi, nb):
            ps, pe = breaks[bi]
            if ps >= e:
                break  # sorted by ps: no later break can intersect
            if pe < pos:
                continue
            if ps > pos:
                # inlined trim_html fast path: a large share of pieces
                # are single chars (no 2+ whitespace run possible), so
                # skip the call and regex entirely for len < 2
                t = html[pos:ps]
                if len(t) < 2:
                    if t and not t.isspace():
                        events.append((pos, 1, "text", t, None))
                else:
                    t = trim_html(t)
                    if t:
                        events.append((pos, 1, "text", t, None))
            if pe > pos:
                pos = pe
        if pos < e:
            t = html[pos:e]
            if len(t) < 2:
                if t and not t.isspace():
                    events.append((pos, 1, "text", t, None))
            else:
                t = trim_html(t)
                if t:
                    events.append((pos, 1, "text", t, None))
    # media nodes (img/embed) inside the container, unpruned; priority 0:
    # an input media span at a text boundary precedes the following text.
    # img/embed ids come pre-classified from the tokenizer pass (sorted
    # in doc order), so only actual media nodes are visited
    if doc.media_ids:
        start_l = doc.start_l
        a0 = bisect.bisect_left(start_l, lo)
        b0 = bisect.bisect_left(start_l, hi)
        m_lo = bisect.bisect_left(doc.media_ids, a0)
        m_hi = bisect.bisect_left(doc.media_ids, b0)
        for j in doc.media_ids[m_lo:m_hi]:
            s_j = start_l[j]
            if not in_pruned(s_j):
                attrs = doc.attrs(j)
                ref = attrs.get("src") or attrs.get("data-src") or ""
                events.append((s_j, 0, "media", "", ref))
    if media_positions:
        for pos, ref in media_positions:
            # inclusive upper bound: media exactly at the container's
            # content end still belongs to the document tail
            if lo <= pos <= hi and not in_pruned(pos):
                events.append((pos, 0, "media", "", ref))
    # C-level key; same (pos, priority) ordering, same stability
    events.sort(key=itemgetter(0, 1))
    return [(kind, text, ref) for _, _, kind, text, ref in events]
