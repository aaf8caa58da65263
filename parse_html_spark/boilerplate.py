"""Main-content extraction: link-density / text-mass scoring over the
node index, emitting ordered (kind, text, media_ref, order) spans.

Public heuristic lineage: Kohlschuetter et al., "Boilerplate Detection
using Shallow Text Features" (WSDM 2010) -- link density + text mass;
re-expressed as vectorized interval arithmetic over the tokenizer's text
regions (prefix sums, O(log) per query). The exact rules below are the
PINNED SPEC: the pure-Python oracle in tests uses the same definitions,
and the Spark pipeline must reproduce them byte-for-byte.

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
   from unpruned text regions, and media refs (kind='media') for
   unpruned img/embed nodes (media_ref = src, else data-src, else '').
   Input media spans interleave by their assembled byte position.
5. order = 0..n-1 over the emitted sequence.
"""

from __future__ import annotations

import bisect

import numpy as np

from .tokenizer import DocIndex, trim_html

BOILER_TAGS = frozenset(
    "nav footer aside header script style form iframe noscript".split()
)
MEDIA_TAGS = frozenset(("img", "embed"))

DESCEND_FRACTION = 0.7
LINK_DENSITY_MAX = 0.65
MIN_ANCHORS = 2


class TextMass:
    """Prefix-sum index over text regions + top-level anchor regions."""

    def __init__(self, doc: DocIndex):
        self.doc = doc
        ts, te = doc.tstart, doc.tend
        self.ts = ts
        self.te = te
        lens = (te - ts).astype(np.int64)
        self.cum = np.concatenate(([0], np.cumsum(lens)))
        # top-level anchors: <a> nodes with no <a> ancestor
        a_ids = [i for i in range(doc.n) if doc.tag[i] == "a"]
        top: list[int] = []
        a_set = set(a_ids)
        for i in a_ids:
            p = int(doc.parent[i])
            is_top = True
            while p >= 0:
                if p in a_set:
                    is_top = False
                    break
                p = int(doc.parent[p])
            if is_top:
                top.append(i)
        # anchor text regions = text regions clipped to anchor contents
        astarts: list[int] = []
        aends: list[int] = []
        for i in top:
            lo, hi = int(doc.cstart[i]), int(doc.cend[i])
            a = int(np.searchsorted(te, lo, side="right"))
            b = int(np.searchsorted(ts, hi, side="left"))
            for k in range(a, b):
                s = max(int(ts[k]), lo)
                e = min(int(te[k]), hi)
                if e > s:
                    astarts.append(s)
                    aends.append(e)
        self.top_anchors = top
        self.anchor_starts = np.asarray(
            sorted(int(doc.start[i]) for i in top), dtype=np.int64
        )
        self.ats = np.asarray(astarts, dtype=np.int64)
        self.ate = np.asarray(aends, dtype=np.int64)
        alens = self.ate - self.ats
        self.acum = np.concatenate(([0], np.cumsum(alens)))

    def _mass(self, starts, ends, cum, lo: int, hi: int) -> int:
        if hi <= lo or len(starts) == 0:
            return 0
        a = int(np.searchsorted(ends, lo, side="right"))
        b = int(np.searchsorted(starts, hi, side="left"))
        if a >= b:
            return 0
        total = int(cum[b] - cum[a])
        total -= max(0, lo - int(starts[a]))
        total -= max(0, int(ends[b - 1]) - hi)
        return max(0, total)

    def text_len(self, lo: int, hi: int) -> int:
        return self._mass(self.ts, self.te, self.cum, lo, hi)

    def anchor_len(self, lo: int, hi: int) -> int:
        return self._mass(self.ats, self.ate, self.acum, lo, hi)

    def anchors_in(self, lo: int, hi: int) -> int:
        a = int(np.searchsorted(self.anchor_starts, lo, side="left"))
        b = int(np.searchsorted(self.anchor_starts, hi, side="left"))
        return b - a

    def nonanchor(self, lo: int, hi: int) -> int:
        return self.text_len(lo, hi) - self.anchor_len(lo, hi)


def find_main_container(doc: DocIndex, tm: TextMass) -> tuple[int, int]:
    """Byte range of the main-content container (rule 2)."""
    lo, hi = 0, len(doc.html)
    cur_node = -1  # virtual root
    while True:
        m_cur = tm.nonanchor(lo, hi)
        if m_cur <= 0:
            return lo, hi
        kids = (
            doc.roots() if cur_node < 0 else doc.children_of(cur_node)
        )
        best = None
        best_m = -1
        for k in kids:
            klo, khi = int(doc.cstart[k]), int(doc.cend[k])
            mk = tm.nonanchor(klo, khi)
            if mk > best_m:
                best_m = mk
                best = k
        if best is None or best_m < DESCEND_FRACTION * m_cur:
            return lo, hi
        cur_node = best
        lo, hi = int(doc.cstart[best]), int(doc.cend[best])


def pruned_ranges(doc: DocIndex, tm: TextMass, lo: int, hi: int) -> list[tuple[int, int]]:
    """Outer byte ranges of boilerplate subtrees inside [lo, hi) (rule 3)."""
    out: list[tuple[int, int]] = []
    last_end = -1
    for j in doc.nodes_in_range(lo, hi):
        j = int(j)
        s, e = int(doc.start[j]), int(doc.end[j])
        if s < last_end:
            continue  # already inside a pruned subtree
        tag = doc.tag[j]
        prune = tag in BOILER_TAGS
        if not prune:
            tl = tm.text_len(int(doc.cstart[j]), int(doc.cend[j]))
            al = tm.anchor_len(int(doc.cstart[j]), int(doc.cend[j]))
            na = tm.anchors_in(int(doc.cstart[j]), int(doc.cend[j]))
            prune = na >= MIN_ANCHORS and tl > 0 and al > LINK_DENSITY_MAX * tl
        if prune:
            out.append((s, e))
            last_end = e
    return out


def main_content_spans(
    doc: DocIndex,
    media_positions: list[tuple[int, str]] | None = None,
) -> list[tuple[str, str, str | None]]:
    """Ordered output spans (kind, text, media_ref) for one document.

    media_positions: assembled byte positions of INPUT media spans
    (position, media_ref), interleaved into the output by position."""
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
    # text pieces from unpruned text regions
    ts, te = doc.tstart, doc.tend
    a = int(np.searchsorted(te, lo, side="right"))
    b = int(np.searchsorted(ts, hi, side="left"))
    for k in range(a, b):
        s = max(int(ts[k]), lo)
        e = min(int(te[k]), hi)
        if e <= s:
            continue
        # split the region around pruned ranges and at media cut points
        pieces: list[tuple[int, int]] = []
        pos = s
        ci = bisect.bisect_right(media_cuts, s)
        cuts = []
        while ci < len(media_cuts) and media_cuts[ci] < e:
            cuts.append((media_cuts[ci], media_cuts[ci]))
            ci += 1
        breaks = sorted(pruned + cuts)
        for ps, pe in breaks:
            if pe < pos or ps >= e:
                continue
            if ps > pos:
                pieces.append((pos, ps))
            pos = max(pos, pe)
        if pos < e:
            pieces.append((pos, e))
        for s2, e2 in pieces:
            t = trim_html(doc.html[s2:e2])
            if t:
                events.append((s2, 1, "text", t, None))
    # media nodes (img/embed) inside the container, unpruned
    # media events get priority 0: an input media span sitting exactly at
    # a text-region boundary comes BEFORE the text that starts there (it
    # was between the two text spans in the input sequence)
    for j in doc.nodes_in_range(lo, hi):
        j = int(j)
        if doc.tag[j] in MEDIA_TAGS and not in_pruned(int(doc.start[j])):
            attrs = doc.attrs(j)
            ref = attrs.get("src") or attrs.get("data-src") or ""
            events.append((int(doc.start[j]), 0, "media", "", ref))
    # input media spans by assembled position; the upper bound is
    # INCLUSIVE: a media span sitting exactly at the container's content
    # end (text ended right before it) still belongs to the document tail
    if media_positions:
        for pos, ref in media_positions:
            if lo <= pos <= hi and not in_pruned(pos):
                events.append((pos, 0, "media", "", ref))
    events.sort(key=lambda ev: (ev[0], ev[1]))
    return [(kind, text, ref) for _, _, kind, text, ref in events]
