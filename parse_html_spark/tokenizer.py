"""Byte-stream HTML tokenizer -> per-document node index.

One forward pass over the raw string builds, per document:

- node arrays (tag, start/end outer span, cstart/cend contents span,
  parent, depth) -- the "ELEMENTS" of the reference
  (/root/reference/src/ParseHTML.php:28-44) as columnar arrays instead of
  position->string maps;
- plain-text regions (everything outside tag/comment/decl markup), which
  back ``text()`` = PHP ``strip_tags`` semantics [:249-252];
- lazily parsed attribute maps per start tag, replicating the reference's
  extractAttributes state machine [:1317-1408].

Semantics pinned to the reference (SURVEY.md section 2.11):

- a tag starts only at ``<`` + ASCII letter (or ``</`` + letter); anything
  else (``<3``, ``< b``, stray ``<``) is text [:1892-1900 analog];
- start/close tags end at the FIRST ``>`` -- no quote awareness, matching
  the reference's strpos scans [:779, :1321];
- open/close matching is per-tag-name LIFO; an unclosed non-void element
  stays a bare start tag whose contents are empty [:1996-2000], except
  that we match exact tag tokens where the reference's prefix scan
  miscounts ``<b>``/``<br`` (divergence A.7, excluded from fixtures);
- orphan close tags are markup (not text regions, not nodes); they still
  surface verbatim inside extract() gap text, as in the reference;
- 16 void tags never take contents [:1419-1426].
"""

from __future__ import annotations

import bisect
import re

import numpy as np

VOID_TAGS = frozenset(
    "area base br col command embed hr img input keygen link meta param "
    "source track wbr".split()
)

# owned here (not boilerplate.py) so the tokenizer can pre-classify
# nodes in its single pass; boilerplate imports these
BOILER_TAGS = frozenset(
    "nav footer aside header script style form iframe noscript".split()
)
MEDIA_TAGS = ("img", "embed")

KNOWN_TAGS = frozenset(
    """a abbr address area article aside audio b base bdi bdo blockquote body
    br button canvas caption cite code col colgroup command datalist dd del
    details dfn div dl dt em embed fieldset figcaption figure footer form
    frameset frame h1 h2 h3 h4 h5 h6 head header hgroup hr html i iframe img
    input ins kbd keygen label legend li link map mark menu meta meter nav
    noscript object ol optgroup option output p param pre progress q rp rt
    ruby s samp script section select small source span strong style sub
    summary sup table tbody td textarea tfoot th thead time title tr track u
    ul var video wbr""".split()
)

# one dict probe per open tag replaces four set/equality probes in the
# token loop (round-7 profiling). Bit 0 is boiler so `fl & 1` doubles as
# the stored boiler_l value (0/1 == False/True for every consumer).
_TF_BOILER, _TF_VOID, _TF_A, _TF_MEDIA = 1, 2, 4, 8
TAG_FLAGS: dict[str, int] = {
    t: (_TF_BOILER if t in BOILER_TAGS else 0)
    | (_TF_VOID if t in VOID_TAGS else 0)
    | (_TF_A if t == "a" else 0)
    | (_TF_MEDIA if t in MEDIA_TAGS else 0)
    for t in (KNOWN_TAGS | VOID_TAGS | BOILER_TAGS | {"a", *MEDIA_TAGS})
}

# Alternatives are mutually exclusive on their first character (letter /
# '/' / '!?'), so ordering is free: the open-tag branch goes first (most
# frequent on real pages) and only the two tag names are captured --
# fewer group registers for the C engine to track per token.
# lastindex: 1 = open tag, 2 = close tag, None = <!...> / <?...> special.
TOKEN_RE = re.compile(
    r"<(?:"
    r"([a-zA-Z][a-zA-Z0-9]*)[^>]*"
    r"|/([a-zA-Z][a-zA-Z0-9]*)[^>]*"
    r"|[!?][^>]*"
    r")>"
)

_ATTR_FORBIDDEN = re.compile(r"[\"'>/=\s]")


def parse_attrs(attr_str: str, validate: bool = False) -> dict[str, str | None]:
    """Attribute map from the raw text between tag name and '>'.

    Port of the reference state machine [:1317-1408]: names lowercased,
    first duplicate wins, bare attrs -> None, a trailing bare attr without
    a following space is dropped, name '0' is dropped (PHP empty()).
    """
    s = attr_str.strip()
    attrs: dict[str, str | None] = {}
    n = len(s)
    state = 0  # 0=build_name 1=check_quote 2=build_value
    name = ""
    value: str | None = ""
    quote = ""
    register = False
    for x in range(n):
        ch = s[x]
        if state == 0:
            if x == 0:
                # the reference's 'init' state appends the very first
                # character unconditionally (even '=' or a quote) [:1336-1339]
                name += ch
            elif ch == "=":
                state = 1
            elif ch.isspace():
                value = None
                register = True
            else:
                name += ch
        elif state == 1:
            if ch in ("\"", "'"):
                state = 2
                quote = ch
            elif ch.isspace():
                pass
            else:
                value = ch
                quote = ""
                state = 2
        elif state == 2:
            if not quote and ch.isspace():
                register = True
            elif not quote and x == n - 1:
                value = (value or "") + ch
                register = True
            elif ch == quote:
                register = True
            else:
                value = (value or "") + ch
        if register:
            lname = name.lower()
            if lname and lname != "0" and lname not in attrs:
                attrs[lname] = value
            register = False
            name = ""
            value = ""
            quote = ""
            state = 0
    if validate and attrs:
        attrs = {k: v for k, v in attrs.items() if not _ATTR_FORBIDDEN.search(k)}
    return attrs


class DocIndex:
    """Columnar node index for one document."""

    __slots__ = (
        "html", "n", "tag",
        "tstart", "tend", "_attrs", "_children", "_tag_ids",
        "_tag_arr", "start_l", "end_l", "cstart_l", "cend_l", "parent_l",
        "_depth_l", "tstart_l", "tend_l", "a_ids", "media_ids", "boiler_l",
        "_start_a", "_end_a", "_cstart_a", "_cend_a", "_parent_a",
        "_depth_a",
    )

    @property
    def tag_arr(self) -> "np.ndarray":
        """Tags as a numpy object array (vectorized compares), cached."""
        if self._tag_arr is None:
            self._tag_arr = np.asarray(self.tag, dtype=object)
        return self._tag_arr

    # numpy twins the extraction hot path never touches are built lazily
    # (round-7 profiling): selector/DOM/node-table paths pay the one-time
    # conversion on first use, extraction skips it entirely

    @property
    def start(self) -> "np.ndarray":
        if self._start_a is None:
            self._start_a = np.asarray(self.start_l, dtype=np.int64)
        return self._start_a

    @property
    def end(self) -> "np.ndarray":
        if self._end_a is None:
            self._end_a = np.asarray(self.end_l, dtype=np.int64)
        return self._end_a

    @property
    def cstart(self) -> "np.ndarray":
        if self._cstart_a is None:
            self._cstart_a = np.asarray(self.cstart_l, dtype=np.int64)
        return self._cstart_a

    @property
    def cend(self) -> "np.ndarray":
        if self._cend_a is None:
            self._cend_a = np.asarray(self.cend_l, dtype=np.int64)
        return self._cend_a

    @property
    def parent(self) -> "np.ndarray":
        if self._parent_a is None:
            self._parent_a = np.asarray(self.parent_l, dtype=np.int64)
        return self._parent_a

    @property
    def depth(self) -> "np.ndarray":
        if self._depth_a is None:
            self._depth_a = np.asarray(self.depth_l, dtype=np.int64)
        return self._depth_a

    @property
    def depth_l(self) -> list[int]:
        """Node depths, derived lazily from parent pointers (a parent
        always precedes its children in start order, so one forward pass
        suffices). The extraction hot path never reads depth; only the
        node-table/selector consumers pay the O(n) build."""
        if self._depth_l is None:
            parent_l = self.parent_l
            d = [0] * self.n
            for i, p in enumerate(parent_l):
                if p >= 0:
                    d[i] = d[p] + 1
            self._depth_l = d
        return self._depth_l

    def __init__(self, html: str):
        self.html = html
        tags: list[str] = []
        starts: list[int] = []
        st_ends: list[int] = []  # end of start tag
        open_stacks: dict[str, list[int]] = {}
        # single-pass side products (round 6 profiling): plain-text
        # regions (gaps between markup tokens) built inline instead of
        # via a token_spans tuple list + second pass; anchor / media /
        # boilerplate node classification done here (set lookups per
        # open tag) so the scorer never rebuilds them per document.
        # Round 7: ends/cends writes are deferred -- the token loop only
        # records (idx, close_start, close_end) per matched closer and
        # the final arrays are built from one st_ends copy + the closure
        # list, keeping the per-token body to the minimum op count.
        tstart: list[int] = []
        tend: list[int] = []
        a_ids: list[int] = []
        media_ids: list[int] = []
        boiler_l: list[bool] = []
        closures: list[tuple[int, int, int]] = []

        # hot loop: local bindings + positional groups (group 1=close,
        # 2=cname, 3=name, 4=attrs); ~200 tokens/doc on the bench mix
        tags_append = tags.append
        starts_append = starts.append
        st_ends_append = st_ends.append
        tstart_append = tstart.append
        tend_append = tend.append
        a_append = a_ids.append
        media_append = media_ids.append
        boiler_append = boiler_l.append
        closures_append = closures.append
        get_stack = open_stacks.get
        flags_get = TAG_FLAGS.get
        pos = 0
        for m in TOKEN_RE.finditer(html):
            s_tok, e_tok = m.span()
            if s_tok > pos:
                tstart_append(pos)
                tend_append(s_tok)
            pos = e_tok
            last = m.lastindex  # 1=open, 2=close, None=special
            if last == 1:
                lname = m[1].lower()
                idx = len(tags)
                tags_append(lname)
                starts_append(s_tok)
                st_ends_append(e_tok)
                fl = flags_get(lname, 0)
                boiler_append(fl & 1)
                if fl & 12:
                    if fl & 4:
                        a_append(idx)
                    else:
                        media_append(idx)
                if not fl & 2:
                    stack = get_stack(lname)
                    if stack is None:
                        open_stacks[lname] = [idx]
                    else:
                        stack.append(idx)
            elif last == 2:
                # Only an EXACT '</name>' closes: the reference's
                # constructElement searches the literal closer with
                # stripos [:1571-1580], so '</div >' / '</div x>' close
                # nothing (the element stays a bare start tag) -- but
                # they are still markup tokens (strip_tags removes them
                # from text). Exact form <=> token length == len(name)+3.
                cname = m[2]
                if e_tok - s_tok == len(cname) + 3:
                    stack = get_stack(cname.lower())
                    if stack:
                        closures_append((stack.pop(), s_tok, e_tok))
                # orphan/junk close tag: markup only
        if pos < len(html):
            tstart_append(pos)
            tend_append(len(html))

        n = len(tags)
        self.n = n
        self.tag = tags
        # element outer end / contents end: == st_end (bare start tag)
        # until a matching closer was recorded. A closer always starts
        # at/after its open tag's end (tokens are disjoint and
        # increasing), so cend >= cstart by construction.
        ends = st_ends.copy()
        cends = st_ends.copy()
        for idx, c_s, c_e in closures:
            ends[idx] = c_e
            cends[idx] = c_s
        # list twins stay alongside the numpy forms: scalar hot paths
        # (container descent, per-node loops) index plain ints without
        # numpy boxing; vectorized paths use the arrays (end/parent/
        # depth twins are lazy properties -- extraction never reads them)
        self.start_l = starts
        self.end_l = ends
        self.cstart_l = st_ends
        self.cend_l = cends
        self._start_a = None
        self._cstart_a = None
        self._cend_a = None
        self._attrs: list[dict | None] = [None] * n
        self.a_ids = a_ids
        self.media_ids = media_ids
        self.boiler_l = boiler_l

        # parent pointers via interval stack (nodes are in start order);
        # plain-int lists, converted once (per-element numpy writes were
        # a measured hot spot)
        parent_l = [-1] * n
        stack: list[int] = []
        for i in range(n):
            s_i = starts[i]
            while stack and ends[stack[-1]] <= s_i:
                stack.pop()
            if stack:
                parent_l[i] = stack[-1]
            if ends[i] > st_ends[i]:  # only containers can own children
                stack.append(i)
        self.parent_l = parent_l
        self._depth_l = None
        self._end_a = None
        self._parent_a = None
        self._depth_a = None
        self._children: list | None = None
        self._tag_ids: dict | None = None
        self._tag_arr = None

        self.tstart_l = tstart
        self.tend_l = tend
        self.tstart = np.asarray(tstart, dtype=np.int64)
        self.tend = np.asarray(tend, dtype=np.int64)

    # -- accessors ---------------------------------------------------------

    def attrs(self, i: int, validate: bool = False) -> dict[str, str | None]:
        # attr source span is fully derivable: it runs from the end of
        # the (pure-ASCII) tag name to just before the start tag's '>',
        # so no per-node span tuple is stored in the tokenize loop
        if validate:
            a = self.start_l[i] + 1 + len(self.tag[i])
            return parse_attrs(self.html[a:self.cstart_l[i] - 1], validate=True)
        cached = self._attrs[i]
        if cached is None:
            a = self.start_l[i] + 1 + len(self.tag[i])
            cached = parse_attrs(self.html[a:self.cstart_l[i] - 1])
            self._attrs[i] = cached
        return cached

    def outer(self, i: int) -> str:
        return self.html[self.start_l[i]:self.end_l[i]]

    def contents(self, i: int) -> str:
        return self.html[self.cstart_l[i]:self.cend_l[i]]

    def starttag(self, i: int) -> str:
        return self.html[self.start_l[i]:self.cstart_l[i]]

    def is_bare(self, i: int) -> bool:
        """True when the element is only a start tag (void or unclosed)."""
        return self.end_l[i] == self.cstart_l[i]

    def tag_ids(self) -> dict[str, list[int]]:
        """tag -> sorted node ids, built lazily in one pass. Turns a
        tag-dispatched selector scan from O(nodes) per compound into
        O(matches): the page job runs ~7 tag scans per document
        (title/table + the 4-chain form selector), which all share this
        one index (round-8)."""
        if self._tag_ids is None:
            ti: dict[str, list[int]] = {}
            for j, t in enumerate(self.tag):
                lst = ti.get(t)
                if lst is None:
                    ti[t] = [j]
                else:
                    lst.append(j)
            self._tag_ids = ti
        return self._tag_ids

    def children_of(self, i: int) -> list[int]:
        if self._children is None:
            ch: list[list[int]] = [[] for _ in range(self.n)]
            for j, p in enumerate(self.parent_l):
                if p >= 0:
                    ch[p].append(j)
            self._children = ch
        return self._children[i]

    def roots(self) -> list[int]:
        return [i for i, p in enumerate(self.parent_l) if p < 0]

    def text_between(self, lo: int, hi: int) -> str:
        """Concatenated plain text within [lo, hi) -- strip_tags semantics."""
        ts_l = self.tstart_l
        te_l = self.tend_l
        if hi <= lo or not ts_l:
            return ""
        a = bisect.bisect_right(te_l, lo)
        b = bisect.bisect_left(ts_l, hi)
        if a >= b:
            return ""
        parts = []
        for k in range(a, b):
            s_k = ts_l[k]
            if s_k < lo:
                s_k = lo
            e_k = te_l[k]
            if e_k > hi:
                e_k = hi
            if e_k > s_k:
                parts.append(self.html[s_k:e_k])
        return "".join(parts)

    def node_text(self, i: int) -> str:
        """text() of a node = strip_tags of its outer HTML."""
        return self.text_between(self.cstart_l[i], self.cend_l[i])

    def nodes_in_range(self, lo: int, hi: int) -> np.ndarray:
        """Node ids whose start-tag '<' lies in [lo, hi), in doc order."""
        a = int(np.searchsorted(self.start, lo, side="left"))
        b = int(np.searchsorted(self.start, hi, side="left"))
        return np.arange(a, b, dtype=np.int64)


_TRIM_RE = re.compile(r"\s\s+")


def trim_html(s: str) -> str:
    """Reference trimHtml [:429-434]: collapse whitespace runs to one
    space; a pure-whitespace (non-empty) result becomes ''."""
    if len(s) < 2:  # no 2+ whitespace run possible: skip the regex
        return "" if s and s.isspace() else s
    s = _TRIM_RE.sub(" ", s)
    if s.isspace():
        return ""
    return s
