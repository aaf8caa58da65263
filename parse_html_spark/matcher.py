"""Selector evaluation over a DocIndex.

Re-expresses the reference's ``finder`` dispatch
(/root/reference/src/ParseHTML.php:1660-1785) as array operations over the
node index. Dispatch rules preserved exactly:

- tag + attribute atoms -> candidates must satisfy the full condition DSL
  AND the compound must contain at least one *parsable* atom (an
  all-presence atom set with a tag matches nothing, because
  getElementByAttributes finds no candidate fields) [:1714-1721, :2092-2098]
- lone ``#id`` (no tag, single atom named id) -> strict string equality,
  first match per scope, regardless of the atom's operator [:1726-1730,
  :2238-2247]
- lone ``.class`` -> class-word AND logic (value spaces become AND)
  [:1732-1736, :2212-2233]
- lone bare ``[attr]`` -> case-insensitive presence scan [:1738-1742]
- everything else -> the condition DSL of conditions.py
- an empty compound (from ``'a , b'``) matches nothing [:1692 falsy shift]

Divergence (SURVEY.md 2.11 A.8, documented): direct-child ``>`` is
CSS-correct here -- the reference also matches the selector deeper inside
the direct child because it re-searches a padded pseudo-element
[:1796-1823]. Fixtures are constructed in the agreement region.
"""

from __future__ import annotations

import re
from bisect import bisect_left
from functools import lru_cache

from .conditions import build_conditions, eval_conditions, parse_fields
from .selector import Compound
from .tokenizer import KNOWN_TAGS, DocIndex

_WS_SPLIT = re.compile(r"\s")
_PRESENCE_CACHE: dict[str, "re.Pattern"] = {}


def _presence_pat(name: str) -> "re.Pattern":
    pat = _PRESENCE_CACHE.get(name)
    if pat is None:
        pat = re.compile(r"\s" + re.escape(name), re.IGNORECASE)
        _PRESENCE_CACHE[name] = pat
    return pat

# R-quirk (reference getElementByAttribute -> validateStartTag
# [:504, :1481-1488]): attribute-dispatched scans only accept elements
# whose tag is in the 107-tag HTML whitelist; the tag-dispatched scan
# does NOT validate (the check is commented out at [:756-758]). So
# '[title]' never matches <custom-tag title=x>, but 'custom-tag' does.


def class_word_match(attrs: dict, conditions: str) -> bool:
    """getElementByClass word logic: AND/OR of class-word membership,
    case-sensitive [:2212-2233]. Missing class attribute -> no match."""
    # missing or bare class attribute behaves as the word list [''] (PHP
    # preg_split(null) -> ['']), so only the empty word matches it
    cls = attrs.get("class")
    words = _WS_SPLIT.split(cls) if cls is not None else [""]
    groups = conditions.split(" OR ") if " OR " in conditions else [conditions]
    for grp in groups:
        ands = grp.split(" AND ") if " AND " in grp else [grp]
        if all(a in words for a in ands):
            return True
    return False


def _atoms_match(doc: DocIndex, comp: Compound, i: int) -> bool:
    """Attribute-atom part of a compound against node i (tag pre-filtered)."""
    atoms = comp.attributes
    if not atoms:
        return True
    if comp.tag is None and len(atoms) == 1:
        atom = atoms[0]
        if atom.name == "class":
            value = atom.value.replace(" ", " AND ")
            return class_word_match(doc.attrs(i), value)
        if atom.is_presence:
            # R-quirk 11: bare presence is the reference's TEXTUAL scan --
            # whitespace + name substring anywhere inside the start tag
            # (case-insensitive), so ' title' inside an attribute VALUE
            # also matches [:488-493]. Well-formed attributes always
            # satisfy this; the quirk only widens pathological cases.
            pat = _presence_pat(atom.name)
            return pat.search(doc.starttag(i)) is not None
        # note: lone id handled by the caller (first-match semantics)
    conditions = build_conditions(atoms)
    if not parse_fields(conditions):
        return False  # no parsable atom -> no candidates in the reference
    return eval_conditions(doc.attrs(i), conditions)


def _is_lone_id(comp: Compound) -> bool:
    return (
        comp.tag is None
        and len(comp.attributes) == 1
        and comp.attributes[0].name == "id"
    )


@lru_cache(maxsize=1024)
def _atoms_parsable(atoms: tuple) -> bool:
    return bool(parse_fields(build_conditions(list(atoms))))


def _has_parsable_atom(comp: Compound) -> bool:
    """True when the compound's atoms yield >=1 parsable condition field.
    In the reference, such compounds route through getElementByAttribute
    -> validateStartTag [:756 callback, :504, :1481-1488], which enforces
    the 107-tag whitelist even on the tag-dispatched path -- so
    'blink[data-n>1]' matches nothing upstream (blink not whitelisted)
    while bare 'blink' matches (tag scan skips validation, [:756-758]).
    Memoized on the (hashable) atom tuple: plans are compiled once per
    query, so this never recompiles conditions in the per-doc hot path."""
    return _atoms_parsable(tuple(comp.attributes))


def node_matches(doc: DocIndex, comp: Compound, i: int) -> bool:
    if comp.tag is not None:
        if doc.tag[i] != comp.tag.lower():
            return False
        if (
            comp.attributes
            and doc.tag[i] not in KNOWN_TAGS
            and _has_parsable_atom(comp)
        ):
            return False  # attribute path validates even with a tag
    elif comp.attributes and doc.tag[i] not in KNOWN_TAGS:
        return False  # attribute dispatch validates the tag whitelist
    if _is_lone_id(comp):
        return doc.attrs(i).get("id") == comp.attributes[0].value
    return _atoms_match(doc, comp, i)


def _match_in_range(doc: DocIndex, comp: Compound, lo: int, hi: int) -> list[int]:
    # candidate ids via C bisect on the list twin (node starts are
    # sorted); plain-int ranges, no numpy boxing in the per-doc hot path
    start_l = doc.start_l
    a = bisect_left(start_l, lo)
    b = bisect_left(start_l, hi)
    if a >= b:
        return []
    tag = doc.tag
    if comp.tag is not None:
        want = comp.tag.lower()
        if (
            comp.attributes
            and want not in KNOWN_TAGS
            and _has_parsable_atom(comp)
        ):
            return []  # attribute path validates even with a tag
        # tag-dispatched scan via the per-doc tag->ids index: O(matches)
        # instead of a full-node pass per compound (the page job runs
        # ~7 tag scans per doc; round-8). Ids are sorted, so the scope
        # restriction is a bisect on the tag's own id list.
        ids = doc.tag_ids().get(want)
        if not ids:
            return []
        ia = bisect_left(ids, a)
        ib = bisect_left(ids, b)
        cand = ids[ia:ib]
    elif comp.attributes:
        # attribute dispatch: only whitelisted HTML tags are candidates
        cand = [j for j in range(a, b) if tag[j] in KNOWN_TAGS]
    else:
        cand = list(range(a, b))
    if _is_lone_id(comp):
        value = comp.attributes[0].value
        for j in cand:
            if doc.attrs(j).get("id") == value:
                return [j]  # strict ===, first match, break [:2242-2244]
        return []
    return [j for j in cand if _atoms_match(doc, comp, j)]


def eval_chain(
    doc: DocIndex, chain: list[Compound], scopes: list[tuple[int, int]]
) -> list[int]:
    """Evaluate one descendant chain within the given character ranges.

    Returns matched node ids (deduped, insertion order)."""
    nodes: list[int] | None = None
    for comp in chain:
        if comp.is_empty:
            return []
        out: list[int] = []
        seen: set[int] = set()
        if comp.direct and nodes is not None:
            if comp.ref_requery:
                # A.8 ref-compat: the reference re-searches each direct
                # child's padded pseudo-element as DESCENDANTS, so the
                # step matches the child itself or anything inside it
                # [ParseHTML.php:1796-1823]
                for nd in nodes:
                    for ch in doc.children_of(nd):
                        for j in _match_in_range(
                            doc, comp, doc.start_l[ch], doc.end_l[ch]
                        ):
                            if j not in seen:
                                seen.add(j)
                                out.append(j)
            else:
                for nd in nodes:
                    for ch in doc.children_of(nd):
                        if ch not in seen and node_matches(doc, comp, ch):
                            seen.add(ch)
                            out.append(ch)
        else:
            ranges = (
                scopes
                if nodes is None
                else [(doc.cstart_l[n], doc.cend_l[n]) for n in nodes]
            )
            for lo, hi in ranges:
                for j in _match_in_range(doc, comp, lo, hi):
                    if j not in seen:
                        seen.add(j)
                        out.append(j)
        nodes = out
        if not nodes:
            return []
    return nodes if nodes is not None else []


def find_nodes(
    doc: DocIndex,
    plan: list[list[Compound]],
    scopes: list[tuple[int, int]],
) -> list[int]:
    """Union of all chains, deduped, ordered by document position
    (SURVEY.md 2.8 ordering pin: ascending byte offset)."""
    seen: set[int] = set()
    out: list[int] = []
    for chain in plan:
        for j in eval_chain(doc, chain, scopes):
            if j not in seen:
                seen.add(j)
                out.append(j)
    out.sort(key=doc.start_l.__getitem__)
    return out
