"""Attribute-condition DSL: parse + evaluate.

Re-expresses the reference's SQL-ish condition language
(/root/reference/src/ParseHTML.php:2055-2207):

- grammar: ``cond (AND cond)*`` groups OR'd together -- ``' OR '`` split
  first, then ``' AND '``; OR-of-ANDs only, no parentheses [:2057-2067]
- each atom is ``field <op> value`` matched by one case-insensitive regex
  with the operator alternation in a fixed order [:2085-2091]
- quotes around the value are stripped (+ backslash unescaping) [:2139-2144]
- an atom that does not parse evaluates TRUE [:2206]
- a missing attribute evaluates FALSE for every operator [:2201-2204]
- field names are compared case-SENSITIVELY against the (lowercased)
  attribute map, so only lowercase field names can match [:2145]
- =, !=, <, >, <=, >= use PHP loose comparison: numeric when both sides
  are numeric literals, else byte-wise string comparison [:2152-2169]
- ~= / ~~= split both sides on single whitespace chars (empty tokens kept,
  like preg_split without NO_EMPTY) and intersect [:2147-2150, 2173-2178]
- *=, ^=, $= and negations are case-INSENSITIVE substring/prefix/suffix;
  |= is case-sensitive ``^v$|^v-\\w+`` [:2170-2196]
"""

from __future__ import annotations

import re

OPERATORS = [
    "=", "equals", "is",
    "!=", "is not",
    "<", "is less than",
    ">", "is greater than",
    "<=", "is less than or equals",
    ">=", "is greater than or equals",
    "|=", "contains prefix",
    "~=", "contains word", "contains any word",
    "~~=", "contains all word",
    "!*=", "does not contain",
    "*=", "contains",
    "!^=", "does not start with",
    "^=", "starts with",
    "!$=", "does not end with",
    "$=", "ends with",
]

_OP_ALT = "|".join(re.escape(op) for op in OPERATORS)
ATOM_RE = re.compile(r"^(.+)\s+(" + _OP_ALT + r")\s+(.+)$", re.IGNORECASE | re.DOTALL)
_QUOTED_RE = re.compile(r"^(['\"])(.*)(['\"])$", re.IGNORECASE | re.DOTALL)
_NUMERIC_RE = re.compile(r"^[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?$")
_WS_SPLIT = re.compile(r"\s")


def split_or_and(conditions: str) -> list[list[str]]:
    """Split a condition string into OR groups of AND atoms (literal splits)."""
    ors = conditions.split(" OR ") if " OR " in conditions else [conditions]
    return [grp.split(" AND ") if " AND " in grp else [grp] for grp in ors]


def parse_fields(conditions: str) -> list[str]:
    """Field names of every parsable atom (candidate-scan driver)."""
    fields = []
    for group in split_or_and(conditions):
        for atom in group:
            m = ATOM_RE.match(atom.strip())
            if m:
                fields.append(m.group(1))
    return fields


def _strip_quotes(value: str) -> str:
    m = _QUOTED_RE.match(value)
    if m and m.group(1) == m.group(3):
        # stripslashes: drop backslashes, '\\\\' -> '\\'
        return re.sub(r"\\(.)", r"\1", m.group(2))
    return value


def _is_numeric(s: str) -> bool:
    return bool(_NUMERIC_RE.match(s.strip()))


def loose_cmp(a: str, b: str) -> int:
    """PHP-8-style loose comparison pinned to: numeric iff both sides are
    numeric literals, else byte-wise string comparison."""
    if _is_numeric(a) and _is_numeric(b):
        fa, fb = float(a), float(b)
        return -1 if fa < fb else (1 if fa > fb else 0)
    return -1 if a < b else (1 if a > b else 0)


def eval_atom(attrs: dict[str, str | None], atom: str) -> bool:
    """Evaluate one DSL atom against an attribute map."""
    m = ATOM_RE.match(atom.strip())
    if not m:
        return True  # unparsable atom evaluates TRUE
    field, op, value = m.group(1), m.group(2).lower(), m.group(3)
    value = _strip_quotes(value)
    if field not in attrs:
        return False  # missing attribute -> FALSE, for every operator
    actual = attrs[field]
    actual = "" if actual is None else actual

    if op in ("=", "equals", "is"):
        return loose_cmp(actual, value) == 0
    if op in ("!=", "is not"):
        return loose_cmp(actual, value) != 0
    if op in ("<", "is less than"):
        return loose_cmp(actual, value) < 0
    if op in (">", "is greater than"):
        return loose_cmp(actual, value) > 0
    if op in ("<=", "is less than or equals"):
        return loose_cmp(actual, value) <= 0
    if op in (">=", "is greater than or equals"):
        return loose_cmp(actual, value) >= 0
    if op in ("|=", "contains prefix"):
        pat = "(?:^" + re.escape(value) + "$|^" + re.escape(value) + r"\-\w+)"
        return re.search(pat, actual) is not None
    if op in ("~=", "contains word", "contains any word"):
        words, values = _WS_SPLIT.split(actual), _WS_SPLIT.split(value)
        return len(set(words) & set(values)) != 0
    if op in ("~~=", "contains all word"):
        words, values = _WS_SPLIT.split(actual), _WS_SPLIT.split(value)
        # PHP count(array_intersect($words,$values)) == count($values):
        # word-tokens are counted with duplicates, so "a b a" fails "a b".
        vset = set(values)
        return sum(1 for w in words if w in vset) == len(values)
    if op in ("!*=", "does not contain"):
        return re.search(re.escape(value), actual, re.IGNORECASE) is None
    if op in ("*=", "contains"):
        return re.search(re.escape(value), actual, re.IGNORECASE) is not None
    if op in ("!^=", "does not start with"):
        return re.match(re.escape(value), actual, re.IGNORECASE) is None
    if op in ("^=", "starts with"):
        return re.match(re.escape(value), actual, re.IGNORECASE) is not None
    if op in ("!$=", "does not end with"):
        return re.search(re.escape(value) + "$", actual, re.IGNORECASE) is None
    if op in ("$=", "ends with"):
        return re.search(re.escape(value) + "$", actual, re.IGNORECASE) is not None
    return False


def eval_conditions(attrs: dict[str, str | None], conditions: str | None) -> bool:
    """Full OR-of-ANDs evaluation; empty attrs -> False, empty conds -> True."""
    if not attrs:
        return False
    if not conditions:
        return True
    for group in split_or_and(conditions):
        if all(eval_atom(attrs, atom) for atom in group):
            return True
    return False


def build_conditions(attributes) -> str:
    """Selector atoms -> DSL string (name op value AND ...), as the
    reference's buildConditions does [:1832-1839]."""
    return " AND ".join(
        " ".join((a.name, a.operator, a.value)) for a in attributes
    )
