"""CSS-selector front-end: compile a selector string to a SelectorPlan.

Pure-Python, driver-side, runs once per query (never per row). Re-expresses
the state machine of the reference's ``translateSelector``
(/root/reference/src/ParseHTML.php:949-1257) with the same observable
behavior, including its edge cases:

- ``#v`` -> (id, '=', v); ``.v`` -> (class, '~=', v); chained ``.a.b`` ->
  single atom (class, '~~=', 'a b')  [ParseHTML.php:1026-1036, 1129-1133]
- ``>`` sets the ``direct`` flag of the *next* compound [:1022-1024]
- comma starts a new chain [:1017-1020]; a comma preceded by whitespace
  pushes an *empty* compound into the previous chain (which matches
  nothing) -- replicated [:1017-1020 via the 'init' state]
- backslash escapes a following meta character [:971-973]
- first char may only be a meta char among ``# . [`` and the last char may
  not be a meta char except ``]`` [:957-965]
- more than one distinct tag in a compound invalidates the whole selector
  (returns None) [:1231-1240]
- ``a>b`` without spaces parses as tag ``ab`` (the '>' is silently ignored
  inside the tag state) -- replicated [:1147-1185 has no '>' case]
- a selector ending mid-bracket (``[a=b``) yields no chains -> invalid
"""

from __future__ import annotations

from dataclasses import dataclass, field

META = '!"#$%&\'()*+,./:;<=>?@[\\]^`{|}~'


@dataclass(frozen=True)
class Atom:
    """One attribute condition of a compound: [name op value]."""

    name: str
    operator: str
    value: str

    @property
    def is_presence(self) -> bool:
        return self.operator == "" and self.value == ""


@dataclass
class Compound:
    """One simple-element step: optional tag + attribute atoms."""

    direct: bool = False
    tag: str | None = None
    attributes: list[Atom] = field(default_factory=list)
    # ref-compat A.8: a direct-child step ALSO matches deeper descendants
    # of the direct child (the reference re-searches the padded
    # pseudo-element as descendants, ParseHTML.php:1796-1823)
    ref_requery: bool = False

    @property
    def is_empty(self) -> bool:
        return self.tag is None and not self.attributes


# A plan is a list of chains; a chain is a list of Compounds evaluated as
# descendant steps (or direct-child steps when compound.direct is set).
SelectorPlan = list[list[Compound]]

_INIT, _TAG, _VALUE, _BR_NAME, _BR_OP, _BR_VALUE = range(6)


def compile_selector(selector: str, ref_compat: bool = False) -> SelectorPlan | None:
    """Compile a selector; returns None when the selector is invalid.

    ref_compat=True enables the opt-in REFERENCE-BUG-COMPATIBLE mode for
    the two documented selector divergences (SURVEY 2.11): A.12 --
    bracket quoted values keep the CLOSING quote and drop embedded
    spaces, exactly as the reference CODE does [:1110-1112] (so
    '[href="x"]' compiles to value 'x\"' and effectively never matches);
    and A.8 -- compounds are flagged ref_requery so direct-child steps
    re-search descendants (see matcher.eval_chain)."""
    s = selector.strip()
    if not s:
        return None
    last, first = s[-1], s[0]
    if last != "]" and last in META:
        return None
    if first in META and first not in "#.[":
        return None

    # Classify characters: (type, char). Backslash escapes a meta char.
    chars: list[tuple[str, str]] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n and s[i + 1] in META:
            i += 1
            chars.append(("std", s[i]))
        elif ch in META:
            chars.append(("meta", ch))
        elif ch.isspace():
            chars.append(("space", ch))
        else:
            chars.append(("std", ch))
        i += 1

    step = _INIT
    a_name = a_op = a_value = quote = tag = ""
    plan: SelectorPlan = []
    chain: list[Compound] = []
    comp = Compound()
    reg_el = reg_chain = reg_plan = False
    total = len(chars)

    for x, (typ, ch) in enumerate(chars):
        is_last = x == total - 1
        if step == _INIT:
            if typ == "std":
                tag += ch
                step = _TAG
                if is_last:
                    reg_el = reg_chain = reg_plan = True
            elif typ == "meta":
                if ch == ",":
                    reg_chain = reg_plan = True
                elif ch == ">":
                    comp.direct = True
                elif ch == "#":
                    a_name, a_op, step = "id", "=", _VALUE
                elif ch == ".":
                    a_name, a_op, step = "class", "~=", _VALUE
                elif ch == "[":
                    step = _BR_NAME
            # space in init: ignored
        elif step == _BR_NAME:
            if typ == "std":
                a_name += ch
            elif typ == "meta":
                if ch == "]":
                    reg_el = True
                    if is_last:
                        reg_chain = reg_plan = True
                else:
                    a_op = ch
                    step = _BR_OP
        elif step == _BR_OP:
            if typ == "std":
                a_value += ch
                step = _BR_VALUE
            elif typ == "meta":
                if ch in ("\"", "'"):
                    quote = ch
                    step = _BR_VALUE
                elif ch == "]":
                    reg_el = True
                    if is_last:
                        reg_chain = reg_plan = True
                else:
                    a_op += ch
        elif step == _BR_VALUE:
            if typ == "std":
                a_value += ch
            elif ref_compat and typ == "space":
                pass  # A.12 compat: reference has no space branch
            elif ref_compat and typ == "meta" and ch == quote:
                a_value += ch  # A.12 compat: closing quote kept in value
                quote = ""
            elif typ == "meta" and ch in ("\"", "'") and ch != quote:
                a_value += ch
            elif typ == "meta" and ch == quote:
                # closing quote terminates the value. The reference CODE
                # appends it [:1110-1112], but its authoritative docblock
                # AST golden [:936-942] shows the quote consumed -- we
                # follow the documented semantics. The reference also has
                # no space branch here (embedded spaces dropped); we keep
                # them. Ledgered as SURVEY 2.11 quirk A.12 with pinned
                # fixtures (test_selector.py).
                quote = ""
            elif typ == "meta" and ch == "]":
                reg_el = True
                if is_last:
                    reg_chain = reg_plan = True
            elif typ == "meta":
                a_value += ch
            else:  # space inside brackets is kept in the value
                a_value += ch
        elif step == _VALUE:
            if typ == "std":
                a_value += ch
                if is_last:
                    reg_el = reg_chain = reg_plan = True
            elif typ == "space":
                reg_el = reg_chain = True
            elif typ == "meta":
                if ch == "." and a_name == "class":
                    a_value += " "
                    a_op = "~~="
                elif ch == ",":
                    reg_el = reg_chain = reg_plan = True
                else:
                    reg_el = True
        elif step == _TAG:
            if typ == "std":
                tag += ch
                if is_last:
                    reg_el = reg_chain = reg_plan = True
            elif typ == "space":
                reg_el = reg_chain = True
            elif typ == "meta":
                if ch == ",":
                    reg_el = reg_chain = reg_plan = True
                elif ch == "#":
                    a_name, a_op, step = "id", "=", _VALUE
                elif ch == ".":
                    a_name, a_op, step = "class", "~=", _VALUE
                elif ch == "[":
                    step = _BR_NAME
                # any other meta (incl '>') is silently ignored in tag state

        if reg_el:
            if tag:
                if comp.tag is not None and comp.tag != tag:
                    return None  # >1 distinct tag per compound -> invalid
                comp.tag = tag
            if a_name or a_op or a_value:
                comp.attributes.append(Atom(a_name, a_op, a_value))
            reg_el = False
            a_name = a_op = a_value = quote = tag = ""
            if typ == "meta":
                if ch == "#":
                    a_name, a_op, step = "id", "=", _VALUE
                elif ch == ".":
                    a_name, a_op, step = "class", "~=", _VALUE
                elif ch == "]":
                    step = _INIT
                    if x + 1 < len(s) and s[x + 1].isspace():
                        reg_chain = True
                elif ch == "[":
                    step = _BR_NAME
        if reg_chain:
            chain.append(comp)
            comp = Compound()
            reg_chain = False
            step = _INIT
        if reg_plan:
            plan.append(chain)
            chain = []
            reg_plan = False
            step = _INIT

    if not plan:
        return None
    if ref_compat:
        for chain in plan:
            for comp in chain:
                comp.ref_requery = True
    return plan
