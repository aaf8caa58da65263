"""Crash-safety fuzz: arbitrary input must never raise -- invalid
selectors compile to None (chainable empty), arbitrary byte soup
tokenizes to a consistent index, attrs parse to a dict."""

import hypothesis.strategies as st
from hypothesis import given, settings

from parse_html_spark.conditions import eval_conditions
from parse_html_spark.dom import PH
from parse_html_spark.selector import compile_selector
from parse_html_spark.tokenizer import DocIndex, parse_attrs


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_selector_compiler_never_raises(s):
    plan = compile_selector(s)
    assert plan is None or isinstance(plan, list)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>ab c/=\"'!-x1.#[]", max_size=120))
def test_tokenizer_never_raises_on_soup(s):
    d = DocIndex(s)
    assert d.n >= 0
    # index invariants hold even for garbage
    for i in range(d.n):
        assert 0 <= d.start[i] < d.cstart[i] <= d.end[i] <= len(s)
    # text regions in-bounds and ordered
    last = 0
    for a, b in zip(d.tstart, d.tend):
        assert last <= a < b <= len(s)
        last = b


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab c=\"'x1-_0", max_size=80))
def test_parse_attrs_never_raises(s):
    attrs = parse_attrs(s)
    assert isinstance(attrs, dict)
    attrs_v = parse_attrs(s, validate=True)
    assert set(attrs_v) <= set(attrs)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60), st.text(alphabet="abc<>/= ", max_size=80))
def test_find_never_raises(selector, html):
    r = PH(html).find(selector)
    assert r.text() is not None


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcde-", min_size=1, max_size=8),
        st.one_of(st.none(), st.text(max_size=12)),
        max_size=4,
    ),
    st.text(max_size=50),
)
def test_eval_conditions_never_raises(attrs, conditions):
    assert eval_conditions(attrs, conditions) in (True, False)
