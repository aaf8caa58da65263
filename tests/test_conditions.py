"""Condition-DSL goldens from /root/reference/src/ParseHTML.php:556-576,
2055-2207, with the pinned case-sensitivity split of SURVEY.md section 2.4."""

from parse_html_spark.conditions import (
    eval_atom,
    eval_conditions,
    loose_cmp,
    parse_fields,
)

ATTRS = {
    "title": "Mari Kemari",
    "class": "first second",
    "id": "form",
    "method": "GET",
    "data-length": "1000",
    "href": "top-menu",
    "empty": "",
    "bare": None,
}


def test_equals_aliases_and_quoting():
    assert eval_atom(ATTRS, "title equals Mari Kemari")
    assert eval_atom(ATTRS, 'title equals "Mari Kemari"')
    assert eval_atom(ATTRS, "title equals 'Mari Kemari'")
    assert eval_atom(ATTRS, "title = Mari Kemari")
    assert eval_atom(ATTRS, "title is Mari Kemari")
    assert not eval_atom(ATTRS, "title = mari kemari")  # case-sensitive


def test_numeric_loose_comparison():
    assert eval_atom(ATTRS, "data-length > 500")
    assert eval_atom(ATTRS, "data-length < 2000")
    assert not eval_atom(ATTRS, "data-length > 2000")
    assert eval_atom(ATTRS, "data-length = 1000.0")  # numeric ==
    assert eval_atom(ATTRS, "data-length >= 1000")
    assert eval_atom(ATTRS, "data-length <= 1000")


def test_string_comparison_when_not_numeric():
    assert eval_atom(ATTRS, "method = GET")
    assert not eval_atom(ATTRS, "method = get")
    assert eval_atom(ATTRS, "method != POST")


def test_or_of_ands():
    assert eval_conditions(ATTRS, "id = 'form' OR method = POST")
    assert not eval_conditions(ATTRS, "id = x OR method = POST")
    assert eval_conditions(ATTRS, "data-length > 500 AND data-length < 2000")
    assert not eval_conditions(ATTRS, "data-length > 500 AND method = POST")
    assert eval_conditions(
        ATTRS, "data-length > 5000 AND method = GET OR id = form"
    )


def test_missing_attribute_is_false_even_negated():
    assert not eval_atom(ATTRS, "nosuch = x")
    assert not eval_atom(ATTRS, "nosuch != x")  # missing -> false, always
    assert not eval_atom(ATTRS, "nosuch does not contain x")


def test_unparsable_atom_is_true():
    assert eval_atom(ATTRS, "title")  # no operator -> parses to nothing
    assert eval_atom(ATTRS, "")


def test_field_name_case_sensitive_against_lowercased_store():
    assert not eval_atom(ATTRS, "Title = Mari Kemari")


def test_word_operators_case_sensitive():
    assert eval_atom(ATTRS, "class ~= first")
    assert eval_atom(ATTRS, "class contains word second")
    assert eval_atom(ATTRS, "class contains any word zzz first")
    assert not eval_atom(ATTRS, "class ~= First")
    assert eval_atom(ATTRS, "class ~~= first second")
    assert eval_atom(ATTRS, "class contains all word second first")
    assert not eval_atom(ATTRS, "class ~~= first third")


def test_substring_operators_case_insensitive():
    assert eval_atom(ATTRS, "title *= kemari")
    assert eval_atom(ATTRS, "title contains KEMARI")
    assert not eval_atom(ATTRS, "title !*= kemari")
    assert eval_atom(ATTRS, "title ^= mari")
    assert eval_atom(ATTRS, "title $= KEMARI")
    assert eval_atom(ATTRS, "title does not start with kemari")
    assert eval_atom(ATTRS, "title does not end with zzz")
    assert not eval_atom(ATTRS, "title does not end with KEMARI")


def test_prefix_operator_case_sensitive():
    assert eval_atom(ATTRS, "href |= top")
    assert not eval_atom(ATTRS, "href |= TOP")
    assert eval_atom({"href": "top"}, "href |= top")
    assert not eval_atom({"href": "topmost"}, "href |= top")


def test_bare_attr_value_is_empty_string_for_compare():
    assert eval_atom(ATTRS, "bare = ''")
    assert eval_atom(ATTRS, "empty = ''")


def test_parse_fields():
    assert parse_fields("a = 1 AND b  AND c > 2 OR d *= x") == ["a", "c", "d"]
    assert parse_fields("title") == []


def test_atom_regex_greediness_quirks():
    """Pinned parser quirks shared with the reference's single regex
    [:2085-2091]: greedy field capture + first-alternation-wins ops."""
    from parse_html_spark.conditions import ATOM_RE

    # 'is not x' parses as op 'is' with VALUE 'not x' ('is' precedes
    # 'is not' in the alternation and the regex engine takes it)
    assert ATOM_RE.match("title is not x").groups() == ("title", "is", "not x")
    assert eval_atom({"title": "not x"}, "title is not x")
    assert not eval_atom({"title": "y"}, "title is not x")
    # chained '=' is split greedily: field 'a = b', value 'c'
    assert ATOM_RE.match("a = b = c").groups() == ("a = b", "=", "c")
    # multi-word alias ops survive the greedy field
    assert ATOM_RE.match("class contains all word a b").groups() == (
        "class", "contains all word", "a b",
    )


def test_loose_cmp_pin():
    assert loose_cmp("10", "9") > 0  # numeric, not lexicographic
    assert loose_cmp("abc", "abd") < 0
    assert loose_cmp(" 10 ", "10") == 0  # whitespace-tolerant numerics
    assert loose_cmp("1e2", "100") == 0
