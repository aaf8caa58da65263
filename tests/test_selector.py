"""Selector compiler goldens, transcribed from the reference docblock
(/root/reference/src/ParseHTML.php:861-947) and edge rules (:957-965,
:1231-1240)."""

from parse_html_spark.selector import Atom, compile_selector


def plan_as_tuples(plan):
    return [
        [
            (c.direct, c.tag, [(a.name, a.operator, a.value) for a in c.attributes])
            for c in chain
        ]
        for chain in plan
    ]


def test_docblock_extreme_example():
    sel = 'div.class1.class2 a, #someid.class3.class4 > img[title][href="\\/a"]'
    plan = compile_selector(sel)
    assert plan_as_tuples(plan) == [
        [
            (False, "div", [("class", "~~=", "class1 class2")]),
            (False, "a", []),
        ],
        [
            (False, None, [("id", "=", "someid"), ("class", "~~=", "class3 class4")]),
            (True, "img", [("title", "", ""), ("href", "=", "/a")]),
        ],
    ]


def test_simple_tag():
    assert plan_as_tuples(compile_selector("div")) == [[(False, "div", [])]]


def test_id_shortcut():
    assert plan_as_tuples(compile_selector("#main")) == [
        [(False, None, [("id", "=", "main")])]
    ]


def test_class_shortcut():
    assert plan_as_tuples(compile_selector(".item")) == [
        [(False, None, [("class", "~=", "item")])]
    ]


def test_chained_classes_become_all_words():
    assert plan_as_tuples(compile_selector(".a.b")) == [
        [(False, None, [("class", "~~=", "a b")])]
    ]


def test_descendant_chain():
    assert plan_as_tuples(compile_selector("ul li a")) == [
        [(False, "ul", []), (False, "li", []), (False, "a", [])]
    ]


def test_direct_child():
    assert plan_as_tuples(compile_selector("ul > li")) == [
        [(False, "ul", []), (True, "li", [])]
    ]


def test_multi_selector_comma():
    assert plan_as_tuples(compile_selector("a, b")) == [
        [(False, "a", [])],
        [(False, "b", [])],
    ]


def test_comma_after_space_poisons_chain():
    # 'a , b' pushes an empty compound into the first chain (replicated
    # reference behavior: that chain can never match)
    plan = compile_selector("a , b")
    tup = plan_as_tuples(plan)
    assert tup[0][0] == (False, "a", [])
    assert tup[0][1] == (False, None, [])  # poisoned empty compound
    assert tup[1] == [(False, "b", [])]


def test_bracket_attribute_forms():
    assert plan_as_tuples(compile_selector("[title]")) == [
        [(False, None, [("title", "", "")])]
    ]
    assert plan_as_tuples(compile_selector('[href="x"]')) == [
        [(False, None, [("href", "=", "x")])]
    ]
    assert plan_as_tuples(compile_selector("[data-n>=10]")) == [
        [(False, None, [("data-n", ">=", "10")])]
    ]
    assert plan_as_tuples(compile_selector('a[href$=".pdf"]')) == [
        [(False, "a", [("href", "$=", ".pdf")])]
    ]


def test_tag_gt_tag_without_spaces_parses_as_one_tag():
    # replicated: '>' is ignored inside the tag state, so 'a>b' is tag 'ab'
    assert plan_as_tuples(compile_selector("a>b")) == [[(False, "ab", [])]]


def test_invalid_selectors():
    assert compile_selector("div,") is None  # trailing meta char
    assert compile_selector("*") is None  # leading meta not in #.[
    assert compile_selector("") is None
    assert compile_selector("div[a=b]span") is None  # two tags, one compound
    assert compile_selector("[a=b") is None  # unterminated bracket


def test_escaped_meta_in_value():
    assert plan_as_tuples(compile_selector("#a\\.b")) == [
        [(False, None, [("id", "=", "a.b")])]
    ]


def test_quoted_bracket_value_keeps_other_quote():
    assert plan_as_tuples(compile_selector("[a=\"it's\"]")) == [
        [(False, None, [("a", "=", "it's")])]
    ]


def test_id_then_bracket_same_compound():
    assert plan_as_tuples(compile_selector("#x[b=1]")) == [
        [(False, None, [("id", "=", "x"), ("b", "=", "1")])]
    ]


def test_bracket_then_descendant():
    assert plan_as_tuples(compile_selector("[a=1] b")) == [
        [(False, None, [("a", "=", "1")]), (False, "b", [])]
    ]


def test_quoted_value_divergence_pin():
    """Quirk A.12 pin (SURVEY 2.11): the reference CODE appends the
    closing quote into the value (ParseHTML.php:1110-1112; '[href="x"]'
    -> value 'x"') and drops embedded spaces ('[title="a b"]' -> 'ab');
    its own docblock AST golden (:936-942) consumes the quote. We follow
    the documented semantics: quote consumed, spaces kept."""
    assert plan_as_tuples(compile_selector('[href="x"]')) == [
        [(False, None, [("href", "=", "x")])]
    ]
    assert plan_as_tuples(compile_selector('[title="a b"]')) == [
        [(False, None, [("title", "=", "a b")])]
    ]
    # unquoted values are the agreement region (fixtures use these)
    assert plan_as_tuples(compile_selector("[href=x]")) == [
        [(False, None, [("href", "=", "x")])]
    ]
