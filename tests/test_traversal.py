"""Traversal extensions (prev/next/parent/parents/contents_list,
filter_nodes) + the attribute-dispatch tag-whitelist quirk."""

from parse_html_spark.dom import PH

DOC = (
    '<div id="w"><ul><li id="a">A</li><li id="b">B</li><li id="c">C</li>'
    "</ul><p>tail</p></div>"
)


def test_prev_next():
    b = PH(DOC).find("#b")
    assert b.prev().attr("id") == "a"
    assert b.next().attr("id") == "c"
    assert len(PH(DOC).find("#a").prev()) == 0
    assert PH(DOC).find("ul").next().text() == "tail"


def test_parent_and_parents():
    b = PH(DOC).find("#b")
    assert b.parent().html().startswith("<ul>")
    ps = b.parents()
    assert len(ps) == 2  # ul, div
    assert b.parents("div").attr("id") == "w"


def test_next_with_filter():
    a = PH(DOC).find("#a")
    assert a.next("li").attr("id") == "b"
    assert len(a.next("p")) == 0


def test_contents_list():
    out = PH("<p>one <b>two</b> three</p>").find("p").contents_list()
    assert out[0] == "one "
    assert out[1].text() == "two"
    assert out[2] == " three"


def test_filter_nodes_udf_hook():
    r = PH(DOC).find("li").filter_nodes(
        lambda d, n: d.attrs(n).get("id") in ("a", "c")
    )
    assert [r.eq(i).attr("id") for i in range(len(r))] == ["a", "c"]


def test_attribute_dispatch_tag_whitelist():
    doc = '<custom-x title="t">X</custom-x><p title="t">P</p>'
    # note: tag charset is [a-zA-Z][a-zA-Z0-9]*, so '<custom-x' tokenizes
    # as tag 'custom'; still not in the whitelist
    assert len(PH(doc).find("[title]")) == 1
    assert PH(doc).find("[title]").text() == "P"
    assert len(PH(doc).find('[title="t"]')) == 1
    # tag-dispatched scan does NOT validate the whitelist
    assert len(PH(doc).find("custom")) == 1


def test_presence_is_textual_scan_quirk11():
    # R-quirk 11 (ParseHTML.php:488-493): bare [attr] presence is a
    # whitespace+name TEXTUAL scan over the start tag, so the name
    # inside an attribute VALUE also matches
    doc = '<img alt="my title here"><p data-x="1">t</p>'
    assert len(PH(doc).find("[title]")) == 1
    assert PH(doc).find("[title]").attr("alt") == "my title here"
    # but valued operators go through the attribute map: no title attr
    assert len(PH(doc).find("[title*=my]")) == 0


def test_whitelist_with_dsl_conditions():
    doc = '<blink data-n="5">old</blink><em data-n="5">em</em>'
    assert PH(doc).find("[data-n>1]").text() == "em"
    assert PH(doc).find("blink").text() == "old"
