"""Direct unit tests for the pinned boilerplate-strip spec
(parse_html_spark/boilerplate.py docstring rules 1-5)."""

from parse_html_spark.boilerplate import (
    TextMass,
    find_main_container,
    main_content_spans,
    pruned_ranges,
)
from parse_html_spark.tokenizer import DocIndex

PAGE = (
    "<html><body>"
    '<nav class="m"><a href="/1">one</a> <a href="/2">two</a></nav>'
    "<div id=\"main\">"
    "<p>The first real paragraph of body text goes right here.</p>"
    "<p>A second paragraph with even more body text for mass.</p>"
    '<div class="linkfarm"><a href="/x">x1</a> <a href="/y">y2</a> '
    '<a href="/z">z3</a></div>'
    '<img src="pic.png">'
    "</div>"
    '<footer><a href="/c">contact</a></footer>'
    "</body></html>"
)


def test_container_is_main_div():
    doc = DocIndex(PAGE)
    tm = TextMass(doc)
    lo, hi = find_main_container(doc, tm)
    main = doc.tag.index("div")
    assert (lo, hi) == (int(doc.cstart[main]), int(doc.cend[main]))


def test_linkfarm_pruned_but_paragraphs_kept():
    doc = DocIndex(PAGE)
    tm = TextMass(doc)
    lo, hi = find_main_container(doc, tm)
    pruned = pruned_ranges(doc, tm, lo, hi)
    farm = doc.tag.index("div", doc.tag.index("div") + 1)
    assert (int(doc.start[farm]), int(doc.end[farm])) in pruned


def test_output_spans_golden():
    spans = main_content_spans(DocIndex(PAGE))
    assert spans == [
        ("text", "The first real paragraph of body text goes right here.", None),
        ("text", "A second paragraph with even more body text for mass.", None),
        ("media", "", "pic.png"),
    ]


def test_single_inline_anchor_not_pruned():
    page = (
        "<div><p>Body text with one <a href='/r'>inline link</a> kept "
        "because a paragraph with a single anchor is content.</p></div>"
    )
    spans = main_content_spans(DocIndex(page))
    joined = " ".join(t for k, t, _ in spans if k == "text")
    assert "inline link" in joined


def test_empty_and_textless_docs():
    assert main_content_spans(DocIndex("")) == []
    assert main_content_spans(DocIndex("<div><img src='x'></div>")) == [
        ("media", "", "x")
    ]


def test_media_positions_outside_container_dropped():
    page = "<body><nav><a href='/1'>n1</a> <a href='/2'>n2</a></nav><div><p>" + (
        "body word " * 30
    ) + "</p></div></body>"
    doc = DocIndex(page)
    # media sitting inside the nav (position 10) is outside the main
    # container; media at the container midpoint survives
    tm_lo, tm_hi = find_main_container(doc, TextMass(doc))
    mid = (tm_lo + tm_hi) // 2
    spans = main_content_spans(doc, [(10, "media://out"), (mid, "media://in")])
    refs = [r for k, _t, r in spans if k == "media"]
    assert refs == ["media://in"]
