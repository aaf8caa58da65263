"""The reference README's own usage + selector support matrix
(/root/reference/README.md:14-61) exercised end-to-end."""

from parse_html_spark.dom import PH

PAGE = """<html><head><title>My Page</title></head><body>
<form id="form-register" class="front"><input name="u" value="1"></form>
<a class="links" href="/go" ref="nofollow">Go</a>
<div class="office"><span class="address">Main St</span></div>
<table id="my-table-1"><tr><td>c</td></tr></table>
<input name="i1"><textarea name="t1">T</textarea>
<select name="s1"><option value="o">O</option></select>
<button name="b1" value="B">B</button>
<p lang="en-us">prefixed</p>
<p data-x="hello world">words</p>
</body></html>"""


def test_readme_usage_rows():
    html = PH(PAGE)
    assert html.find("title").text() == "My Page"
    assert html.find("a.links").attr("href") == "/go"


def test_selector_support_matrix():
    h = PH(PAGE)
    assert h.find("#my-table-1").html().startswith('<table id="my-table-1">')
    assert h.find(".links").text() == "Go"
    assert h.find("span").text() == "Main St"
    assert h.find("div span").text() == "Main St"
    assert h.find("div.office > span.address").text() == "Main St"
    assert len(h.find("[ref]")) == 1
    assert h.find("[lang|='en']").text() == "prefixed"
    assert h.find("[data-x*='lo wo']").text() == "words"
    assert h.find("[data-x~='world']").text() == "words"
    assert h.find("[data-x$='world']").text() == "words"
    assert h.find("[data-x='hello world']").text() == "words"
    assert h.find("[ref!='follow']").text() == "Go"
    assert h.find("[data-x^='hello']").text() == "words"


def test_readme_mixed_selectors():
    h = PH(PAGE)
    assert h.find("#form-register.front input").attr("name") == "u"
    assert h.find("a.links[ref='nofollow']").text() == "Go"
    assert len(h.find("input, textarea, select, button")) == 5  # 2 inputs
