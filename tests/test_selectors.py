"""CSS selector engine: grammar, matching semantics, Spark surface."""

import pytest

from html5ever_elixir_spark.functions.selectors import (
    SelectorError,
    compile_selector,
    select,
)
from html5ever_elixir_spark.parser.api import parse_document


def _ids(html, sel):
    return [e.id for e in select(parse_document(html).doc, sel)]


def _names(html, sel):
    return [e.name for e in select(parse_document(html).doc, sel)]


HTML = (
    '<!doctype html><html><head><title>T</title></head><body>'
    '<h1 id="top">H</h1><!-- c -->'
    '<div class="content main"><p>one</p><p>two</p><span></span></div>'
    '<div class="nav"><a href="/p/4" rel="next nofollow">next</a>'
    '<a href="/x">off</a></div>'
    '<footer lang="en-US">f</footer></body></html>'
)


def test_simple_and_compound():
    assert _names(HTML, "p") == ["p", "p"]
    assert _names(HTML, "*.content") == ["div"]
    assert _names(HTML, "#top") == ["h1"]
    assert _names(HTML, "div.content.main") == ["div"]
    assert _names(HTML, "div.content.missing") == []
    assert _names(HTML, "p, a") == ["p", "p", "a", "a"]  # document order


def test_attribute_operators():
    assert len(_ids(HTML, "a[href]")) == 2
    assert len(_ids(HTML, 'a[href="/x"]')) == 1
    assert len(_ids(HTML, 'a[href^="/p/"]')) == 1
    assert len(_ids(HTML, 'a[href$="4"]')) == 1
    assert len(_ids(HTML, 'a[href*="p"]')) == 1
    assert len(_ids(HTML, 'a[href*="/"]')) == 2
    assert len(_ids(HTML, "a[rel~=nofollow]")) == 1
    assert len(_ids(HTML, "a[rel~=no]")) == 0  # token, not substring
    assert len(_ids(HTML, "footer[lang|=en]")) == 1
    assert len(_ids(HTML, "footer[lang|=e]")) == 0
    assert len(_ids(HTML, 'a[href^=""]')) == 0  # empty never matches


def test_combinators():
    assert _names(HTML, "div.content > p") == ["p", "p"]
    assert _names(HTML, "body p") == ["p", "p"]
    assert _names(HTML, "html p") == ["p", "p"]  # deep descendant
    # adjacency skips the comment node between h1 and div
    assert _names(HTML, "h1 + div") == ["div"]
    assert _names(HTML, "h1 + footer") == []
    assert _names(HTML, "h1 ~ footer") == ["footer"]
    assert _names(HTML, "p + p") == ["p"]
    assert _names(HTML, "body > p") == []


def test_pseudo_classes():
    assert len(_ids(HTML, "p:first-child")) == 1
    assert _names(HTML, "div.content > :last-child") == ["span"]
    assert len(_ids(HTML, "span:empty")) == 1
    assert len(_ids(HTML, "p:empty")) == 0
    assert len(_ids(HTML, "title:only-child")) == 1
    assert len(_ids(HTML, "div.content > :nth-child(2)")) == 1
    assert _names(HTML, "div.content > :nth-child(2n+1)") == ["p", "span"]
    assert _names(HTML, "div.content > :nth-child(even)") == ["p"]
    assert _names(HTML, "div.content > :nth-child(-n+2)") == ["p", "p"]
    assert _names(HTML, "p:not(:first-child)") == ["p"]
    assert _names(HTML, "div:not(.nav)") == ["div"]
    assert len(_ids(HTML, "a:not([href^='/p/'])")) == 1


def test_template_contents_not_matched():
    html = "<body><template><p>hidden</p></template><p>shown</p></body>"
    assert len(_ids(html, "p")) == 1


def test_deep_document_iterative():
    html = "<div>" * 5000 + "<p>x</p>" + "</div>" * 5000
    assert len(_ids(html, "div p")) == 1  # no RecursionError


def test_selector_errors():
    for bad in ["", "  ", "div >", "> p", "a >> b", "a,,b", "::before",
                ":nth-of-type(2)", ":nth-child(x)", ":not()",
                ":not(:not(a))", "a[b=c", ":hover"]:
        with pytest.raises(SelectorError):
            compile_selector(bad)


def test_select_nodes_spark(spark):
    from html5ever_elixir_spark.operators.select import select_nodes

    df = spark.createDataFrame(
        [("u", bytearray(HTML.encode())),
         ("bad", bytearray(bytes([0xFF, 0x91])))],
        "url string, html binary",
    )
    rows = select_nodes(df, "div.content > p").collect()
    ok = sorted((r.url, r.text) for r in rows if r.error is None)
    assert ok == [("u", "one"), ("u", "two")]
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].url == "bad" and errs[0].node_id is None


def test_select_counts_single_pass(spark):
    from html5ever_elixir_spark.operators.select import select_counts

    df = spark.createDataFrame([("u", HTML)], "url string, html string")
    out = select_counts(
        df, {"n_p": "p", "n_links": "a[href]", "n_miss": "#zz"}
    ).collect()[0]
    assert (out.n_p, out.n_links, out.n_miss) == (2, 2, 0)
    # one narrow Arrow stage, no shuffle
    plan = (
        select_counts(df, {"n": "p"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    with pytest.raises(SelectorError):
        select_counts(df, {"bad": "div >"})  # driver-side validation
