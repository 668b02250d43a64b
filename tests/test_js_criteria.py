"""R8 — JavaScript criteria execution (criteria/js.py).

Ports the contract of JavaScriptCriteria.scala:15-21 (exec -> length ->
stringify slots -> resolveOption against the rendered URL -> set) and
pins the reference-parity 'disabled' executor
(BrowserWindow.scala:92-93)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moca_spark.criteria.dsl import parse_criteria
from moca_spark.criteria.js import (
    JavascriptNotSupportedException,
    UnsupportedScriptError,
    js_select,
    links_generator,
    make_js_links_udf,
    mini_exec,
    query_selector_all,
)

HTML = """
<html><body>
  <a href="/a.html" class="nav ext">A</a>
  <a href="b.html">B</a>
  <a name="anchor-without-href">C</a>
  <a href="/a.html">dup</a>
  <area href="/map.html">
  <img src="/i.png">
  <a href="mailto:x@y.z">mail</a>
  <a href="#frag">frag-only</a>
  <div id="main"><a href="/in-div.html" data-x="1">D</a></div>
</body></html>
"""
BASE = "http://example.com/dir/page.html"


# ---------------------------------------------------- contract layer


def test_array_literal_resolved_against_rendered_url():
    out = js_select("['x.html', '/abs.html', 'http://other.com/q']",
                    HTML, BASE)
    assert out == ["http://example.com/dir/x.html",
                   "http://example.com/abs.html",
                   "http://other.com/q"]


def test_return_prefix_and_trailing_semicolon():
    assert js_select("return ['x.html'];", HTML, BASE) == [
        "http://example.com/dir/x.html"]


def test_set_semantics_dedup_and_unresolvable_dropped():
    # duplicate resolution collapses; mailto/empty resolve to None
    out = js_select("['x.html', './x.html', 'mailto:a@b.c']", HTML, BASE)
    assert out == ["http://example.com/dir/x.html"]


def test_non_array_like_means_length_zero():
    # Try(obj.length).getOrElse(0): a scalar result yields no links
    assert js_select("[]", HTML, BASE) == []
    assert js_select("", HTML, BASE) == []


def test_document_links_resolves_a_and_area():
    out = js_select("document.links", HTML, BASE)
    assert out == [
        "http://example.com/a.html",
        "http://example.com/dir/b.html",
        "http://example.com/map.html",
        # mailto dropped; '#frag' resolves to the page itself
        "http://example.com/dir/page.html",
        "http://example.com/in-div.html",
    ]


def test_qsa_anchor_tostring_is_href_other_elements_opaque():
    # HTMLAnchorElement.toString() == href. A non-anchor slot
    # stringifies to '[object HTMLElement]' and — faithful to the
    # reference, whose galimatias WHATWG resolve percent-encodes and
    # accepts it (Url.scala:34-39) — resolves to a junk-but-valid URL
    # rather than being dropped.
    assert js_select("document.querySelectorAll('img')", HTML, BASE) == [
        "http://example.com/dir/%5Bobject%20HTMLElement%5D"]
    assert js_select("document.querySelectorAll('a.ext')", HTML, BASE) == [
        "http://example.com/a.html"]


def test_map_forms_and_getattribute():
    spread = js_select(
        "[...document.querySelectorAll('a[href]')].map(a => a.href)",
        HTML, BASE)
    arr_from = js_select(
        "Array.from(document.querySelectorAll('a[href]')).map("
        "a => a.getAttribute('href'))", HTML, BASE)
    proto = js_select(
        "Array.prototype.map.call(document.querySelectorAll('a[href]'), "
        "x => x.href)", HTML, BASE)
    assert spread == arr_from == proto
    assert "http://example.com/dir/b.html" in spread


def test_img_src_via_map():
    assert js_select(
        "[...document.querySelectorAll('img[src]')].map(i => i.src)",
        HTML, BASE) == ["http://example.com/i.png"]


def test_selector_subset():
    from moca_spark.criteria.js import _parse_dom

    dom_sel = lambda s: [str(e)  # noqa: E731
                         for e in query_selector_all(_parse_dom(HTML), s)]
    assert dom_sel("a.nav") == ["/a.html"]
    assert dom_sel("#main") == ["[object HTMLElement]"]
    assert dom_sel("a[data-x=1]") == ["/in-div.html"]
    assert dom_sel("a[href^='/a']") == ["/a.html", "/a.html"]
    assert dom_sel("a[href$='.png'], img[src$='.png']") == [
        "[object HTMLElement]"]
    assert dom_sel("area, a.ext") == ["/a.html", "/map.html"]


def test_unsupported_script_and_selector_raise():
    with pytest.raises(UnsupportedScriptError):
        mini_exec("window.alert(1)", HTML, BASE)
    with pytest.raises(UnsupportedScriptError):
        mini_exec("document.querySelectorAll('div > a')", HTML, BASE)


def test_disabled_executor_reference_parity():
    with pytest.raises(JavascriptNotSupportedException) as e:
        js_select("['x']", HTML, BASE, executor="disabled")
    assert "javafx-webkit" in str(e.value)  # BrowserWindow.scala:92


# ------------------------------------------------------- spark side


def test_js_links_udf_and_generator_dispatch(spark):
    specs = parse_criteria([
        "!& jsy",
        "!= same-host",
        "!= js [...document.querySelectorAll('a[href]')].map(a => a.href)",
        "!& plain",
        "!= a-href",
    ])
    assert specs["jsy"].generator == "js"
    df = spark.createDataFrame(
        [(HTML, BASE), (None, BASE), ("<a href='/only.html'>x</a>", None)],
        "html string, base string",
    )
    gen = links_generator(specs["jsy"])
    rows = (df.select(gen(F.col("html"), F.col("base")).alias("links"))
            .collect())
    assert rows[0].links[0] == "http://example.com/a.html"
    assert rows[1].links == [] and rows[2].links == []
    # a-href dispatch returns the R1 extractor over the same frame
    gen2 = links_generator(specs["plain"])
    rows2 = (df.select(gen2(F.col("html"), F.col("base")).alias("links"))
             .collect())
    assert "http://example.com/a.html" in rows2[0].links


def test_udf_factory_captures_script(spark):
    udf = make_js_links_udf("['/u1', '/u2']")
    df = spark.range(1).select(F.lit(HTML).alias("h"),
                               F.lit(BASE).alias("b"))
    out = df.select(udf(F.col("h"), F.col("b")).alias("l")).collect()
    assert out[0].l == ["http://example.com/u1", "http://example.com/u2"]
