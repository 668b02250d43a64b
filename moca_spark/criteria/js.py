"""R8 — JavaScript link-generator criteria, executed.

The reference's ``JavaScriptCriteria`` (criteria/JavaScriptCriteria.scala:15-21)
defines the contract this module implements:

    obj    = page.exec(script)                  # any JS value
    length = Try(obj.length).getOrElse(0)       # non-array-like -> 0
    links  = { url.resolveOption(str(obj[i]))   # rendered-page URL
               for i in 0 until length }        # unresolvable dropped
                                                # result is a SET

In the reference, ``page.exec`` itself is DISABLED — it throws
``JavascriptNotSupportedException("JS disabled because bugs on
javafx-webkit are causing the jvm to break")``
(browser/webkit/BrowserWindow.scala:92-93) — so StringJSCriteria parses
and composes but can never run. This rebuild ships three layers:

1. the full ``select`` contract above (``js_select``): length probe,
   per-slot stringify, resolve-against-rendered-URL with unresolvable
   slots dropped, set semantics (document order kept for determinism —
   a deterministic iteration order of the reference's unordered Set);
2. an EXECUTOR seam (U5 constructor-injection style): a registry of
   named ``(script, html, url) -> array-like`` callables. The
   ``"disabled"`` executor is reference-parity: it raises
   ``JavascriptNotSupportedException`` with the reference's message;
3. a real default executor, ``"mini"`` — a deterministic evaluator for
   the practical link-extraction subset of JS (no general JS engine is
   available in-sandbox, and shelling to a browser is exactly what the
   reference had to disable). Supported script forms:

     - an array literal of strings:      ``['a.html', '/b', ...]``
     - ``document.links``                (all <a href> / <area href>)
     - ``document.querySelectorAll(S)``  (anchors stringify to their
       href, like HTMLAnchorElement.toString(); other elements
       stringify to '[object HTMLElement]' and resolve to nothing)
     - ``[...document.querySelectorAll(S)].map(x => x.ATTR)``,
       ``Array.from(document.querySelectorAll(S)).map(x => x.ATTR)``,
       ``Array.prototype.map.call(document.querySelectorAll(S),
       x => x.ATTR)`` and the ``x => x.getAttribute('ATTR')`` variants
     - selector subset ``S``: comma-separated simple selectors
       ``tag``, ``.class``, ``#id``, ``[attr]``, ``[attr=v]``,
       ``[attr^=v]``, ``[attr$=v]`` and conjunctions thereof
       (``a.ext[href]``); no combinators.

   Anything outside the subset raises ``UnsupportedScriptError`` —
   eager and loud, like the DSL parser's unknown-rule handling.

Spark side: ``make_js_links_udf(script)`` wraps ``js_select`` as an
Arrow-batched pandas UDF (html, base_url) -> array<string>, the ``js``
twin of functions/html.py's ``extract_links_udf`` (the ``a-href``
generator); ``links_generator(spec)`` dispatches on
``CriteriaSpec.generator`` so the engine's real-HTML path picks the
generator exactly where the reference's decorator chain bottoms out.
"""

from __future__ import annotations

import ast
import re
from collections.abc import Callable
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from moca_spark.functions.urls import resolve_str


class JavascriptNotSupportedException(RuntimeError):
    """Reference-parity executor failure (BrowserWindow.scala:92)."""


class UnsupportedScriptError(ValueError):
    """The 'mini' executor met a script outside its documented subset."""


# ---------------------------------------------------------------- DOM


class _Element:
    """(tag, attrs) in document order — the slice of DOM the selector
    subset needs. Anchors/areas stringify to their RAW href (resolution
    happens in js_select, per the reference contract: resolveOption of
    slot.toString against the rendered URL)."""

    __slots__ = ("tag", "attrs")

    def __init__(self, tag: str, attrs: dict[str, str]) -> None:
        self.tag = tag
        self.attrs = attrs

    def __str__(self) -> str:
        if self.tag in ("a", "area") and self.attrs.get("href"):
            return self.attrs["href"]
        return "[object HTMLElement]"


class _DomParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.elements: list[_Element] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        self.elements.append(
            _Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        )

    handle_startendtag = handle_starttag


def _parse_dom(html: str | None) -> list[_Element]:
    p = _DomParser()
    try:
        p.feed(html or "")
    except Exception:
        return []
    return p.elements


# ---------------------------------------------------- selector subset

_SEL_PART = re.compile(
    r"([a-zA-Z][\w-]*|\*)?"                        # tag
    r"((?:[.#][\w-]+|\[[\w-]+(?:[\^$]?=[^\]]*)?\])*)"  # qualifiers
    r"$"
)
_QUAL = re.compile(r"[.#][\w-]+|\[[\w-]+(?:[\^$]?=[^\]]*)?\]")


def _compile_simple(sel: str) -> Callable[[_Element], bool]:
    sel = sel.strip()
    m = _SEL_PART.match(sel)
    if not m or not sel:
        raise UnsupportedScriptError(f"unsupported selector: {sel!r}")
    tag = (m.group(1) or "*").lower()
    quals = _QUAL.findall(m.group(2) or "")
    checks: list[Callable[[_Element], bool]] = []
    if tag != "*":
        checks.append(lambda e, t=tag: e.tag == t)
    for q in quals:
        if q.startswith("."):
            cls = q[1:]
            checks.append(
                lambda e, c=cls: c in (e.attrs.get("class") or "").split()
            )
        elif q.startswith("#"):
            checks.append(lambda e, i=q[1:]: e.attrs.get("id") == i)
        else:  # [attr], [attr=v], [attr^=v], [attr$=v]
            body = q[1:-1]
            if "^=" in body:
                a, v = body.split("^=", 1)
                v = v.strip("'\"")
                checks.append(
                    lambda e, a=a, v=v: (e.attrs.get(a) or "").startswith(v)
                    if a in e.attrs else False
                )
            elif "$=" in body:
                a, v = body.split("$=", 1)
                v = v.strip("'\"")
                checks.append(
                    lambda e, a=a, v=v: (e.attrs.get(a) or "").endswith(v)
                    if a in e.attrs else False
                )
            elif "=" in body:
                a, v = body.split("=", 1)
                checks.append(
                    lambda e, a=a, v=v.strip("'\""): e.attrs.get(a) == v
                )
            else:
                checks.append(lambda e, a=body: a in e.attrs)
    return lambda e: all(c(e) for c in checks)


def query_selector_all(dom: list[_Element], selector: str) -> list[_Element]:
    """Comma-separated simple selectors, document order, no dup rows
    (an element matching two groups appears once — browser behavior)."""
    preds = [_compile_simple(s) for s in selector.split(",")]
    return [e for e in dom if any(p(e) for p in preds)]


# ------------------------------------------------------ mini executor

_QSA = r"document\.querySelectorAll\(\s*(?P<q>['\"])(?P<sel>.*?)(?P=q)\s*\)"
_ARROW = (r"(?P<var>\w+)\s*=>\s*(?P=var)\.(?:(?P<attr>[\w-]+)"
          r"|getAttribute\(\s*(?P<gq>['\"])(?P<gattr>[\w-]+)(?P=gq)\s*\))")
_FORMS = [
    re.compile(r"^\[\s*\.\.\.\s*" + _QSA + r"\s*\]\s*\.map\(\s*"
               + _ARROW + r"\s*\)$"),
    re.compile(r"^Array\.from\(\s*" + _QSA + r"\s*\)\s*\.map\(\s*"
               + _ARROW + r"\s*\)$"),
    re.compile(r"^Array\.prototype\.map\.call\(\s*" + _QSA + r"\s*,\s*"
               + _ARROW + r"\s*\)$"),
]
_QSA_ONLY = re.compile("^" + _QSA + "$")


def mini_exec(script: str, html: str | None, url: str | None) -> object:
    """Evaluate the documented JS subset; returns the array-like the
    contract layer consumes. Deterministic, no IO, no state."""
    s = (script or "").strip()
    if s.startswith("return "):
        s = s[len("return "):].strip()
    s = s.rstrip(";").strip()
    if not s:
        return []
    if s.startswith("["):  # array literal (JS string arrays are valid
        try:               # Python literals: '...'/"..." quoting only)
            val = ast.literal_eval(s)
            if isinstance(val, (list, tuple)):
                return [str(v) for v in val]
        except (ValueError, SyntaxError):
            pass  # not a literal — fall through to the spread form
    if s == "document.links":
        return [e for e in _parse_dom(html)
                if e.tag in ("a", "area") and e.attrs.get("href")]
    m = _QSA_ONLY.match(s)
    if m:
        return query_selector_all(_parse_dom(html), m.group("sel"))
    for form in _FORMS:
        m = form.match(s)
        if m:
            attr = m.group("attr") or m.group("gattr")
            els = query_selector_all(_parse_dom(html), m.group("sel"))
            return [e.attrs.get(attr) for e in els]
    raise UnsupportedScriptError(
        f"script outside the mini-executor subset: {script!r}"
    )


def disabled_exec(script: str, html: str | None, url: str | None) -> object:
    """Reference-parity executor (BrowserWindow.scala:92-93)."""
    raise JavascriptNotSupportedException(
        "JS disabled because bugs on javafx-webkit are causing the jvm "
        "to break"
    )


_JS_EXECUTORS: dict[str, Callable[[str, str | None, str | None], object]] = {
    "mini": mini_exec,
    "disabled": disabled_exec,
}
DEFAULT_JS_EXECUTOR = "mini"


def register_js_executor(
    name: str, fn: Callable[[str, str | None, str | None], object]
) -> None:
    """Inject a real JS engine (U5 seam): ``fn(script, html, url)``
    returns any array-like; the contract layer does the rest."""
    _JS_EXECUTORS[name] = fn


# ----------------------------------------------------- contract layer


def js_select(
    script: str,
    html: str | None,
    rendered_url: str | None,
    executor: str = DEFAULT_JS_EXECUTOR,
) -> list[str]:
    """The reference's ``JavaScriptCriteria.select`` body
    (JavaScriptCriteria.scala:15-21): exec -> length (0 when the result
    has none) -> stringify slots -> resolveOption against the rendered
    URL, dropping failures -> set (document-order-deterministic)."""
    obj = _JS_EXECUTORS[executor](script, html, rendered_url)
    try:
        length = int(len(obj))  # Try(obj.length).getOrElse(0)
    except TypeError:
        length = 0
    seen: set[str] = set()
    out: list[str] = []
    for i in range(length):
        try:
            slot = obj[i]
        except (TypeError, KeyError, IndexError):
            # a sized but non-indexable executor result (set, dict,
            # generator with __len__) degrades to skipped slots, like
            # the reference's Try-wrapped probe — never a failed stage
            # (round-5 advice)
            continue
        if slot is None:
            continue
        u = resolve_str(rendered_url or "", str(slot))
        if u is not None and u not in seen:
            seen.add(u)
            out.append(u)
    return out


def make_js_links_udf(
    script: str, executor: str = DEFAULT_JS_EXECUTOR
) -> Callable[..., Column]:
    """Arrow-batched (html, base_url) -> array<string> generator UDF —
    the ``js`` twin of extract_links_udf. The script/executor pair is
    captured per-criteria (one UDF per spec, like one decorator chain
    per criteria in the reference)."""

    @pandas_udf(ArrayType(StringType()))
    def js_links(html: pd.Series, base_url: pd.Series) -> pd.Series:
        return pd.Series(
            [js_select(script, h, b, executor)
             for h, b in zip(html, base_url)]
        )

    return js_links


def links_generator(spec) -> Callable[[Column, Column], Column]:
    """Generator dispatch for the real-HTML path: returns a
    ``(html_col, url_col) -> array<string>`` column function per
    ``CriteriaSpec.generator`` — where the reference's decorator chain
    bottoms out (AHrefCriteria / StringJSCriteria)."""
    if spec.generator == "js":
        udf = make_js_links_udf(spec.js_script or "")
        return lambda html, url: udf(html, url)
    from moca_spark.functions.html import extract_links_udf

    return lambda html, url: extract_links_udf(html, url)


__all__ = [
    "JavascriptNotSupportedException",
    "UnsupportedScriptError",
    "js_select",
    "mini_exec",
    "disabled_exec",
    "register_js_executor",
    "make_js_links_udf",
    "links_generator",
    "query_selector_all",
    "DEFAULT_JS_EXECUTOR",
]
