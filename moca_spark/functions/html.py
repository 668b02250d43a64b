"""HTML link extraction (R1) — the AHref generator.

The reference jsoup-parses the rendered page and selects
``a[abs:href]`` (criteria/AHrefCriteria.scala:16-21), resolving each
href against the rendered URL (url/Url.scala:34-39). The sandbox corpus
carries a links *table* instead of raw HTML (FIXTURES.md §2), so the
engine joins; this module provides the real extraction path for
HTML-bytes inputs: a vectorized pandas UDF using ``html.parser`` (no
external deps) + ``urljoin`` + the canonicalizer. Swap the links-table
join for ``explode(extract_links(html, base_url))`` and the engine is a
real-page crawler.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from moca_spark.functions.urls import canonicalize_str, resolve_str


class _AHrefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v.strip())


def extract_links_py(html: str | None, base_url: str | None) -> list[str]:
    """All <a href> targets, resolved against base, canonicalized,
    de-duplicated preserving document order (InsertionOrderedSet-like)."""
    if not html or not base_url:
        return []
    p = _AHrefParser()
    try:
        p.feed(html)
    except Exception:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for href in p.hrefs:
        u = resolve_str(base_url, href) if not href.startswith(
            ("http://", "https://")
        ) else canonicalize_str(href)
        if u and u not in seen:
            seen.add(u)
            out.append(u)
    return out


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links_py(h, b) for h, b in zip(html, base_url)]
    )
