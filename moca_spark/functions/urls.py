"""URL kernel: canonicalize / identity / host / domain.

Reimplements the normalization + identity semantics of the reference's
``Url`` value class (url/Url.scala:68-83, validated by UrlTest.scala:5-70)
as Spark-native column functions:

- ``canonicalize_str``  — pure-Python WHATWG-style normalizer (the spec).
- ``canonicalize_udf``  — Arrow-batched pandas UDF over it, with a
  vectorized regex fast-path: URLs that are already canonical (the vast
  majority in steady-state crawling) are detected with pandas str ops
  and skip Python-per-value work entirely.
- ``url_host`` / ``url_domain`` — host via built-in ``parse_url``
  (JVM-side, codegen) on the already-canonical URL; eTLD+1 domain via a
  pandas UDF over the PSL (functions/psl.py) since no built-in knows
  the public-suffix list.
- ``with_url_columns``  — the standard projection used by every stage:
  url (canonical), url_hash (xxhash64 — deliberately 64-bit where the
  reference used 32-bit String.hashCode, url/Url.scala:44-45, which
  would collide at the 10^10-URL target scale), host, domain.

Normalization rules (Url.scala:68-83 via galimatias/WHATWG):
  1. truncate at the first ``#`` (fragment strip);
  2. lowercase scheme and host; drop default ports (:80/:443);
     resolve ``.``/``..`` path segments; empty path becomes ``/``;
     an empty query is KEPT as a trailing ``?`` (UrlTest "remove
     trailing ?" pins this);
  3. scheme whitelist http/https — anything else is invalid (None).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urljoin, urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from moca_spark.functions.psl import effective_domain

_DEFAULT_PORTS = {"http": 80, "https": 443}

# Already-canonical fast path: lowercase scheme+host, no default port
# spelled out, non-empty path with no dot segments, no fragment, no
# characters needing percent-encoding.
_CANONICAL_RE = re.compile(
    r"^https?://"
    r"[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?"  # lowercase reg-name host
    r"(?::(?!80(?:/|$|\?)|443(?:/|$|\?))\d+)?"  # explicit non-default port
    r"/(?:(?!\.{1,2}(?:/|$))[a-z0-9\-._~%!$&'()*+,;=:@/]*)*"  # path, no ./..
    r"(?:\?[a-z0-9\-._~%!$&'()*+,;=:@/?]*)?$"
)
_DOT_SEG_RE = re.compile(r"/\.{1,2}(?:/|$)")


def canonicalize_str(url: str | None) -> str | None:
    """Normalize one URL per the reference semantics; None if invalid."""
    if url is None:
        return None
    url = url.strip()
    # 1. fragment strip (Url.scala:70-73)
    h = url.find("#")
    if h != -1:
        url = url[:h]
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    # 3. scheme whitelist (Url.scala:74-77)
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        userinfo += "@"
    path = _normalize_path(parts.path)
    path = quote(path, safe="-._~%!$&'()*+,;=:@/")
    out = f"{scheme}://{userinfo}{netloc}{path}"
    # WHATWG: empty query is preserved as a bare '?' (UrlTest trailing-?)
    if parts.query or url.endswith("?"):
        out += "?" + quote(parts.query, safe="-._~%!$&'()*+,;=:@/?")
    return out


def _normalize_path(path: str) -> str:
    """Resolve ``.``/``..`` segments; empty path becomes ``/``."""
    if not path:
        return "/"
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if path.rstrip("/").endswith((".", "..")) and not norm.endswith("/"):
        norm += "/"
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def resolve_str(base: str, rel: str) -> str | None:
    """Resolve ``rel`` against canonical ``base`` (Url.scala:34-39)."""
    return canonicalize_str(urljoin(base, rel))


def _canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized batch canonicalizer: regex fast path + slow fallback."""
    s = s.astype("object")
    fast = s.str.match(_CANONICAL_RE, na=False) & ~s.str.contains(
        _DOT_SEG_RE, na=True, regex=True
    )
    out = s.where(fast, None)
    slow_idx = s.index[~fast & s.notna()]
    if len(slow_idx):
        out.loc[slow_idx] = [canonicalize_str(v) for v in s.loc[slow_idx]]
    return out


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return _canonicalize_series(urls)


@pandas_udf(StringType())
def domain_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(lambda h: effective_domain(h) if h else None)


def url_host(url: Column) -> Column:
    """Host of an already-canonical URL — JVM-side (Url.scala:22-23)."""
    return F.parse_url(url, F.lit("HOST"))


def url_domain(host: Column) -> Column:
    """eTLD+1 of a host (Url.scala:25-26) — needs the PSL, so pandas UDF."""
    return domain_udf(host)


def url_sha1(url: Column) -> Column:
    """SHA-1 hex id of the canonical URL (Url.scala:16-20)."""
    return F.sha1(F.encode(url, "UTF-8"))


def url_key(url: Column) -> Column:
    """64-bit dedup key. The reference used 32-bit String.hashCode
    (Url.scala:44-45); at the 10^10-URL north-star scale a 32-bit key
    collides with probability ~1, so we widen to xxhash64 (JVM-side,
    whole-stage codegen) and document the divergence."""
    return F.xxhash64(url)


def with_url_columns(
    df: DataFrame, url_col: str = "url", canonical: bool = False
) -> DataFrame:
    """Standard URL projection: canonical url, url_hash, host, domain.

    ``canonical=True`` skips re-normalization for columns already
    produced by this kernel (host/hash/domain are cheap projections).
    """
    out = df
    if not canonical:
        out = out.withColumn(url_col, canonicalize_udf(F.col(url_col)))
        out = out.filter(F.col(url_col).isNotNull())
    out = out.withColumn("url_hash", url_key(F.col(url_col)))
    out = out.withColumn("host", url_host(F.col(url_col)))
    out = out.withColumn("domain", url_domain(F.col("host")))
    return out
