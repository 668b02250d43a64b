"""Criteria compilation: specs -> DataFrame filter stages.

The reference composes criteria as a decorator chain of Scala objects
evaluated per page (criteria/*.scala; interface
LinkSelectionCriteria.scala:8-12). Here the whole chain compiles to
column predicates + one broadcast anti-join, evaluated by Catalyst over
the entire wave of candidate links at once:

- R2 max-depth   — applied in the ENGINE before expansion (the
  reference gates expansion of the parent, MaxDepthCriteria.scala:10-12,
  NOT admission of the child — see SURVEY §7.3 semantics trap).
- R3 same-host   (SameHostCriteria.scala:10-17)
- R4 same-domain (SameDomainCriteria.scala:10-17)
- R6 robots-txt  (RobotsTxtCriteria.scala:20-23) — broadcast anti-join
  against per-host disallow prefixes (prefix-rule semantics of
  crawler-commons SimpleRobotRules).
- R7 social blacklist (criteria/filter/SocialMediaFilter.scala:11-21) —
  shipped as a registered custom filter, like the reference.
- R5 custom filters (FilteredCriteria.scala:10-17) — named Python
  callables ``DataFrame -> DataFrame`` in a registry (no reflection).

Candidates arrive with per-run criteria params already joined as
columns (same_host/same_domain/robots_txt/criteria_name), so one pass
filters a mixed-criteria wave; only custom filters need a per-spec
slice (driver-side loop over the handful of distinct specs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FILTER_REGISTRY: dict[str, Callable[[DataFrame], DataFrame]] = {}


def register_filter(name: str, fn: Callable[[DataFrame], DataFrame]) -> None:
    """Register a custom criteria filter (U2; reference loads these by
    class name via reflection, CriteriaParser.scala:20-21)."""
    _FILTER_REGISTRY[name] = fn


def social_media_filter(df: DataFrame) -> DataFrame:
    """criteria/filter/SocialMediaFilter.scala:11-21."""
    return df.filter(~F.col("dst_domain").isin("facebook.com", "twitter.com"))


register_filter("social-media", social_media_filter)


def _url_path(url_col: str) -> F.Column:
    """Path+query portion used for robots prefix matching."""
    return F.concat(
        F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")),
        F.coalesce(
            F.concat(F.lit("?"), F.parse_url(F.col(url_col), F.lit("QUERY"))),
            F.lit(""),
        ),
    )


def apply_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates whose dst path matches a disallow prefix for its
    host — only for rows whose criteria has robots_txt on. The robots
    table is small (per-host rules, reference LRU-cached 1024 of them,
    RobotsTxtCriteria.scala:28) → broadcast anti-join, no shuffle."""
    r = F.broadcast(robots.select(
        F.col("host").alias("r_host"), F.col("disallow_prefix").alias("r_prefix")
    ))
    cond = (
        F.col("robots_txt")
        & (F.col("dst_host") == F.col("r_host"))
        & _url_path("dst_url").startswith(F.col("r_prefix"))
    )
    return candidates.join(r, on=cond, how="left_anti")


def apply_criteria(
    candidates: DataFrame,
    robots: DataFrame | None = None,
    custom_by_name: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Apply the full filter chain to a wave of candidate links.

    ``candidates`` columns: run_id, criteria_name, same_host,
    same_domain, robots_txt, src_url, src_host, src_domain, depth,
    dst_url, dst_host, dst_domain.
    """
    out = candidates.filter(
        (~F.col("same_host") | (F.col("dst_host") == F.col("src_host")))
        & (~F.col("same_domain") | (F.col("dst_domain") == F.col("src_domain")))
    )
    if robots is not None:
        out = apply_robots(out, robots)
    for name, filters in (custom_by_name or {}).items():
        if not filters:
            continue
        slice_df = out.filter(F.col("criteria_name") == name)
        rest = out.filter(F.col("criteria_name") != name)
        for fname in filters:
            slice_df = _FILTER_REGISTRY[fname](slice_df)
        out = rest.unionByName(slice_df)
    return out
