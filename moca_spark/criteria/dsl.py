"""Seed-file + criteria DSL parser.

Reimplements the reference's input format (config/SeedInputParser.scala:22-32,
config/CriteriaParser.scala:29-67, README.md:87-131):

- seed lines ``url|id|criteria-name`` — id defaults to the SHA-1 of the
  canonical URL; name defaults to the ``default`` block;
- criteria blocks: ``!& name`` header followed by ``!=`` rules, folded
  BOTTOM-UP — the last rule is the link generator (``a-href``), the
  rules above it are filters wrapping it;
- system default (no ``default`` block) = ``MaxDepthCriteria(AHrefCriteria, 2)``
  (criteria/LinkSelectionCriteria.scala:16).

The parse result is a declarative ``CriteriaSpec`` (not a decorator
chain): the Spark engine compiles specs into DataFrame filter stages
(criteria/stages.py), so criteria composition happens in Catalyst, not
in Python objects.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from moca_spark.functions.urls import canonicalize_str

SYSTEM_DEFAULT_MAX_DEPTH = 2  # LinkSelectionCriteria.scala:16


@dataclass(frozen=True)
class CriteriaSpec:
    """Declarative criteria: what the decorator chain of the reference
    computes, as data. ``generator`` is the innermost rule; everything
    else is a filter applied to generated candidate links."""

    name: str = "default"
    generator: str = "a-href"  # a-href | js (js is a documented gap, R8)
    max_depth: int | None = SYSTEM_DEFAULT_MAX_DEPTH
    same_host: bool = False
    same_domain: bool = False
    robots_txt: bool = False
    custom_filters: tuple[str, ...] = ()  # registered filter names (U2)
    js_script: str | None = None

    def as_row(self) -> dict:
        """Flat row for the broadcastable per-run criteria table."""
        return {
            "criteria_name": self.name,
            "max_depth": -1 if self.max_depth is None else self.max_depth,
            "same_host": self.same_host,
            "same_domain": self.same_domain,
            "robots_txt": self.robots_txt,
        }


@dataclass(frozen=True)
class Work:
    """One seed + criteria: the user input unit (role/Work.scala:6)."""

    work_id: str
    seed_url: str
    criteria: CriteriaSpec = field(default_factory=CriteriaSpec)


_KNOWN_RULES = {"a-href", "js", "max-depth", "filter", "same-host",
                "same-domain", "robots-txt"}


def parse_criteria(lines: list[str]) -> dict[str, CriteriaSpec]:
    """Parse ``!&``/``!=`` blocks into named specs (CriteriaParser.scala:29-67).

    Grouping mirrors the reference: a ``!&`` line starts a block; ``!=``
    lines extend it; anything else closes it. Folding is bottom-up: the
    LAST ``!=`` line is the generator, earlier lines wrap as filters.
    """
    groups: list[list[str]] = []
    current: list[str] = []
    for raw in lines:
        line = raw.strip()
        head = line[:2]
        if head == "!&":
            if current:
                groups.append(current)
            current = [line]
        elif head == "!=" and current:
            current.append(line)
        elif current:
            groups.append(current)
            current = []
    if current:
        groups.append(current)

    out: dict[str, CriteriaSpec] = {}
    for group in groups:
        name = group[0][2:].strip()
        rules = [g[2:].strip() for g in group[1:]]
        spec = {"name": name, "max_depth": None, "same_host": False,
                "same_domain": False, "robots_txt": False,
                "custom_filters": (), "generator": "a-href",
                "js_script": None}
        # bottom-up: last rule is the generator
        for i, rule in enumerate(reversed(rules)):
            parts = rule.split(None, 1)
            kind = parts[0]
            arg = parts[1] if len(parts) > 1 else ""
            if kind not in _KNOWN_RULES:
                raise ValueError(f"unknown criteria rule: {kind}")
            if i == 0:  # generator position
                if kind == "a-href":
                    spec["generator"] = "a-href"
                elif kind == "js":
                    spec["generator"] = "js"
                    spec["js_script"] = arg
                else:
                    # reference would fold with current=null and NPE on
                    # use; we reject eagerly instead.
                    raise ValueError(
                        f"innermost rule of '{name}' must be a generator "
                        f"(a-href/js), got {kind}"
                    )
            elif kind == "max-depth":
                spec["max_depth"] = int(arg)
            elif kind == "same-host":
                spec["same_host"] = True
            elif kind == "same-domain":
                spec["same_domain"] = True
            elif kind == "robots-txt":
                spec["robots_txt"] = True
            elif kind == "filter":
                spec["custom_filters"] = spec["custom_filters"] + (arg,)
            else:
                raise ValueError(f"generator rule {kind} in filter position")
        out[name] = CriteriaSpec(**spec)
    return out


def parse_seed_lines(lines: list[str]) -> list[Work]:
    """Parse a full seed file (SeedInputParser.scala:22-32): split into
    criteria lines (``!``-prefixed) and seed lines; canonicalize seeds;
    id defaults to SHA-1 of the canonical URL."""
    stripped = [ln.strip() for ln in lines if ln.strip()]
    criteria_lines = [ln for ln in stripped if ln.startswith("!")]
    seed_lines = [ln for ln in stripped if not ln.startswith("!")]
    named = parse_criteria(criteria_lines)
    default = named.get("default", CriteriaSpec())

    works: list[Work] = []
    for line in seed_lines:
        parts = [p.strip() for p in line.split("|")]
        parts += [""] * (3 - len(parts))
        url_raw, wid, cname = parts[:3]
        url = canonicalize_str(url_raw)
        if url is None:
            raise ValueError(f"invalid seed url: {url_raw!r}")
        work_id = wid or hashlib.sha1(url.encode()).hexdigest()
        works.append(Work(work_id, url, named.get(cname, default) if cname else default))
    return works
