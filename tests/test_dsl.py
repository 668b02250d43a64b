"""Seed-file + criteria DSL tests — ports SeedInputParserTest.scala:10-44
and CriteriaParserTest.scala:12-51."""

from __future__ import annotations

import hashlib

import pytest

from moca_spark.criteria.dsl import (
    SYSTEM_DEFAULT_MAX_DEPTH,
    CriteriaSpec,
    parse_criteria,
    parse_seed_lines,
)


def test_parse_input_file():  # SeedInputParserTest.scala:10-44
    lines = """
        !& custom-criteria
        != a-href

        http://www.example.com|1|custom-criteria
        http://www.w3c.com|2
        http://www.iana.org/||custom-criteria
        https://www.wikipedia.org/
    """.splitlines()
    works = parse_seed_lines(lines)
    assert len(works) == 4
    w1, w2, w3, w4 = works
    assert w1.work_id == "1"
    assert w2.work_id == "2"
    assert w3.work_id == hashlib.sha1(b"http://www.iana.org/").hexdigest()
    assert w4.work_id == hashlib.sha1(b"https://www.wikipedia.org/").hexdigest()
    assert w1.seed_url == "http://www.example.com/"  # canonical
    assert w3.seed_url == "http://www.iana.org/"
    custom = CriteriaSpec(name="custom-criteria", max_depth=None)
    assert w1.criteria == custom
    assert w3.criteria == custom
    # unnamed seeds get the system default (no `default` block here)
    assert w2.criteria == CriteriaSpec()
    assert w2.criteria.max_depth == SYSTEM_DEFAULT_MAX_DEPTH  # == 2
    assert w4.criteria == CriteriaSpec()


def test_construct_criteria_from_lines():  # CriteriaParserTest.scala:12-40
    parsed = parse_criteria(
        """
        !& criteria-1
        != filter my-fake-filter
        != max-depth 5
        != a-href
        !& criteria-2
        != max-depth 3
        != js console.log('hello world!');

        !& criteria-3
        != a-href
        """.splitlines()
    )
    assert set(parsed) == {"criteria-1", "criteria-2", "criteria-3"}
    c1 = parsed["criteria-1"]
    assert c1.max_depth == 5
    assert c1.custom_filters == ("my-fake-filter",)
    assert c1.generator == "a-href"
    c2 = parsed["criteria-2"]
    assert c2.max_depth == 3
    assert c2.generator == "js"
    assert c2.js_script == "console.log('hello world!');"
    c3 = parsed["criteria-3"]
    assert c3 == CriteriaSpec(name="criteria-3", max_depth=None)


def test_default_block():  # CriteriaParserTest.scala:42-51
    parsed = parse_criteria(
        """
        !& default
        != max-depth 7
        != js test();
        """.splitlines()
    )
    d = parsed["default"]
    assert d.max_depth == 7
    assert d.generator == "js"
    assert d.js_script == "test();"
    # seeds without a name pick it up
    works = parse_seed_lines(
        ["!& default", "!= max-depth 7", "!= a-href", "http://x.test/"]
    )
    assert works[0].criteria.max_depth == 7


def test_fixture_file_format():  # FIXTURES.md §4
    works = parse_seed_lines(
        """
        !& default
        != max-depth 3
        != robots-txt
        != same-domain
        != a-href

        http://site0.test:8000|1
        http://site1.test/|s1|custom
        """.splitlines()
    )
    assert len(works) == 2
    w1, w2 = works
    assert w1.work_id == "1"
    assert w1.seed_url == "http://site0.test:8000/"
    assert w1.criteria.max_depth == 3
    assert w1.criteria.robots_txt and w1.criteria.same_domain
    # 'custom' name not defined -> falls back to default block
    assert w2.criteria == w1.criteria


def test_filter_in_generator_position_rejected():
    with pytest.raises(ValueError):
        parse_criteria(["!& bad", "!= max-depth 2"])


def test_invalid_seed_rejected():
    with pytest.raises(ValueError):
        parse_seed_lines(["ftp://nope.test/"])
