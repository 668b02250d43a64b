"""Streaming ingest, seed-file source, content serializer, HTML extractor."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from moca_spark.functions.html import extract_links_py
from moca_spark.sources.seeds import read_seed_file, seeds_to_works
from moca_spark.store.serializer import serialize_content
from moca_spark.streaming.ingest import (
    stream_results_metrics,
    stream_seed_files,
)

SEED_FILE = """
!& default
!= max-depth 3
!= a-href

http://site0.test:8000|1
http://Site1.test/a/../b||
ftp://invalid.test/x
http://site2.test/|s2|custom
"""


def test_read_seed_file(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text(SEED_FILE)
    seeds, named = read_seed_file(spark, str(p))
    rows = {r.work_id: r for r in seeds.collect()}
    assert len(rows) == 3  # ftp seed dropped (Url.parse -> None)
    assert rows["1"].seed_url == "http://site0.test:8000/"
    auto_id = hashlib.sha1(b"http://site1.test/b").hexdigest()
    assert rows[auto_id].seed_url == "http://site1.test/b"
    assert rows["s2"].criteria_name == "custom"
    works = seeds_to_works(seeds, named)
    assert {w.work_id for w in works} == set(rows)
    assert all(w.criteria.max_depth == 3 for w in works)  # default block


def test_stream_seed_files(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "batch1.txt").write_text("http://a.test/1|w1\nhttp://b.test/2\n")
    (drop / "batch2.txt").write_text("!& default\n!= a-href\nHTTP://C.test\n")
    q = stream_seed_files(
        spark, str(drop), str(tmp_path / "out"), str(tmp_path / "chk")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {r.seed_url for r in out.collect()}
    assert rows == {"http://a.test/1", "http://b.test/2", "http://c.test/"}


def test_stream_results_metrics(spark, tmp_path):
    src = tmp_path / "results"
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("h1.test", True, base + datetime.timedelta(seconds=s))
        for s in (0, 10, 70)
    ] + [("h2.test", False, base)]
    spark.createDataFrame(
        rows, "host string, fetched boolean, event_time timestamp"
    ).write.parquet(str(src))
    stream = spark.readStream.schema(
        "host string, fetched boolean, event_time timestamp"
    ).parquet(str(src))
    agg = stream_results_metrics(stream, window="1 minute")
    q = (
        agg.writeStream.format("memory").queryName("m")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.window_start.minute): (r.scheduled, r.fetched)
        for r in spark.sql("select * from m").collect()
    }
    assert got[("h1.test", 0)] == (2, 2)
    assert got[("h1.test", 1)] == (1, 1)
    assert got[("h2.test", 0)] == (1, 0)


def test_serialize_content(spark):
    import base64

    rows = [
        ("w1", 1, "http://x.test/a", 0, bytes(b"PNGDATA"), "png", "h1"),
        ("w1", 1, "http://x.test/b", 1, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "run_id string, wave int, url string, depth int, bytes binary, "
        "fmt string, content_hash string",
    )
    out = {r.url: r.content_json for r in serialize_content(df).collect()}
    import json

    ok = json.loads(out["http://x.test/a"])
    assert ok["url"] == "http://x.test/a"
    assert ok["status"] == 200
    assert base64.b64decode(ok["content"]) == b"PNGDATA"
    assert ok["headers"]["Content-Type"] == ["image/png"]
    err = json.loads(out["http://x.test/b"])
    assert err == {"url": "http://x.test/b", "error": "fetch failed"}


def test_extract_links_py():
    html = """
    <html><body>
      <a href="y/z">rel</a>
      <a HREF="/abs">abs</a>
      <a href="http://Other.test/p#frag">full</a>
      <a href="javascript:void(0)">js</a>
      <a href="y/z">dup</a>
      <p>no link</p>
    </body></html>
    """
    got = extract_links_py(html, "http://base.test/k/x")
    assert got == [
        "http://base.test/k/y/z",
        "http://base.test/abs",
        "http://other.test/p",
    ]


def test_extract_links_udf(spark):
    from moca_spark.functions.html import extract_links_udf

    df = spark.createDataFrame(
        [('<a href="/p1">x</a><a href="p2">y</a>', "http://h.test/d/")],
        ["html", "base"],
    )
    out = df.select(
        F.explode(extract_links_udf("html", "base")).alias("url")
    ).collect()
    assert [r.url for r in out] == ["http://h.test/p1", "http://h.test/d/p2"]


def test_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: in-batch gap closes a
    session; trailing session stays in state (not emitted yet)."""
    import datetime as dt

    src = tmp_path / "ev"
    base = dt.datetime(2026, 1, 1, 8, 0, 0)
    rows = [
        # user 1: two sessions separated by a 2h gap
        (1, base),
        (1, base + dt.timedelta(minutes=5)),
        (1, base + dt.timedelta(hours=2)),
        # user 2: one session, single event
        (2, base),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .write.parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts timestamp") \
        .parquet(str(src))

    from moca_spark.streaming.sessionize import sessionize_stream

    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").collect()
    # only user 1's FIRST session closed (via the in-batch 2h gap);
    # trailing sessions are still open in state
    assert len(got) == 1
    r = got[0]
    assert r.user_id == 1 and r.n_events == 2
    assert (r.session_end - r.session_start).total_seconds() == 300
