"""Property tests of the crawl semantics (pure Python — no Spark).

The single-threaded oracle is the executable spec the engine is held
to; these properties pin the spec itself to the reference's intent
(README.md:264-295 "will nevertheless produce the expected output"):

  P1. The final seen set is EXACTLY the BFS-reachable set within
      max_depth, and best_depth == true BFS distance — regardless of
      wave timing, budget, or host layout (the re-crawl-on-smaller-
      depth rule is what forces convergence).
  P2. A URL is re-fetched only at strictly decreasing depths.
  P3. Politeness: per (wave, host) at most `budget` fetches, ranks
      contiguous from 1; per-host positions contiguous from 1.
  P4. Determinism: same inputs -> identical crawl order.
"""

from __future__ import annotations

from collections import deque

from hypothesis import given, settings
from hypothesis import strategies as st

from moca_spark.criteria.dsl import CriteriaSpec, Work
from moca_spark.crawl.oracle import oracle_crawl, oracle_seen_rows


def bfs_distances(seeds: list[str], edges: list[tuple[str, str]],
                  max_depth: int) -> dict[str, int]:
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {u: 0 for u in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= max_depth:  # expansion gate (MaxDepthCriteria)
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


@st.composite
def crawl_case(draw):
    n_nodes = draw(st.integers(4, 24))
    n_hosts = draw(st.integers(1, 4))
    urls = [f"http://h{i % n_hosts}.test/p{i}" for i in range(n_nodes)]
    n_edges = draw(st.integers(3, 40))
    edges = list({
        (urls[draw(st.integers(0, n_nodes - 1))],
         urls[draw(st.integers(0, n_nodes - 1))])
        for _ in range(n_edges)
    })
    edges = [(s, d) for s, d in edges if s != d]
    n_seeds = draw(st.integers(1, 2))
    seeds = list({urls[draw(st.integers(0, n_nodes - 1))] for _ in range(n_seeds)})
    budget = draw(st.integers(1, 3))
    max_depth = draw(st.integers(0, 4))
    return seeds, edges, budget, max_depth


@given(crawl_case())
@settings(max_examples=150, deadline=None)
def test_oracle_converges_to_bfs_distances(case):
    seeds, edges, budget, max_depth = case
    works = [Work(f"w{i}", s, CriteriaSpec(max_depth=max_depth))
             for i, s in enumerate(sorted(seeds))]
    res = oracle_crawl(works, edges, budget=budget)

    # P1 per run: seen == BFS set, best_depth == distance
    for w in works:
        dist = bfs_distances([w.seed_url], edges, max_depth)
        got = {r["url"]: r["best_depth"] for r in oracle_seen_rows(res)
               if r["run_id"] == w.work_id}
        assert got == dist

    # P2: per (run, url) fetch depths strictly decrease
    fetches: dict[tuple[str, str], list[int]] = {}
    for r in res.results:
        fetches.setdefault((r["run_id"], r["url"]), []).append(r["depth"])
    for depths in fetches.values():
        assert all(b < a for a, b in zip(depths, depths[1:]))

    # P3: politeness budget + contiguous ranks/positions
    per_wave_host: dict[tuple[int, str], list[int]] = {}
    per_host_pos: dict[str, list[int]] = {}
    for r in res.crawl_order:
        per_wave_host.setdefault((r["wave"], r["host"]), []).append(r["rank"])
        per_host_pos.setdefault(r["host"], []).append(r["pos"])
    for ranks in per_wave_host.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= budget
    for pos in per_host_pos.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))

    # P4: determinism
    res2 = oracle_crawl(works, edges, budget=budget)
    assert res.crawl_order == res2.crawl_order


@given(crawl_case())
@settings(max_examples=50, deadline=None)
def test_oracle_fetch_failures_subset(case):
    """With a partial corpus, the crawl stays within the full-corpus
    reach and failed URLs never expand."""
    seeds, edges, budget, max_depth = case
    works = [Work("w1", sorted(seeds)[0], CriteriaSpec(max_depth=max_depth))]
    all_urls = {u for e in edges for u in e} | set(seeds)
    # crc32, not the salted built-in hash: keeps hypothesis examples
    # reproducible across processes
    import zlib

    partial = {u for u in all_urls if zlib.crc32(u.encode()) % 3 != 0}
    partial |= set(seeds)
    res = oracle_crawl(works, edges, budget=budget, corpus_urls=partial)
    full = oracle_crawl(works, edges, budget=budget)
    got = {r["url"] for r in res.crawl_order}
    reach = {r["url"] for r in full.crawl_order}
    assert got <= reach
    failed = {r["url"] for r in res.results if not r["fetched"]}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    # children of failed-only parents are unreachable unless another
    # fetched parent links them
    fetched_ok = {r["url"] for r in res.results if r["fetched"]}
    for u in got:
        if u in set(works[0].seed_url for _ in [0]):
            continue
        parents = {s for s, ds in adj.items() if u in ds}
        assert parents & fetched_ok or u == works[0].seed_url
