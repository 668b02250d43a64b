"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: the full crawl engine over a link graph
                     derived deterministically from the sf0.001 tables.
``queries()``      — one entry per implemented operator family from
                     SURVEY.md §2 + the training-data pipeline ops,
                     each over the driver's parquet tables.
``oracle_sql()``   — DuckDB twins. Portable building blocks only:
                     md5-prefix 60-bit hashes, rounded doubles,
                     string-formatted timestamps. For the crawl engine
                     itself the oracle is the independent single-threaded
                     reference crawler (moca_spark/crawl/oracle.py),
                     emitted as a VALUES literal.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moca_spark.pipeline.dedup import (
    MERSENNE31,
    _perm_params,
    jaccard_pairs,
    minhash_signatures,
    normalize_text,
    portable_hash60,
    shingles,
    simhash,
)
from moca_spark.pipeline.text import (
    _LANG_MARKERS,
    TOKEN_REGEX,
    lang_id,
    quality_score,
    token_count,
    word_count,
)

NUM_PERM = 8
SIMHASH_BITS = 16


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =========================================================================
# entry — flagship: crawl a graph derived from sf0.001 (smoke check)
# =========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Crawl a deterministic link graph derived from the sf0.001 star
    schema: every customer is a host, every order a page; orders chain
    per customer (BFS ladder) and every 5th order links to the first
    page of customer ck+29 when it exists (cross-host handoff, D5).
    Fetch corpus = synthesized image+caption rows (input_hint schema).
    Returns the crawl results table."""
    from moca_spark.crawl.engine import CrawlEngine
    from moca_spark.criteria.dsl import CriteriaSpec, Work
    from moca_spark.sources.synth import images_distributed

    sf_dir = "/root/testdata/sf0.001"
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 29 == 0)

    pages = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ok"),
        F.concat(
            F.lit("http://c"), F.col("o_custkey"), F.lit(".test/o"),
            F.col("o_orderkey"),
        ).alias("url"),
    )
    w = Window.partitionBy("ck").orderBy("ok")
    chain = pages.withColumn("nxt", F.lead("url").over(w)) \
        .filter(F.col("nxt").isNotNull()) \
        .select(F.col("url").alias("src_url"), F.col("nxt").alias("dst_url"))
    firsts = pages.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1).select("ck", F.col("url").alias("first_url"))
    # cross-host handoff via a KEYED self-join (the %29 filter makes
    # successor ck = ck+29 an equi-join key; a customer with no orders
    # just yields no cross link) — deliberately NOT a global
    # Window.orderBy lead: an unpartitioned window funnels every host
    # through one task, the pattern the engine designs out. NOTE
    # (round-4 change, disclosed): the old window shape linked to the
    # next customer PRESENT in orders; this links strictly to ck+29 —
    # entry() output differs from rounds <=3. Safe: the gate checks
    # entry() rows-only per round, nothing compares it across rounds.
    nxt = firsts.select((F.col("ck") - 29).alias("ck"),
                        F.col("first_url").alias("nxt_first"))
    cross = (
        firsts.join(nxt, "ck")
        .join(pages.filter(F.col("ok") % 5 == 0), "ck")
        .select(F.col("url").alias("src_url"), F.col("nxt_first").alias("dst_url"))
    )
    links = chain.unionByName(cross)

    all_urls = links.select(F.col("src_url").alias("url")).unionByName(
        links.select(F.col("dst_url").alias("url"))
    ).unionByName(firsts.select(F.col("first_url").alias("url"))).distinct()
    images = images_distributed(spark, all_urls).cache()

    seeds = [r.first_url for r in firsts.orderBy("ck").limit(4).collect()]
    eng = CrawlEngine(spark, links, images, budget=3, durable=False, n_salts=4)
    eng.add_works(
        [Work(f"w{i}", u, CriteriaSpec(max_depth=3)) for i, u in enumerate(seeds)]
    )
    res = eng.run(max_waves=6)
    return res.results.select(
        "run_id", "wave", "host", "rank", "url", "depth", "fetched",
        "content_hash", "caption",
    )


# =========================================================================
# queries — Spark implementations
# =========================================================================

def _q01_wave_slice_topk(spark, sf_dir):
    """D1/D2/T1: per-host politeness slice = top-3 per group by order.
    (orders: host=o_custkey, queue order=(o_orderdate, o_orderkey))."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey", "rnk", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
    )


def _q02_seen_antijoin(spark, sf_dir):
    """J1: seen-set anti-join — candidates (customers) not present in
    the 'seen' side (customers who placed a large order)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    seen = o.filter(F.col("o_totalprice") > 150_000)
    return (
        c.join(seen, c.c_custkey == seen.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def _q03_busy_semijoin(spark, sf_dir):
    """J5: busy-partition semi-join (suppliers having lineitems)."""
    s, li = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi") \
        .select("s_suppkey", "s_name")


def _q04_min_depth_merge(spark, sf_dir):
    """J4/A2: min-depth merge per key (earliest shipdate per order)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.count("*").alias("n_items"),
    )


def _q05_depth_classify(spark, sf_dir):
    """J3: 3-way depth-status classify (event vs user's best-known ts)."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        e.join(firsts, "user_id")
        .withColumn(
            "status",
            F.when(F.col("ts") == F.col("first_ts"), "new")
            .otherwise("ignored"),
        )
        .groupBy("event_type", "status")
        .agg(F.count("*").alias("n"))
    )


def _q06_shallowest_group(spark, sf_dir):
    """A3: shallowest-group selection — rows at each group's min depth
    (orders on the customer's earliest order date)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("min_date", F.min("o_orderdate").over(w))
        .filter(F.col("o_orderdate") == F.col("min_date"))
        .select(
            "o_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
    )


def _q07_latest_top1(spark, sf_dir):
    """D4: latest-final-result top-1 per key (latest event per user)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def _q08_dedup_rownum(spark, sf_dir):
    """J7: duplicate cleanup keeping the canonical row
    (min linenumber per (orderkey, partkey))."""
    li = _t(spark, sf_dir, "lineitem")
    # Total order: synthetic lineitem has duplicate (orderkey, partkey,
    # linenumber) groups with differing payloads, so the tie-break must
    # be a full key or Spark and DuckDB keep different rows (round-1
    # gate flap).
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy(
        "l_linenumber", "l_returnflag", "l_suppkey", "l_quantity",
        "l_extendedprice")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_kept"))
    )


def _q09_transfer_concat(spark, sf_dir):
    """A4: ordered concat of partial transfers (union of two slices)."""
    o = _t(spark, sf_dir, "orders")
    lo = o.filter(F.col("o_totalprice") < 50_000)
    hi = o.filter(F.col("o_totalprice") > 150_000)
    return lo.unionByName(hi).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def _q10_run_exists(spark, sf_dir):
    """A6: run-exists check (parts never shipped in bulk: no lineitem
    with quantity > 45)."""
    p, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    bulk = li.filter(F.col("l_quantity") > 45)
    return (
        p.join(bulk, p.p_partkey == bulk.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_unused"))
    )


def _q11_robots_prefix(spark, sf_dir):
    """R6/R9: prefix-rule filtering (disallow-prefix semantics)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("text").startswith("key")) \
        .select("doc_id", "lang", "n_chars")


def _q12_content_hash(spark, sf_dir):
    """P2/P8: content hashing (md5 as the portable stand-in for the
    SHA-1 id of Url.scala:16-20 — same shape, DuckDB-portable)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 10).select(
        "doc_id", F.md5(F.col("text")).alias("content_hash")
    )


def _q13_tpch_q1(spark, sf_dir):
    """Catalyst muscle: TPC-H Q1-style aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q14_revenue_join(spark, sf_dir):
    """3-way join: top-10 orders by revenue (broadcast dims, shuffled fact)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )
    return (
        o.join(rev, o.o_orderkey == rev.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def _q15_events_window(spark, sf_dir):
    """T-analog: tumbling-window aggregation (hourly event stats)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def _q16_dedup_exact(spark, sf_dir):
    """Exact dedup: portable 60-bit fingerprint of normalized text."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("fingerprint",
                     portable_hash60(normalize_text(F.col("text"))))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


def _q17_shingles(spark, sf_dir):
    """Shingling: 3-gram counts per doc (window-free slice/transform)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = shingles(d, "text", n=3, id_col="doc_id")
    return sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.countDistinct("shingle_hash").alias("n_distinct"),
    )


def _q18_minhash_sig(spark, sf_dir):
    """MinHash signatures (8 perms, portable linear permutations)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = shingles(d, "text", n=3, id_col="doc_id")
    return minhash_signatures(sh, num_perm=NUM_PERM, id_col="doc_id")


def _q19_simhash(spark, sf_dir):
    """SimHash (16-bit) per doc."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return simhash(d, "text", id_col="doc_id", bits=SIMHASH_BITS)


def _q20_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard similarity: top-20 most similar doc pairs.
    The shingle set is checkpointed once (round 6): candidate-pair
    derivation and the jaccard verify both re-read it instead of
    re-running the explode per consumer."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = shingles(d, "text", n=3, id_col="doc_id").localCheckpoint(eager=True)
    a = sh.select(F.col("doc_id").alias("a"), "shingle_hash").distinct()
    b = sh.select(F.col("doc_id").alias("b"), "shingle_hash").distinct()
    pairs = a.join(b, "shingle_hash").filter(F.col("a") < F.col("b")) \
        .select("a", "b").distinct()
    jp = jaccard_pairs(sh, pairs, id_col="doc_id")
    return (
        jp.orderBy(F.desc("jaccard"), "a", "b").limit(20)
        .select("a", "b", "n_inter", "jaccard")
    )


def _q21_cosine_topk(spark, sf_dir):
    """ANN baseline: exact cosine top-5 for 3 query vectors. Rank is
    computed on the 4-dp-rounded cosine so Spark and DuckDB break ties
    identically."""
    emb = _t(spark, sf_dir, "embeddings") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    )
    c = emb.select("vec_id", F.col("embedding").alias("cv"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))

    scored = q.crossJoin(c).withColumn(
        "cosine",
        F.round(dot(F.col("qv"), F.col("cv")) /
                (norm(F.col("qv")) * norm(F.col("cv"))), 4),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", "cosine", "rnk")
    )


def _q22_text_features(spark, sf_dir):
    """Token counting + quality scoring (JVM-side column algebra)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = F.col("text")
    return d.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        word_count(t).alias("n_words"),
        quality_score(t).alias("quality"),
    )


def _q23_lang_id(spark, sf_dir):
    """Heuristic language-ID confusion counts vs the true lang label."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("lang_pred", lang_id(F.col("text")))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


def _q24_crawl_fixture(spark, sf_dir):
    """The crawl engine itself on the README diamond fixture; oracle =
    the independent single-threaded reference crawler emitted as SQL
    VALUES (FIXTURES.md §6 golden crawl_order)."""
    from moca_spark.crawl.engine import CrawlEngine
    from moca_spark.criteria.dsl import CriteriaSpec, Work
    from moca_spark.crawl.oracle import oracle_corpus_urls
    from moca_spark.sources.synth import diamond_graph, images_for_urls, links_df

    works = [Work("w1", "http://sitea.test/a", CriteriaSpec(max_depth=3))]
    edges = diamond_graph()
    urls = oracle_corpus_urls(edges, works)
    eng = CrawlEngine(
        spark, links_df(spark, edges), images_for_urls(spark, sorted(urls)),
        budget=1, durable=False, n_salts=2,
    )
    eng.add_works(works)
    res = eng.run()
    return res.crawl_order().select("host", "pos", "url", "depth")


_ROBOTS_FIXTURE = {
    "edges": [
        ("http://ra.test/", "http://ra.test/private/a"),
        ("http://ra.test/", "http://ra.test/pub/b"),
        ("http://ra.test/pub/b", "http://rb.test/x"),
        ("http://rb.test/x", "http://other.test/y"),
    ],
    "robots": [("ra.test", "/private")],
}


def _q26_crawl_robots(spark, sf_dir):
    """Crawl with robots-txt + max-depth criteria; oracle = the
    reference crawler as VALUES (exercises R6/R2 inside the engine)."""
    from moca_spark.crawl.engine import CrawlEngine
    from moca_spark.criteria.dsl import CriteriaSpec, Work
    from moca_spark.crawl.oracle import oracle_corpus_urls
    from moca_spark.sources.synth import images_for_urls, links_df

    works = [Work("w1", "http://ra.test/",
                  CriteriaSpec(max_depth=3, robots_txt=True))]
    edges = _ROBOTS_FIXTURE["edges"]
    urls = oracle_corpus_urls(edges, works)
    robots = spark.createDataFrame(_ROBOTS_FIXTURE["robots"],
                                   ["host", "disallow_prefix"])
    eng = CrawlEngine(
        spark, links_df(spark, edges), images_for_urls(spark, sorted(urls)),
        robots, budget=2, durable=False, n_salts=2,
    )
    eng.add_works(works)
    res = eng.run()
    return res.crawl_order().select("host", "pos", "url", "depth")


def _q25_lsh_topk(spark, sf_dir):
    """Approximate ANN (random-hyperplane LSH). Oracle: the seeded
    hyperplanes are emitted as DOUBLE[] literals and the same
    signature/band/cosine pipeline runs in DuckDB."""
    from moca_spark.pipeline.ann import lsh_topk

    emb = _t(spark, sf_dir, "embeddings") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = emb.filter(F.col("vec_id") < 3) \
        .select(F.col("vec_id").alias("q_id"), "embedding")
    return lsh_topk(q, emb, dim=64, k=5, bits=16, bands=8)


def _q31_ivf_topk(spark, sf_dir):
    """IVF-flavored ANN (deterministic seeded centroids, argmax-dot
    cells, top-4 probes). Oracle: centroids emitted as DOUBLE[]
    literals, same cell-assignment/probe/cosine pipeline in DuckDB."""
    from moca_spark.pipeline.ann import ivf_topk

    emb = _t(spark, sf_dir, "embeddings") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = emb.filter(F.col("vec_id") < 3) \
        .select(F.col("vec_id").alias("q_id"), "embedding")
    return ivf_topk(q, emb, dim=64, k=5, n_cells=16, n_probe=4)


def _q27_tpch_q5ish(spark, sf_dir):
    """Multi-dim join (TPC-H Q5 shape): revenue by nation, customer and
    supplier in the same nation — exercises broadcast of the full dim
    chain region->nation and two fact-side joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q28_cosine_block_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label (the scale
    shape: self-join only within blocks)."""
    emb = _t(spark, sf_dir, "embeddings") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    from moca_spark.pipeline.dedup import cosine_pairs

    pairs = cosine_pairs(emb, id_col="vec_id", vec_col="embedding",
                         threshold=0.3, block_col="label")
    return pairs.withColumn("cosine", F.round("cosine", 4))


def _q29_sessionize_batch(spark, sf_dir):
    """Batch sessionization (gap > 30 min splits): the SQL-expressible
    twin of the applyInPandasWithState streaming operator
    (streaming/sessionize.py) — lag + cumulative-sum session ids."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    sid = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w)
    return (
        e.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def _q30_connected_components(spark, sf_dir):
    """Iterative connected components (min-label propagation,
    pipeline/clusters.py) over a clique graph: parts are linked when
    they share (p_brand, p_size). Components of cliques have an exact
    closed form — min partkey per (brand, size) — which is the SQL
    oracle; the Spark side runs the real iterative algorithm."""
    from moca_spark.pipeline.clusters import connected_components

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    a = p.select(F.col("p_partkey").alias("a"), "p_brand", "p_size")
    b = p.select(F.col("p_partkey").alias("b"), "p_brand", "p_size")
    pairs = a.join(b, ["p_brand", "p_size"]).filter(F.col("a") < F.col("b")) \
        .select("a", "b")
    comp = connected_components(pairs, max_iter=6)
    singles = p.join(comp, p.p_partkey == comp.node, "left_anti") \
        .select(F.col("p_partkey").alias("node"),
                F.col("p_partkey").alias("component"))
    return comp.unionByName(singles).select(
        F.col("node").alias("p_partkey"), "component"
    )


def _q32_lsm_slice_split(spark, sf_dir):
    """D1/D2/J2 (LSM frontier, operators/wave.py slice_split): dedupe
    + politeness slice + rest split of a duplicate-carrying frontier
    in one exchange. The frontier is orders-derived with a synthetic
    one-fresh-layer dup set (deeper copies of every third url, the
    engine's LSM shape); the oracle is the defining identity
    slice_split(F) == (top_k(min_merge(F)), min_merge(F) - top_k),
    expressed as SQL min-merge + row_number."""
    from moca_spark.operators.wave import slice_split

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.lit("r1").alias("run_id"),
        F.concat(F.lit("http://h"), (F.col("o_custkey") % 200).cast("string"),
                 F.lit(".test/p"), F.col("o_orderkey").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 200).cast("string"),
                 F.lit(".test")).alias("host"),
        (F.col("o_orderkey") % 5).alias("depth"),
        (F.col("o_orderkey") % 1000).alias("seq"),
    )
    dups = base.filter((F.col("seq") % 3) == 0) \
        .select("run_id", "url", "host",
                (F.col("depth") + 2).alias("depth"),
                (F.col("seq") + 7).alias("seq"))
    frontier = base.unionByName(dups)
    sliced, rest = slice_split(frontier, 3, n_salts=4)
    return sliced.select(
        "host", "url", "depth", "seq",
        F.col("rank").cast("long").alias("rank"),
        F.lit("slice").alias("part"),
    ).unionByName(rest.select(
        "host", "url", "depth", "seq",
        F.lit(0).cast("long").alias("rank"),
        F.lit("rest").alias("part"),
    ))


def _q33_js_links(spark, sf_dir):
    """R8 (criteria/js.py): the JS link-generator criteria EXECUTED end
    to end — per-doc HTML built deterministically from the documents
    table, the 'mini' executor evaluates
    ``[...document.querySelectorAll('a[href]')].map(a => a.href)``, and
    each slot is stringified + resolved against the doc's rendered URL
    with unresolvable slots (mailto:) dropped, per the reference
    contract (JavaScriptCriteria.scala:15-21). The oracle computes the
    same resolved links by direct string algebra — fully independent of
    the HTML parser, selector engine and resolver under test."""
    from moca_spark.criteria.js import make_js_links_udf

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    html = F.concat(
        F.lit('<html><body><a href="/doc/'),
        F.col("doc_id").cast("string"),
        F.lit('.html">self</a><a class="ext" href="https://mirror.test/d/'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('">m</a><a href="mailto:x@y.z">mail</a><img src="/img/'),
        F.col("doc_id").cast("string"),
        F.lit('.png"></body></html>'),
    )
    base = F.concat(F.lit("http://h"), (F.col("doc_id") % 5).cast("string"),
                    F.lit(".example.com/dir/index.html"))
    udf = make_js_links_udf(
        "[...document.querySelectorAll('a[href]')].map(a => a.href)")
    return (
        d.select("doc_id", udf(html, base).alias("links"))
        .select("doc_id", F.posexplode("links").alias("pos", "link"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "link")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_wave_slice_topk": _q01_wave_slice_topk,
        "q02_seen_antijoin": _q02_seen_antijoin,
        "q03_busy_semijoin": _q03_busy_semijoin,
        "q04_min_depth_merge": _q04_min_depth_merge,
        "q05_depth_classify": _q05_depth_classify,
        "q06_shallowest_group": _q06_shallowest_group,
        "q07_latest_top1": _q07_latest_top1,
        "q08_dedup_rownum": _q08_dedup_rownum,
        "q09_transfer_concat": _q09_transfer_concat,
        "q10_run_exists": _q10_run_exists,
        "q11_robots_prefix": _q11_robots_prefix,
        "q12_content_hash": _q12_content_hash,
        "q13_tpch_q1": _q13_tpch_q1,
        "q14_revenue_join": _q14_revenue_join,
        "q15_events_window": _q15_events_window,
        "q16_dedup_exact": _q16_dedup_exact,
        "q17_shingles": _q17_shingles,
        "q18_minhash_sig": _q18_minhash_sig,
        "q19_simhash": _q19_simhash,
        "q20_jaccard_pairs": _q20_jaccard_pairs,
        "q21_cosine_topk": _q21_cosine_topk,
        "q22_text_features": _q22_text_features,
        "q23_lang_id": _q23_lang_id,
        "q24_crawl_fixture": _q24_crawl_fixture,
        "q25_lsh_topk": _q25_lsh_topk,
        "q26_crawl_robots": _q26_crawl_robots,
        "q27_tpch_q5ish": _q27_tpch_q5ish,
        "q28_cosine_block_dedup": _q28_cosine_block_dedup,
        "q29_sessionize_batch": _q29_sessionize_batch,
        "q30_connected_components": _q30_connected_components,
        "q31_ivf_topk": _q31_ivf_topk,
        "q32_lsm_slice_split": _q32_lsm_slice_split,
        "q33_js_links": _q33_js_links,
    }


# =========================================================================
# oracle SQL twins (DuckDB)
# =========================================================================

_NORM = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"
_H60 = "CAST(('0x' || substr(md5({c}),1,15)) AS BIGINT)"

_SHINGLES_CTE = f"""
docs AS (
  SELECT doc_id, string_split({_NORM.format(c='text')}, ' ') ws
  FROM documents WHERE doc_id < {{lim}}
),
idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(len(ws)-2, 0))) i
  FROM docs
),
sh AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM idx
),
shh AS (
  SELECT doc_id, shingle, {_H60.format(c='shingle')} AS shingle_hash FROM sh
)
"""


def _lang_case_sql() -> str:
    """CASE expression mirroring pipeline.text.lang_id."""
    score = {
        lang: " + ".join(
            f"CASE WHEN regexp_matches(lower(text), '(^|[^a-z]){w}([^a-z]|$)') THEN 1 ELSE 0 END"
            for w in ws
        )
        for lang, ws in _LANG_MARKERS.items()
    }
    langs = list(_LANG_MARKERS)
    # replicate the fold: start with first lang, replace when strictly greater
    expr_lang = f"'{langs[0]}'"
    expr_score = f"({score[langs[0]]})"
    for lang in langs[1:]:
        s = f"({score[lang]})"
        expr_lang = f"CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END"
    return f"CASE WHEN {expr_score} > 0 THEN {expr_lang} ELSE 'und' END"


def oracle_sql() -> dict[str, str]:
    perms_values = ", ".join(f"({i}, {a}, {b})" for i, a, b in _perm_params(NUM_PERM))
    sql = {
        "q01_wave_slice_topk": """
            SELECT o_custkey, rnk, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS odate
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) rnk
                  FROM orders)
            WHERE rnk <= 3
        """,
        "q02_seen_antijoin": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 150000)
        """,
        "q03_busy_semijoin": """
            SELECT s_suppkey, s_name FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey)
        """,
        "q04_min_depth_merge": """
            SELECT l_orderkey,
                   strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
                   count(*) AS n_items
            FROM lineitem GROUP BY l_orderkey
        """,
        "q05_depth_classify": """
            WITH firsts AS (SELECT user_id, min(ts) first_ts
                            FROM events GROUP BY user_id)
            SELECT event_type,
                   CASE WHEN ts = first_ts THEN 'new' ELSE 'ignored' END AS status,
                   count(*) AS n
            FROM events JOIN firsts USING (user_id)
            GROUP BY 1, 2
        """,
        "q06_shallowest_group": """
            SELECT o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS odate
            FROM (SELECT *, min(o_orderdate) OVER (PARTITION BY o_custkey) md
                  FROM orders)
            WHERE o_orderdate = md
        """,
        "q07_latest_top1": """
            SELECT user_id, event_id, event_type
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) rn
                  FROM events)
            WHERE rn = 1
        """,
        "q08_dedup_rownum": """
            SELECT l_returnflag, count(*) AS n_kept
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY l_orderkey, l_partkey
                      ORDER BY l_linenumber, l_returnflag, l_suppkey,
                               l_quantity, l_extendedprice) rn
                  FROM lineitem)
            WHERE rn = 1 GROUP BY 1
        """,
        "q09_transfer_concat": """
            SELECT o_orderpriority, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM (SELECT * FROM orders WHERE o_totalprice < 50000
                  UNION ALL
                  SELECT * FROM orders WHERE o_totalprice > 150000)
            GROUP BY 1
        """,
        "q10_run_exists": """
            SELECT p_brand, count(*) AS n_unused FROM part p
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_partkey = p.p_partkey
                                AND l.l_quantity > 45)
            GROUP BY 1
        """,
        "q11_robots_prefix": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE text LIKE 'key%'
        """,
        "q12_content_hash": """
            SELECT doc_id, md5(text) AS content_hash
            FROM documents WHERE doc_id < 10
        """,
        "q13_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "q14_revenue_join": """
            WITH rev AS (
                SELECT l_orderkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
                FROM lineitem GROUP BY 1)
            SELECT o_orderkey, c_name, revenue
            FROM orders JOIN rev ON o_orderkey = l_orderkey
                        JOIN customer ON o_custkey = c_custkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "q15_events_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q16_dedup_exact": f"""
            SELECT {_H60.format(c=_NORM.format(c='text'))} AS fingerprint,
                   count(*) AS n_dups, min(doc_id) AS keep_id
            FROM documents GROUP BY 1
        """,
        "q17_shingles": f"""
            WITH {_SHINGLES_CTE.format(lim=40)}
            SELECT doc_id, count(*) AS n_shingles,
                   count(DISTINCT shingle_hash) AS n_distinct
            FROM shh GROUP BY doc_id
        """,
        "q18_minhash_sig": f"""
            WITH {_SHINGLES_CTE.format(lim=40)},
            perms(perm, a, b) AS (VALUES {perms_values})
            SELECT doc_id, perm,
                   min((a * (shingle_hash % {MERSENNE31}) + b) % {MERSENNE31})
                       AS minhash
            FROM shh, perms GROUP BY 1, 2
        """,
        "q19_simhash": f"""
            WITH docs AS (
              SELECT doc_id,
                     string_split({_NORM.format(c='text')}, ' ') ws
              FROM documents WHERE doc_id < 40
            ),
            toks AS (SELECT doc_id, unnest(ws) tok FROM docs),
            th AS (SELECT doc_id, {_H60.format(c='tok')} AS h FROM toks),
            bits AS (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) b),
            contrib AS (
              SELECT doc_id, b, sum(((h >> b) & 1) * 2 - 1) s
              FROM th, bits GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
                        AS BIGINT) AS simhash
            FROM contrib GROUP BY doc_id
        """,
        "q20_jaccard_pairs": f"""
            WITH {_SHINGLES_CTE.format(lim=60)},
            ds AS (SELECT DISTINCT doc_id, shingle_hash FROM shh),
            sz AS (SELECT doc_id, count(*) n FROM ds GROUP BY 1),
            inter AS (
              SELECT x.doc_id a, y.doc_id b, count(*) n_inter
              FROM ds x JOIN ds y USING (shingle_hash)
              WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
            SELECT a, b, n_inter,
                   round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) AS jaccard
            FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            ORDER BY jaccard DESC, a, b LIMIT 20
        """,
        "q21_cosine_topk": """
            WITH q AS (SELECT vec_id q_id, embedding::DOUBLE[] qv
                       FROM embeddings WHERE vec_id < 3),
            c AS (SELECT vec_id, embedding::DOUBLE[] cv FROM embeddings),
            scored AS (
              SELECT q_id, vec_id,
                     round(list_cosine_similarity(qv, cv), 4) AS cosine
              FROM q CROSS JOIN c)
            SELECT q_id, vec_id, cosine, rnk
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id
                      ORDER BY cosine DESC, vec_id) rnk
                  FROM scored)
            WHERE rnk <= 5
        """,
        "q22_text_features": f"""
            WITH f AS (
              SELECT doc_id,
                     length(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_tokens,
                     len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
                     length(text) AS n,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
              FROM documents WHERE doc_id < 50)
            SELECT doc_id, n_tokens, n_words,
                   round(
                     0.25 * (CASE WHEN n BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END)
                   + 0.5 * (alpha * 1.0 / greatest(n, 1))
                   + 0.15 * (CASE WHEN punct * 1.0 / greatest(n_words, 1) <= 0.3
                             THEN 1.0 ELSE 0.0 END)
                   + 0.1 * (CASE WHEN alpha * 1.0 / greatest(n_words, 1)
                                 BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.0 END)
                   , 6) AS quality
            FROM f
        """,
        "q23_lang_id": f"""
            SELECT lang, {_lang_case_sql()} AS lang_pred, count(*) AS n
            FROM documents GROUP BY 1, 2
        """,
    }
    sql["q27_tpch_q5ish"] = """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
        GROUP BY 1, 2
    """
    sql["q28_cosine_block_dedup"] = """
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
        pairs AS (
          SELECT a.vec_id a, b.vec_id b,
                 round(list_cosine_similarity(a.v, b.v), 6) AS c6
          FROM e a JOIN e b USING (label)
          WHERE a.vec_id < b.vec_id)
        SELECT a, b, round(c6, 4) AS cosine
        FROM pairs WHERE c6 >= 0.3
    """
    sql["q29_sessionize_batch"] = """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 epoch(ts) - lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events),
        s AS (
          SELECT user_id, ts,
                 CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM g)
        SELECT user_id, session_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        FROM s GROUP BY 1, 2
    """
    sql["q30_connected_components"] = """
        SELECT p_partkey,
               min(p_partkey) OVER (PARTITION BY p_brand, p_size)
                 AS component
        FROM part WHERE p_partkey < 400
    """
    # q24/q26: the independent python reference crawler, emitted as
    # VALUES literals (engine vs single-threaded spec, not SQL-derivable)
    from moca_spark.criteria.dsl import CriteriaSpec, Work
    from moca_spark.sources.synth import diamond_graph

    sql["q24_crawl_fixture"] = _crawl_oracle_values(
        [Work("w1", "http://sitea.test/a", CriteriaSpec(max_depth=3))],
        diamond_graph(), budget=1,
    )
    sql["q26_crawl_robots"] = _crawl_oracle_values(
        [Work("w1", "http://ra.test/", CriteriaSpec(max_depth=3, robots_txt=True))],
        _ROBOTS_FIXTURE["edges"], budget=2,
        robots=_ROBOTS_FIXTURE["robots"],
    )
    # q25_lsh_topk: the seeded hyperplanes are deterministic doubles
    # (rounded to 6 dp at generation, ann.py:_hyperplanes), so they can
    # be emitted as DOUBLE[] literals and the full LSH pipeline
    # (signature -> 8x2-bit bands -> bucket join -> cosine re-rank)
    # runs exactly in DuckDB.
    from moca_spark.pipeline.ann import _hyperplanes

    planes = _hyperplanes(dim=64, bits=16, seed=13)
    plane_values = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in p)}]::DOUBLE[])"
        for i, p in enumerate(planes)
    )
    from moca_spark.pipeline.ann import _ivf_centroids

    cent_values = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(_ivf_centroids(dim=64, n_cells=16, seed=29))
    )
    sql["q31_ivf_topk"] = f"""
        WITH cents(cell, cv) AS (VALUES {cent_values}),
        emb AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        scores AS (
          SELECT e.vec_id, c.cell, round(list_dot_product(e.v, c.cv), 9) AS s
          FROM emb e CROSS JOIN cents c),
        corpus_cell AS (
          SELECT vec_id, cell
          FROM (SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY s DESC, cell DESC) rn
                FROM scores)
          WHERE rn = 1),
        probes AS (
          SELECT vec_id AS q_id, cell
          FROM (SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY s DESC, cell DESC) rn
                FROM scores WHERE vec_id < 3)
          WHERE rn <= 4),
        cand AS (SELECT DISTINCT q_id, cc.vec_id
                 FROM probes JOIN corpus_cell cc USING (cell)),
        scored AS (
          SELECT q_id, cand.vec_id,
                 round(list_cosine_similarity(qe.v, ce.v), 6) AS cosine
          FROM cand JOIN emb qe ON qe.vec_id = q_id
                    JOIN emb ce ON ce.vec_id = cand.vec_id)
        SELECT q_id, vec_id, cosine, rnk
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY q_id
                  ORDER BY cosine DESC, vec_id) rnk
              FROM scored)
        WHERE rnk <= 5
    """
    sql["q25_lsh_topk"] = f"""
        WITH planes(p, pv) AS (VALUES {plane_values}),
        emb AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        sigs AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN round(list_dot_product(v, pv), 9) > 0
                          THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS sig
          FROM emb CROSS JOIN planes GROUP BY vec_id),
        bandtab AS (SELECT unnest(generate_series(0, 7)) AS band),
        qb AS (SELECT vec_id AS q_id, band,
                      (sig >> (band * 2)) & 3 AS bkey
               FROM sigs CROSS JOIN bandtab WHERE vec_id < 3),
        cb AS (SELECT vec_id, band, (sig >> (band * 2)) & 3 AS bkey
               FROM sigs CROSS JOIN bandtab),
        cand AS (SELECT DISTINCT q_id, cb.vec_id
                 FROM qb JOIN cb USING (band, bkey)),
        scored AS (
          SELECT q_id, cand.vec_id,
                 round(list_cosine_similarity(qe.v, ce.v), 6) AS cosine
          FROM cand JOIN emb qe ON qe.vec_id = q_id
                    JOIN emb ce ON ce.vec_id = cand.vec_id)
        SELECT q_id, vec_id, cosine, rnk
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY q_id
                  ORDER BY cosine DESC, vec_id) rnk
              FROM scored)
        WHERE rnk <= 5
    """
    sql["q32_lsm_slice_split"] = """
        WITH base AS (
          SELECT 'r1' AS run_id,
                 'http://h' || CAST(o_custkey % 200 AS VARCHAR)
                   || '.test/p' || CAST(o_orderkey AS VARCHAR) AS url,
                 'h' || CAST(o_custkey % 200 AS VARCHAR) || '.test' AS host,
                 o_orderkey % 5 AS depth,
                 o_orderkey % 1000 AS seq
          FROM orders),
        frontier AS (
          SELECT * FROM base
          UNION ALL
          SELECT run_id, url, host, depth + 2, seq + 7
          FROM base WHERE seq % 3 = 0),
        merged AS (
          SELECT run_id, url, host, depth, seq
          FROM (SELECT *, row_number() OVER (
                    PARTITION BY run_id, url ORDER BY depth, seq) rd
                FROM frontier)
          WHERE rd = 1),
        ranked AS (
          SELECT *, row_number() OVER (
                    PARTITION BY host
                    ORDER BY depth, seq, run_id, url) rnk
          FROM merged)
        SELECT host, url, depth, seq, rnk AS "rank", 'slice' AS part
        FROM ranked WHERE rnk <= 3
        UNION ALL
        SELECT host, url, depth, seq, CAST(0 AS BIGINT) AS "rank",
               'rest' AS part
        FROM ranked WHERE rnk > 3
    """
    sql["q33_js_links"] = """
        SELECT doc_id, 0 AS pos,
               'http://h' || CAST(doc_id % 5 AS VARCHAR)
                 || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
                 || '.html' AS link
        FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id, 1 AS pos,
               'https://mirror.test/d/' || CAST(doc_id % 7 AS VARCHAR) AS link
        FROM documents WHERE doc_id < 200
    """
    return sql


def _crawl_oracle_values(works, edges, budget, robots=None) -> str:
    from moca_spark.crawl.oracle import oracle_corpus_urls, oracle_crawl

    res = oracle_crawl(works, edges, robots=robots, budget=budget,
                       corpus_urls=oracle_corpus_urls(edges, works))
    rows = ", ".join(
        f"('{r['host']}', {r['pos']}, '{r['url']}', {r['depth']})"
        for r in res.crawl_order
    )
    return f"SELECT * FROM (VALUES {rows}) AS t(host, pos, url, depth)"
