"""Shared benchmark kernels (used by bench.py and tools/scaling_bench.py).

The north-star metric (BASELINE.json) is *frontier URLs
scheduled+deduped per second* on a synthetic Zipf-skewed frontier. The
kernel below is exactly the per-wave hot path of the crawl engine:

  schedule: salted two-phase top-K per host     (operators/wave.py)
  dedup:    candidate consolidation + anti-join vs seen (J1/J2)
  merge:    min-(depth,seq) frontier merge      (engine step 6)

Inputs are generated lazily with ``spark.range`` (sources/synth.py
scale_frontier) — zero driver memory, any scale. Work is forced with a
``noop`` write so we time compute + shuffle, not a sink.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moca_spark.functions.urls import url_host
from moca_spark.operators.wave import top_k_per_host
from moca_spark.sources.synth import scale_frontier


def _force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def _free_rdds_since(spark: SparkSession, before: set[int]) -> None:
    """Unpersist every RDD persisted after ``before`` was snapshotted
    (round 6): each kernel rep localCheckpoints ~8M rows of state that
    nothing frees until JVM GC gets around to it — by the time
    bench.py's crawl and query phases run, the block manager is
    holding several reps' worth of dead state. Scoped to the ids
    created in between, so callers' own caches are untouched."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in set(jmap.keySet()) - before:
        try:
            jmap.get(rid).unpersist(False)
        except Exception:
            pass


STATE_KEYS = ["_key", "run_id", "url"]


def _with_key(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_key", F.xxhash64(F.concat_ws("\x00", F.col("run_id"), F.col("url")))
    )


def frontier_schedule_dedup(
    spark: SparkSession,
    n_frontier: int = 2_000_000,
    n_candidates: int = 2_000_000,
    n_hosts: int = 20_000,
    budget: int = 100,
    partitions: int = 64,
    materialize_dir: str | None = None,
    fold_every: int = 8,
    dedup_aqe: bool = False,
    mode: str = "lsm",
) -> dict:
    """One full scheduling+dedup wave at scale; returns throughput.

    Mirrors the engine's current hot path exactly (crawl/engine.py):
    hash-key-led state keys (STATE_KEYS), the seen BASE pre-partitioned
    and pre-sorted by those keys (as _fold_seen leaves it) so the
    admission join runs exchange-free/sort-free on the base side, the
    periodic seen-LSM fold timed separately and amortized over
    ``fold_every`` waves, and the frontier handled per ``mode``:

    - ``mode="lsm"`` (engine default, frontier_lsm): the frontier
      arrives as last wave's deduped rest PLUS an unmerged fresh layer
      (n_frontier//8 rows — steady-state admit ratio); slice_split
      dedupes+slices+splits it in ONE exchange, and the "merge" is a
      lazy union of rest and fresh (forced, but exchange-free).
    - ``mode="merge"`` (snapshot-mode shape, round-2 hot path): merged
      KEYS-partitioned+sorted frontier state, top-K slice, slice
      anti-join, union+groupBy min-merge — the second per-wave
      O(frontier) exchange the LSM mode deletes.

    With ``materialize_dir`` the synthetic inputs are written to parquet
    first (untimed) and state tables are prepared from table scans —
    the cluster-faithful shape. State prep (the fold result carried
    from previous waves) is untimed; its per-wave amortized cost is
    measured by timing one real fold and dividing by fold_every."""
    # engine hot-loop schema (round 5, engine._trim_frontier/
    # _trim_runids): in lsm mode rows carry the 64-bit politeness key
    # instead of the host string AND the dense run ordinal instead of
    # the run_id string (the _key is still computed from the STRING —
    # the engine computes it at creation sites where the string
    # exists); both strings are re-derived on the budget-bounded slice
    _rdds_at_entry = _persistent_rdd_ids(spark)

    def _trim(df):
        if mode != "lsm":
            return df
        if "host" in df.columns:
            df = df.withColumn("host_key", F.xxhash64("host")).drop("host")
        return df.withColumn("run_id", F.lit(0))

    frontier = _trim(_with_key(
        scale_frontier(spark, n_frontier, n_hosts, partitions, seed=1)
        .withColumn("run_id", F.lit("bench"))
    ))
    # seen = half the candidate id space -> ~50% dedup hit rate
    seen = _trim(_with_key(
        scale_frontier(spark, n_candidates // 2, n_hosts, partitions, seed=2)
        .select("url", F.col("depth").alias("best_depth"))
        .withColumn("run_id", F.lit("bench"))
    ))
    candidates = _with_key(
        scale_frontier(spark, n_candidates, n_hosts, partitions, seed=2)
        .select("url", "host", "depth",
                (F.col("seq") % 100 + 1).alias("parent_rank"))
        .withColumn("run_id", F.lit("bench"))
    )
    if mode == "lsm":
        # candidates enter the timed region ALREADY in ord space (the
        # engine's _run_ord is a real column carried from the slice) —
        # trimming after the parquet round-trip instead would leave a
        # foldable literal whose constant-folded consolidation
        # partitioning (_key, 0, url) can never satisfy the admission
        # join's clustering, forcing a second O(candidates) exchange
        # the engine does not pay (round 6)
        candidates = candidates.withColumn("run_id", F.lit(0))
    # steady-state fresh layer riding unmerged on the LSM frontier
    # (~admit ratio of a mid-crawl wave); not counted in `processed`
    # (conservative: the lsm kernel does MORE rows per reported URL)
    fresh_prev = _trim(_with_key(
        scale_frontier(spark, max(n_frontier // 8, 1), n_hosts, partitions,
                       seed=3)
        .withColumn("run_id", F.lit("bench"))
    ))
    if materialize_dir:
        # The synthetic inputs are deterministic (fixed seeds/sizes),
        # so when the SAME dir is passed for several reps (bench.py
        # hands one mkdtemp to its warmup + 3 reps) the parquet only
        # needs writing once — a marker records the generation params;
        # any mismatch (or absence) rewrites (round 6: untimed-prep
        # cost only; the timed region still computes everything from
        # the parquet, and the dir is a fresh tempdir per invocation).
        import json as _json
        import os as _os

        params = {"n_frontier": n_frontier, "n_candidates": n_candidates,
                  "n_hosts": n_hosts, "partitions": partitions,
                  "mode": mode}
        marker = f"{materialize_dir}/_INPUTS_OK"
        have = False
        try:
            with open(marker) as fh:
                have = _json.load(fh) == params
        except (OSError, ValueError):
            have = False
        if not have:
            for name, df in (("frontier", frontier), ("seen", seen),
                             ("candidates", candidates),
                             ("fresh_prev", fresh_prev)):
                df.write.mode("overwrite").parquet(
                    f"{materialize_dir}/{name}")
            tmp_marker = marker + ".tmp"
            with open(tmp_marker, "w") as fh:
                _json.dump(params, fh)
            _os.replace(tmp_marker, marker)  # atomic: no torn marker
        frontier = spark.read.parquet(f"{materialize_dir}/frontier")
        seen = spark.read.parquet(f"{materialize_dir}/seen")
        candidates = spark.read.parquet(f"{materialize_dir}/candidates")
        fresh_prev = spark.read.parquet(f"{materialize_dir}/fresh_prev")

    # ---- state prep (untimed): the shape previous waves left behind —
    # merge mode: KEYS-partitioned, KEYS-sorted, checkpointed with AQE
    # off so partitioning/ordering survive into this wave's plans;
    # lsm mode: a deduped claim-free checkpoint (last slice_split's
    # ranked rest) plus the unmerged fresh layer
    aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    base = (
        seen.groupBy(*STATE_KEYS)
        .agg(F.min("best_depth").alias("best_depth"))
        .sortWithinPartitions(*STATE_KEYS)
        .localCheckpoint(eager=True)
    )
    hcol = "host_key" if mode == "lsm" else "host"
    fr_dedup = (
        frontier.groupBy(*STATE_KEYS)
        .agg(F.min(F.struct("depth", "seq")).alias("m"),
             F.first(hcol).alias(hcol))
        .select("_key", "run_id", "url", hcol,
                F.col("m.depth").alias("depth"), F.col("m.seq").alias("seq"))
    )
    if mode == "lsm":
        fr_state = fr_dedup.localCheckpoint(eager=True).unionByName(
            fresh_prev.select(
                "_key", "run_id", "url", "host_key", "depth", "seq")
            .localCheckpoint(eager=True)
        )
    else:
        fr_state = fr_dedup.sortWithinPartitions(*STATE_KEYS) \
            .localCheckpoint(eager=True)
    spark.conf.set("spark.sql.adaptive.enabled", aqe)

    t0 = time.time()
    # SCHEDULE: politeness-bounded per-host priority-queue heads (AQE
    # on); cached like the engine does — the slice is consumed by the
    # anti-join/split, the seen delta and (in the engine) the fetch join
    if mode == "lsm":
        from moca_spark.operators.wave import slice_split

        # eager=False mirrors the engine (round 6): the split-point
        # checkpoint materializes inside the first full-scan action on
        # ``sliced`` (the forced schedule below / the engine's
        # seen-delta count), not as a separate job
        sliced, rest = slice_split(fr_state, budget, n_salts=16, eager=False)
        # engine._rehost/_rerun_id: the trimmed hot loop re-derives the
        # host + run_id strings on the budget-bounded slice (fetch and
        # the journal want them) — timed, part of the wave's real work
        sliced = (
            sliced.withColumn("host", url_host(F.col("url")))
            .withColumn("run_str", F.element_at(
                F.array(F.lit("bench")), F.col("run_id") + 1))
            .cache()
        )
    else:
        sliced = top_k_per_host(fr_state, budget, n_salts=16).cache()
    _force(sliced)
    t_sched = time.time() - t0

    t1 = time.time()
    # DEDUP+MERGE (AQE off, as in engine._materialize): consolidate per
    # url, classify vs the untouched base, min-merge the frontier
    spark.conf.set("spark.sql.adaptive.enabled",
                   "true" if dedup_aqe else "false")
    try:
        # engine cand2 (trim mode): _key was computed from the STRING at
        # creation; the consolidation groups by the ordinal — the run_id
        # string never enters the exchange. Round 6 (lockstep with
        # engine._step): the groupBy keys are EXACTLY the state keys —
        # host is a pure function of url and rides as first() — so the
        # aggregate's output partitioning satisfies the admission
        # join's clustering and its sort doubles as the join sort: the
        # candidates cross ONE exchange between consolidation and
        # admission instead of two.
        cand_src = candidates  # lsm: already ord-space (see gen above)
        cand2 = (
            cand_src.groupBy("_key", "run_id", "url")
            .agg(F.min(F.struct("depth", "parent_rank")).alias("m"),
                 F.first("host").alias("host"))
            .select("_key", "run_id", "url", "host",
                    F.col("m.depth").alias("depth"),
                    F.col("m.parent_rank").alias("parent_rank"))
        )
        fresh = (
            cand2.join(base, STATE_KEYS, "left")
            .filter(F.col("best_depth").isNull() |
                    (F.col("depth") < F.col("best_depth")))
            .select("_key", "run_id", "url",
                    # engine fresh_cols: lsm admits carry the hash only
                    (F.xxhash64("host").alias("host_key")
                     if mode == "lsm" else F.col("host")),
                    "depth",
                    (F.lit(1 << 32) + F.col("parent_rank")).alias("seq"))
        )
        # MERGE — engine code in both modes (shared so the kernel
        # can't drift from the engine hot path): lsm forces the lazy
        # rest∪fresh (exchange-free — the engine consumes it inside
        # next wave's slice exchange, so even this force over-charges
        # lsm by one read); merge runs the round-2 union+groupBy over
        # the anti-joined rest AND the engine's step-7 sorted AQE-off
        # localCheckpoint — the round-2 kernel omitted that
        # materialize, under-measuring the merged path's true per-wave
        # cost by one O(frontier) sort + state copy
        from moca_spark.crawl.engine import merge_frontier

        if mode == "lsm":
            _force(rest.unionByName(fresh))
        else:
            rest = fr_state.join(sliced.select(*STATE_KEYS),
                                 STATE_KEYS, "left_anti")
            merge_frontier(rest, fresh) \
                .sortWithinPartitions(*STATE_KEYS) \
                .localCheckpoint(eager=True)
        t_dedup = time.time() - t1

        # FOLD (timed once, amortized /fold_every): the LSM compaction
        # of the seen base with this wave's consume delta
        t2 = time.time()
        delta = sliced.select("_key", "run_id", "url",
                              F.col("depth").alias("best_depth"))
        folded = (
            base.unionByName(delta)
            .groupBy(*STATE_KEYS)
            .agg(F.min("best_depth").alias("best_depth"))
            .sortWithinPartitions(*STATE_KEYS)
        )
        _force(folded)
        t_fold = time.time() - t2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        sliced.unpersist()
        # free this rep's checkpointed state (untimed; see
        # _free_rdds_since) so later reps and bench phases don't run
        # against a block manager full of dead state
        _free_rdds_since(spark, _rdds_at_entry)

    total = t_sched + t_dedup + t_fold / fold_every
    processed = n_frontier + n_candidates
    return {
        "mode": mode,
        "n_frontier": n_frontier,
        "n_candidates": n_candidates,
        "n_hosts": n_hosts,
        "schedule_sec": round(t_sched, 2),
        "dedup_merge_sec": round(t_dedup, 2),
        "fold_sec": round(t_fold, 2),
        "fold_amortized_sec": round(t_fold / fold_every, 2),
        "total_sec": round(total, 2),
        "urls_per_sec": round(processed / total),
    }


def crawl_end_to_end(spark: SparkSession, n_hosts: int = 12,
                     pages_per_host: int = 40) -> dict:
    """Small end-to-end crawl (engine, memory mode) on a Zipf graph."""
    from moca_spark.criteria.dsl import CriteriaSpec, Work
    from moca_spark.crawl.engine import CrawlEngine
    from moca_spark.sources.synth import links_df, zipf_graph

    _rdds_at_entry = _persistent_rdd_ids(spark)
    edges = zipf_graph(n_hosts=n_hosts, pages_per_host=pages_per_host)
    links = links_df(spark, edges)
    # fixture-scale corpus (~1k rows): generate driver-side and ship
    # via Arrow createDataFrame — identical rows to the distributed
    # generator (same per-url crc32 lossy rule), but no Python stage
    # in the timed region for a corpus this small (round 6; the
    # mapInPandas generator remains the at-scale path — entry() and
    # engine_scale_run still exercise it)
    import zlib

    import pandas as pd

    from moca_spark.sources.synth import IMAGES_SCHEMA, make_image_row

    urls = sorted({u for e in edges for u in e})
    rows = [make_image_row(u, lossy=(zlib.crc32(u.encode()) % 7 == 3))
            for u in urls]
    # the corpus is scanned every wave: cache it (stand-in for the
    # Iceberg table scan; PNG synthesis must not re-run per wave)
    images = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA]),
        schema=IMAGES_SCHEMA,
    ).cache()
    images.count()
    eng = CrawlEngine(spark, links, images, budget=20, durable=False, n_salts=4,
                      collect_metrics=False)
    eng.add_works([Work(f"w{i}", f"http://host{i}.test/p0", CriteriaSpec(max_depth=4))
                   for i in range(6)])
    t0 = time.time()
    res = eng.run(max_waves=8)
    n = res.results.count()
    dt = time.time() - t0
    # drop the crawl's caches/checkpoints before the query phases run
    # (untimed; see _free_rdds_since)
    _free_rdds_since(spark, _rdds_at_entry)
    return {"fetched": n, "waves": res.waves, "sec": round(dt, 2),
            "fetch_per_sec": round(n / dt, 1)}


def synthetic_web(spark: SparkSession, n_pages: int, n_hosts: int,
                  partitions: int = 64):
    """Lazy large-scale web: Zipf-hosted pages, chain + skip links, and
    a lightweight corpus (1-row-per-page images table with tiny bytes —
    scheduling semantics need the join, not real pixels)."""
    pages = scale_frontier(spark, n_pages, n_hosts, partitions).select(
        "url", "seq"
    )
    nxt = scale_frontier(spark, n_pages, n_hosts, partitions).select(
        F.col("url").alias("dst_url"), (F.col("seq")).alias("nseq")
    )
    links = (
        pages.withColumn("nseq", (F.col("seq") + 1) % n_pages)
        .join(nxt, "nseq")
        .select(F.col("url").alias("src_url"), "dst_url")
        .unionByName(
            pages.withColumn("nseq", (F.col("seq") * 7 + 13) % n_pages)
            .join(nxt, "nseq")
            .select(F.col("url").alias("src_url"), "dst_url")
        )
    )
    images = pages.select(
        F.sha1(F.encode("url", "UTF-8")).alias("image_id"),
        F.encode(F.substring("url", 1, 8), "UTF-8").alias("bytes"),
        F.lit(8).alias("w"), F.lit(8).alias("h"),
        F.lit("png").alias("fmt"),
        F.concat(F.lit("caption-"), F.substring(F.sha1(F.encode("url", "UTF-8")), 1, 12)).alias("caption"),
        F.xxhash64("url").alias("phash"),
    )
    seeds = pages.orderBy("seq").limit(200).select("url")
    return links, images, seeds


def engine_scale_run(spark: SparkSession, n_pages: int = 2_000_000,
                     n_hosts: int = 20_000, budget: int = 50,
                     waves: int = 3, materialize_dir: str | None = None,
                     durable="memory", checkpoint_dir: str | None = None,
                     frontier_lsm: bool | None = None) -> dict:
    """Run the REAL engine for a few waves on a large synthetic web;
    report per-wave wall clock + frontier throughput."""
    from moca_spark.criteria.dsl import CriteriaSpec, Work
    from moca_spark.crawl.engine import CrawlEngine

    links, images, seeds = synthetic_web(spark, n_pages, n_hosts)
    if materialize_dir:
        links.write.mode("overwrite").parquet(f"{materialize_dir}/links")
        images.write.mode("overwrite").parquet(f"{materialize_dir}/images")
        links = spark.read.parquet(f"{materialize_dir}/links")
        images = spark.read.parquet(f"{materialize_dir}/images")
    seed_urls = [r.url for r in seeds.collect()]

    eng = CrawlEngine(spark, links, images, budget=budget,
                      durable=False if durable == "memory" else durable,
                      checkpoint_dir=checkpoint_dir,
                      n_salts=16, use_bloom="sharded",
                      bloom_capacity=n_pages, collect_metrics=False,
                      frontier_lsm=frontier_lsm)
    eng.add_works([
        Work(f"w{i}", u, CriteriaSpec(max_depth=10**6))
        for i, u in enumerate(seed_urls)
    ])
    t0 = time.time()
    res = eng.run(max_waves=waves)
    dt = time.time() - t0
    fetched = res.results.count()
    pending = res.frontier.count()
    return {
        "durable": str(durable),
        "n_pages": n_pages, "n_hosts": n_hosts, "budget": budget,
        "waves": res.waves, "fetched": fetched, "pending": pending,
        "sec": round(dt, 1), "sec_per_wave": round(dt / max(res.waves, 1), 1),
        "fetched_per_sec": round(fetched / dt, 1),
    }
