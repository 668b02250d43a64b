"""The distributed crawl engine: iterative BFS waves over a global
frontier, all DataFrame ops.

One wave (= the reference's "every host's current task makes progress
for one politeness window") does:

  1. SLICE    top-budget rows per host in (depth, seq) order — the
               per-host exclusive politeness-bounded queue head
               (PartitionScheduler + Minion FIFO; operators/wave.py);
  2. FETCH    left equi-join slice -> images corpus on image_id
               (sha1 of the canonical URL) — the sandbox stand-in for
               HTTP GET (Minion.scala:110-117); missing row = fetch
               failure (NotFetched path — URL is consumed, no links);
  3. SEEN     min-depth merge of fetched URLs into the seen table
               (url_depth + downloaded sets, PgRunControl.scala:344-364);
  4. EXPAND   parents with depth < max_depth join the links graph —
               AHref extraction (AHrefCriteria.scala:16-21), then the
               compiled criteria filter chain (criteria/stages.py);
  5. DEDUP    consolidate candidates per (run, url) keeping min
               (depth, parent_rank); optional bloom pre-filter, then
               exact anti-join-style classification vs seen — admit
               unseen or strictly-smaller depth (re-crawl, T8);
  6. MERGE    frontier = (rest of frontier) ∪ fresh, min (depth, seq)
               per (run, url) — J2 frontier dedup + depth replacement;
  7. COMMIT   checkpoint frontier+seen, append results+metrics
               (store/lakehouse.py) — the Akka journal/snapshot analog.
               Three layouts: memory (localCheckpoint, tests/bench),
               full snapshots (durable=True), or the append-only event
               journal (durable="eventlog"): O(delta) durable writes
               per wave while the live state chains in memory via
               localCheckpoint; the journal is re-aggregated only on
               resume/compaction — the layout for the 10^10 target
               (EventLogStore docstring).

Scale notes (the 100 TB story):
- No unbounded per-host window anywhere: slicing is salted two-phase
  top-K; fresh-candidate seq needs no numbering at all (see
  crawl/oracle.py ordering contract).
- State joins/sorts are led by a 64-bit hash key (STATE_KEYS) with the
  URL string demoted to payload+tiebreak; AQE handles skew on the
  expand path; the links-graph join broadcasts the (small) parent side
  at runtime.
- The SEEN table (the 10^10 monster) is an LSM: folded base + per-wave
  deltas (_fold_seen/_admit_unseen). The base is hash-partitioned and
  sorted by STATE_KEYS, preserved through AQE-off localCheckpoints
  (_materialize), so the per-wave admission join runs with ZERO
  exchange and ZERO sort on the base side (tools/plan_audit.py asserts
  this on the physical plan). Folds amortize the O(|seen|) rewrite
  over fold_every waves, and only the deltas shuffle.
- Per-wave frontier cost: one shuffle for the salted slice and one for
  the merge groupBy — both O(|frontier|), and the frontier is orders
  of magnitude smaller than seen at steady state.
- The runs/criteria table and robots rules are broadcast.
- Lineage is cut per wave (localCheckpoint / snapshot re-read), so
  plans stay one scan deep regardless of wave count.
- Python appears only in Arrow UDFs (canonicalize, PSL domain) and in
  the optional bloom pre-filter; everything else is codegen'd JVM.
"""

from __future__ import annotations

import tempfile
import zlib
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from moca_spark.criteria.dsl import Work
from moca_spark.criteria.stages import apply_criteria
from moca_spark.filters.bloom import BloomFilter, build_bloom_from_df
from moca_spark.functions.urls import (
    canonicalize_str,
    canonicalize_udf,
    domain_udf,
    url_host,
)
from moca_spark.operators.fetch import fetch_with_token_bucket
from moca_spark.operators.wave import slice_split, top_k_per_host
from moca_spark.store.lakehouse import CheckpointStore

SEQ_WAVE_STRIDE = 1 << 32
POLITENESS_INTERVAL_S = 5  # reference default, role/Task.scala:12

# Canonical state key: a 64-bit hash LEADS every state join/group/sort
# so per-row comparisons and sorts touch an 8-byte long first and the
# ~80-byte URL string only on hash-equal rows; run_id+url stay in the
# key set, so a hash collision can never merge distinct URLs.
STATE_KEYS = ["_key", "run_id", "url"]


def merge_frontier(rest: DataFrame, fresh: DataFrame) -> DataFrame:
    """J2/J4 frontier min-merge — keep min (depth, seq) per (run, url)
    (TaskPublisher.scala's queue dedup semantics, re-expressed as
    state merge). One exchange of O(rest + fresh) by STATE_KEYS.

    Why union+groupBy and not an outer join against the partitioned
    ``rest``: a full-outer sort-merge join WOULD shuffle only the
    small ``fresh`` side (rest is KEYS-partitioned+sorted from the
    previous checkpoint), but SortMergeJoin(FullOuter) reports
    UnknownPartitioning — null-extended key attributes invalidate the
    per-attribute hash claim — so the NEXT wave's slice anti-join
    would re-exchange the whole frontier instead: the O(frontier)
    exchange moves one stage later, a wash, plus an extra sort.
    Splitting into left-join + anti-join hits the same wall at the
    Union (UnionExec also reports UnknownPartitioning). The
    union+groupBy keeps the Hash(STATE_KEYS) claim that makes the
    following wave's anti-join and this merge's own rest side
    exchange-free. The real per-wave shuffle reduction is deferring
    the merge into the slice exchange entirely (frontier_lsm mode)."""
    return fold_frontier(rest.unionByName(fresh))


def fold_frontier(frontier: DataFrame) -> DataFrame:
    """Min-merge a frontier that may carry duplicate (run, url) rows
    down to one min-(depth, seq) row each — the compaction step of the
    LSM frontier (run end, journal compaction, snapshot commits)."""
    return (
        frontier
        .groupBy(*STATE_KEYS)
        .agg(
            F.min(F.struct("depth", "seq")).alias("m"),
            F.first("host").alias("host"),
        )
        .select("_key", "run_id", "url", "host",
                F.col("m.depth").alias("depth"),
                F.col("m.seq").alias("seq"))
    )


@dataclass
class CrawlResult:
    frontier: DataFrame
    seen: DataFrame
    results: DataFrame
    metrics: DataFrame
    waves: int

    def crawl_order(self) -> DataFrame:
        """Per-host fetch order (host, pos, url, depth) — golden shape
        (FIXTURES.md §6). pos = position within the host across waves."""
        from pyspark.sql import Window

        w = Window.partitionBy("host").orderBy("wave", "rank")
        return self.results.select(
            "host", "wave", "rank", "url", "depth", "run_id"
        ).withColumn("pos", F.row_number().over(w))

    def final_links(self, run_id: str) -> DataFrame:
        """GetLinks (entry point 3, Master.scala:208-216 +
        PgRunControl.scala:209-211): the combined ContentLinks transfer
        of a work — every fetched (url, depth, content_uri, content_hash)
        row; a re-crawled URL keeps its LATEST fetch (the reference's
        combined transfer concatenates partials in order and readers
        take the last occurrence — CombinedLinksTransfer.scala:5-9)."""
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy(F.desc("wave"), F.desc("rank"))
        return (
            self.results.filter(F.col("run_id") == run_id)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("url", "depth", "content_uri", "content_hash")
        )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        links: DataFrame,
        images: DataFrame,
        robots: DataFrame | None = None,
        budget: int = 8,
        checkpoint_dir: str | None = None,
        n_salts: int = 16,
        keep_snapshots: int = 0,
        durable: bool = True,
        use_bloom: bool = False,
        bloom_capacity: int = 1_000_000,
        use_token_bucket: bool = False,
        partition_selector=None,
        verify_fetch: bool = False,
        collect_metrics: bool = True,
        compact_every: int = 0,
        links_canonical: bool = False,
        fold_every: int = 8,
        bucket_state: int = 0,
        fetch_prune: int = 10_000,
        corpus_buckets: int = 0,
        frontier_lsm: bool | None = None,
        filter_delta_max_keys: int = 10_000_000,
        runid_trim_max_runs: int = 4096,
        expand_broadcast_max: int = 200_000,
        state_broadcast_max: int = 500_000,
    ):
        self.spark = spark
        self.images = images
        self.robots = robots
        self.budget = budget
        self.n_salts = n_salts
        self.keep_snapshots = keep_snapshots  # 0 = keep all wave states
        # durable: True (full state snapshot per wave) | False
        # (localCheckpoint, no resume — tests/bench) | "eventlog"
        # (append-only delta journal + reconstruction — the layout that
        # avoids O(|frontier|) write amplification at 10^10 scale;
        # store/lakehouse.py EventLogStore)
        self.durable = durable
        self.use_bloom = use_bloom
        self.bloom_capacity = bloom_capacity
        self.use_token_bucket = use_token_bucket
        # fetch_prune=N: push the wave's slice image-ids (bounded by
        # budget x active hosts) as a literal In filter into the corpus
        # scan, so the per-wave fetch join reads O(slice) instead of
        # scanning the whole corpus table every wave — THE 100 TB fetch
        # story. On a bucketed+sorted corpus (store/lakehouse.py
        # write_corpus_bucketed) the filter also prunes buckets
        # (SelectedBucketsCount) and row groups (min/max stats on the
        # sorted image_id). 0 disables; slices above N fall back to the
        # full join (AQE still broadcasts the slice side).
        self.fetch_prune_threshold = fetch_prune
        # corpus_buckets=B: the images table was written by
        # write_corpus_bucketed(n_buckets=B). Slice ids are then
        # grouped by their bucket (pmod(hash(id), B) — F.hash IS
        # Spark's bucketing hash, Murmur3 seed 42) before chunking, so
        # each pushed-In branch prunes to the few bucket files its ids
        # actually live in instead of every branch touching every
        # bucket (task count drops from branches x buckets to ~buckets)
        self.corpus_buckets = corpus_buckets
        self._corpus_bucket_files: dict[int, list[str]] | None = None
        self._warned_unbucketed = False
        # use_bloom: False | True (broadcast monolith) | "sharded"
        # (per-hash-range bitmap table — the 10^10 layout where one
        # broadcast bloom would be ~18 GB; filters/sharded_bloom.py) |
        # "cuckoo" (deletable variant, same sharded-table layout —
        # filters/sharded_cuckoo.py: fingerprints of re-admitted URLs
        # are EVICTED so the approximate hit set stays tight under
        # re-crawls; inserts run per-shard on executors, a saturated
        # shard degrades itself to the exact path while healthy shards
        # keep prefiltering)
        self.bloom_mode = (
            use_bloom if use_bloom in ("sharded", "cuckoo") else bool(use_bloom)
        )
        self.n_bloom_shards = 64
        self._bloom_shards = None  # DataFrame(shard, bits) when sharded
        # input_hint per-row invariant enforced DURING the crawl:
        # decode each fetched image, PSNR >= 40 dB vs source pixels
        self.verify_fetch = verify_fetch
        self.collect_metrics = collect_metrics
        self.compact_every = compact_every  # eventlog: fold journal every N waves
        # Seen-state LSM: the (monotonically growing, 10^10-target) seen
        # table is kept as a big folded BASE plus a stack of per-wave
        # consume DELTAS; deltas fold into the base every `fold_every`
        # waves. Per-wave work on the seen side is then O(delta) — the
        # base is never unioned/re-shuffled per wave (snapshot mode
        # still folds every wave: it must write full state anyway).
        self.fold_every = max(1, fold_every)
        self._seen_base: DataFrame | None = None
        self._seen_deltas: list[DataFrame] = []
        # LSM frontier (default outside snapshot mode): the per-wave
        # frontier is last wave's ``rest`` unioned with its admitted
        # ``fresh`` — NEVER min-merged per wave. Dedup happens inside
        # the slice's own (host, salt) exchange (operators/wave.py
        # slice_split), and rest comes back as a filter over the same
        # exchanged data, so the former per-wave O(frontier) merge
        # exchange + hash agg + slice anti-join + sorted claim-
        # preserving checkpoint all disappear: frontier rows cross the
        # wire ONCE per wave, not twice. Duplicates are at most one
        # fresh layer deep (rest is dedup output, fresh is unique per
        # (run, url)); a full min-merge fold runs only at run end,
        # journal compaction, and resume reconstruction. Snapshot mode
        # (durable=True) keeps the merged shape — it must write folded
        # full state every wave anyway.
        if frontier_lsm and durable is True:
            raise ValueError(
                "frontier_lsm requires durable=False or 'eventlog' "
                "(snapshot mode writes folded state every wave)")
        self._frontier_lsm = (
            durable is not True if frontier_lsm is None else bool(frontier_lsm)
        )
        # run_id dictionary trim (round 5, after the host-string trim):
        # run_id is tiny-cardinality (one per Work), so the lsm hot
        # loop carries a dense int ordinal assigned in SORTED run_id
        # order instead of the string. (run_ord, url) <-> (run_id, url)
        # is a bijection within one run() execution, so exact-identity
        # joins stay exact, and sorted assignment makes ORDER BY
        # (depth, seq, _key, run_ord, url) the SAME total order as the
        # ordering contract's (depth, seq, _key, run_id, url) — no
        # oracle change needed. Strings are re-attached on the
        # budget-bounded slice and at every boundary (journal,
        # snapshots, CrawlResult), exactly like the host string.
        # Same-JVM interleaved A/B (tools/runid_ab.py, 8M rows):
        # trim/carry 1.12 at local[8], 1.25 at local[32]. Above
        # ``runid_trim_max_runs`` the reverse-map array literal would
        # bloat every plan — the trim disables itself (strings carried,
        # still correct).
        self.runid_trim_max_runs = runid_trim_max_runs
        # expand_broadcast_max (round 6): a wave whose slice holds at
        # most this many rows gets an EXPLICIT broadcast hint on the
        # parent side of the expand join (the parent count is bounded
        # by the slice count, which the wave measures exactly via the
        # seen-delta checkpoint), and — on the plain exact-dedup path,
        # where the consolidated candidates have a single consumer —
        # the whole expand→consolidate→admit chain fuses into the one
        # `fresh` materialization instead of paying a separate cand2
        # checkpoint job. Default 200k rows ~ tens of MB broadcast.
        # Bigger waves keep the AQE-planned checkpointed shape (runtime
        # broadcast + skew-join handling).
        self.expand_broadcast_max = expand_broadcast_max
        # state_broadcast_max (round 6): the engine tracks an exact
        # upper bound on the seen-state row count (Σ of the per-wave
        # slice counts it already measures; None after a resume, where
        # the loaded state's size is unknown). While the bound stays
        # under this threshold the admission join BROADCASTS the seen
        # base and delta stack (guide §3.1: hint what you can prove
        # small) and the admit/fresh materialization keeps AQE —
        # coalesced tiny stages instead of full-width AQE-off
        # exchanges. Once the bound crosses (the 10^10 trajectory,
        # immediately on any real crawl) the exchange-free sorted-base
        # sort-merge path below is used unchanged. Row bound, not
        # bytes: ~100 B/row ⇒ 500k rows ~ 50 MB broadcast.
        self.state_broadcast_max = state_broadcast_max
        self._state_rows_bound: int | None = 0
        self._run_ords: list[str] | None = None
        # U3 partition selector (partition/PartitionSelector.scala:6-16;
        # default = ByHostPartitionSelector): Column -> partition key.
        # The frontier 'host' column IS the partition key; criteria
        # filters keep using the real URL host/domain.
        self.partition_selector = partition_selector or url_host
        self._bloom: BloomFilter | None = (
            BloomFilter(bloom_capacity) if self.bloom_mode is True else None
        )
        # cuckoo mode: DataFrame(shard, bits, ok) like the sharded bloom
        self._cuckoo_shards: DataFrame | None = None
        # LSM maintenance for the sharded/cuckoo filters: the BASE
        # shard table above is rewritten only at fold time; in between,
        # each wave stacks its (tiny) add/del key frames here and
        # probes them exactly (_probe_filter). Round-3 rewrote and
        # re-serialized the WHOLE shard table every wave — at the
        # 10^10 target that is GBs of filter blobs shuffled per wave,
        # growing with capacity, forever.
        self._filter_deltas: list[tuple[str, DataFrame]] = []
        # The unfolded add-delta stack is probed via BROADCAST
        # (_probe_filter) — bounded in the common case at fold_every x
        # (budget x active hosts) 8-byte keys, but at 10^6 active hosts
        # x budget 8 x fold_every 8 that is ~0.5 GB per wave, past the
        # comfortable broadcast range. The bound is ENFORCED here: the
        # stacked key count is tracked per wave (from the same
        # materialization job the seen delta already pays) and an early
        # _fold_filter fires once it crosses this threshold, so the
        # broadcast can never exceed ~threshold x 8 bytes.
        self.filter_delta_max_keys = filter_delta_max_keys
        self._filter_delta_keys = 0
        self._bloom_bc = None  # previous wave's monolith-bloom broadcast
        self._results_acc: list[DataFrame] = []
        self._metrics_acc: list[DataFrame] = []
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
            prefix="moca-chk-"
        )
        # bucket_state=N: snapshot-mode state writes become N-bucket
        # tables, so per-wave disk re-reads come back hash-partitioned
        # + sorted by STATE_KEYS and the state-side joins stay
        # exchange-free even in durable=True mode (and resume starts
        # co-partitioned). See CheckpointStore docstring.
        if durable == "eventlog":
            from moca_spark.store.lakehouse import EventLogStore

            self.store: CheckpointStore = EventLogStore(
                spark, self.checkpoint_dir, bucket_state=bucket_state)
        else:
            self.store = CheckpointStore(
                spark, self.checkpoint_dir, bucket_state=bucket_state)
        # Canonicalize the graph once: both endpoints normalized, invalid
        # dropped (R9 scheme whitelist happens inside canonicalize).
        # The graph is re-joined every wave. Two input shapes:
        # - raw links (default): canonicalize once and cache (the
        #   pandas-UDF normalization must not re-run per wave);
        # - links_canonical=True: the table is already normalized —
        #   typically a parquet dir PARTITIONED BY src_host, which lets
        #   the per-wave expand join prune to the scheduled hosts'
        #   partitions via dynamic partition pruning instead of
        #   scanning the whole web graph (the 10^10 expand-join story).
        self.links_canonical = links_canonical
        self.prune_hosts_threshold = 10_000
        if links_canonical:
            self.links = links
            if "src_host" not in self.links.columns:
                self.links = self.links.withColumn(
                    "src_host", url_host(F.col("src_url"))
                )
        else:
            self.links = (
                links.select(
                    canonicalize_udf("src_url").alias("src_url"),
                    canonicalize_udf("dst_url").alias("dst_url"),
                )
                .filter(F.col("src_url").isNotNull() & F.col("dst_url").isNotNull())
                .distinct()
                .withColumn("src_host", url_host(F.col("src_url")))
                .cache()
            )
        self.runs: list[dict] = []
        self.custom_by_name: dict[str, tuple[str, ...]] = {}

    # -- entry point 1: AddWork (SeedInputParser -> PgRunControl.add) ----
    def add_works(self, works: list[Work]) -> int:
        """Register works; duplicate work ids are skipped (A6,
        PgRunControl.scala:71-74). Returns number actually added.

        Seed URLs are canonicalized here (the reference canonicalizes at
        Url construction, url/Url.scala) so programmatic Works behave
        like file-parsed ones — links and corpus are keyed by canonical
        URLs, so a raw 'http://Example.com/a#f' seed would otherwise
        silently never fetch. Invalid seeds raise, mirroring
        parse_seed_lines."""
        existing = {r["run_id"] for r in self.runs}
        added = 0
        for w in works:
            if w.work_id in existing:
                continue
            seed = canonicalize_str(w.seed_url)
            if seed is None:
                raise ValueError(f"invalid seed url: {w.seed_url!r}")
            existing.add(w.work_id)
            spec = w.criteria
            self.runs.append(
                {
                    "run_id": w.work_id,
                    "seed_url": seed,
                    "seed_seq": len(self.runs),
                    **spec.as_row(),
                }
            )
            if spec.custom_filters:
                self.custom_by_name[spec.name] = spec.custom_filters
            added += 1
        return added

    def _trim_frontier(self, frontier: DataFrame) -> DataFrame:
        """LSM hot-loop schema (round 5): demote the host STRING out of
        the per-wave frontier payload, carrying the 64-bit politeness
        key ``host_key = xxhash64(host)`` instead. The string rode the
        (host_key, salt) exchange, both rank-window sorts, the ranked
        checkpoint and the rest∪fresh union purely as payload — ~20% of
        the UnsafeRow bytes — since the partition key is already its
        hash (operators/wave.py HOST_KEY_MODE) and ``host`` is a
        deterministic function of url (``partition_selector``), so it
        is re-derived on the budget-bounded slice (``_rehost``) and at
        run-end/journal boundaries only. Same-JVM interleaved A/B
        (tools/payload_ab.py, 8M rows): +9% at local[8], and at
        local[32] the schedule stage dropped 11.3→4.8 s — the wider
        rows were crossing the per-task execution-memory threshold
        under 32-way concurrency. Stored schemas are unchanged: the
        journal, snapshots and CrawlResult still carry ``host``."""
        if "host_key" not in frontier.columns:
            frontier = (frontier
                        .withColumn("host_key", F.xxhash64(F.col("host")))
                        .drop("host"))
        return self._trim_runids(frontier)

    def _rehost(self, df: DataFrame, drop_key: bool = False) -> DataFrame:
        """Re-derive the host string of a trimmed frame from its url
        (host ≡ partition_selector(url) for every frontier row — both
        creation sites compute exactly that)."""
        out = df.withColumn("host", self.partition_selector(F.col("url")))
        return out.drop("host_key") if drop_key else out

    def _trim_runids(self, df: DataFrame) -> DataFrame:
        """run_id string -> dense int ordinal (sorted-run_id order; see
        the constructor comment). Boundary-loaded state may only carry
        run_ids the caller re-registered via add_works — the contract
        every resume path already obeys (criteria come from self.runs)
        — and this is enforced LOUDLY: an unknown run_id raises at scan
        time instead of silently dropping rows."""
        if self._run_ords is None or dict(df.dtypes).get("run_id") != "string":
            return df
        # via pandas: the Arrow createDataFrame path plans a JVM-only
        # scan; the list path would plan a PythonRDD that runs pickle
        # workers on every later read (round 6, see sources/synth.py)
        ords = self.spark.createDataFrame(
            pd.DataFrame({"run_id": list(self._run_ords),
                          "_ord": range(len(self._run_ords))}),
            "run_id string, _ord int",
        )
        return (
            df.join(F.broadcast(ords), "run_id", "left")
            .withColumn(
                "_ord",
                F.coalesce(
                    F.col("_ord"),
                    F.raise_error(F.concat(
                        F.lit("state row carries a run_id absent from "
                              "this engine's runs (re-add_works before "
                              "resume): "), F.col("run_id"))).cast("int"),
                ),
            )
            .drop("run_id")
            .withColumnRenamed("_ord", "run_id")
        )

    def _rerun_id(self, df: DataFrame) -> DataFrame:
        """Reverse of _trim_runids: re-attach the run_id STRING from
        the carried ordinal (O(1) array index per row). The ordinal is
        KEPT as ``_run_ord`` so ord-space projections (seen delta,
        candidate consolidation) stay string-free; explicit-column
        boundary selects never pick it up."""
        if self._run_ords is None or dict(df.dtypes).get("run_id") == "string":
            return df
        arr = F.array(*[F.lit(r) for r in self._run_ords])
        return (
            df.withColumnRenamed("run_id", "_run_ord")
            .withColumn("run_id", F.element_at(arr, F.col("_run_ord") + 1))
        )

    def _runs_df(self) -> DataFrame:
        cols = ["run_id", "seed_url", "seed_seq", "criteria_name",
                "max_depth", "same_host", "same_domain", "robots_txt"]
        # via pandas for the Arrow createDataFrame path (no PythonRDD
        # pickle scan on the per-wave reads; round 6)
        return self.spark.createDataFrame(
            pd.DataFrame([[r[c] for c in cols] for r in self.runs],
                         columns=cols),
            "run_id string, seed_url string, seed_seq long, "
            "criteria_name string, max_depth int, same_host boolean, "
            "same_domain boolean, robots_txt boolean",
        )

    def _initial_state(self) -> tuple[DataFrame, DataFrame]:
        runs = self._runs_df()
        frontier = runs.select(
            "run_id",
            F.col("seed_url").alias("url"),
            self.partition_selector(F.col("seed_url")).alias("host"),
            F.lit(0).alias("depth"),
            F.col("seed_seq").alias("seq"),
        ).withColumn("_key", self._seen_key())
        seen = frontier.select("_key", "run_id", "url", "depth") \
            .filter(F.lit(False)) \
            .withColumnRenamed("depth", "best_depth")
        return frontier, seen

    # -- entry point 2: the crawl loop (SELECT) ---------------------------
    def run(self, max_waves: int = 10_000, resume: bool = False) -> CrawlResult:
        from moca_spark.operators import wave as _wave_mod

        self._run_ords = None  # (re)built below iff lsm mode; a stale
        # dictionary from a previous run() must never leak into this one
        if self._frontier_lsm and _wave_mod.SLICE_DEDUP_MODE == "hashagg_packed":
            # the packed-long dedup is exact only for depth < 2^16 and
            # seq < 2^47 (seq = wave*2^32 + parent_rank ⇒ wave < 2^15)
            assert max_waves < (1 << 15), (
                "SLICE_DEDUP_MODE='hashagg_packed' packs (depth, seq) "
                "into one long — exact only for wave < 2^15; lower "
                "max_waves or use a window dedup mode")
        if resume and self.store.latest_wave() is not None:
            if not self.durable:
                raise ValueError("resume requires durable=True or 'eventlog'")
            # loaded state of unknown size: disable the small-state
            # broadcast fast path (the sorted-base SMJ shape is always
            # correct; see state_broadcast_max)
            self._state_rows_bound = None
            start = self.store.latest_wave()
            if self.durable == "eventlog":
                frontier, seen = self._reconstruct()
            else:
                frontier, seen = self.store.load_wave(start)
                # pre-round-2 snapshots lack the _key column the
                # STATE_KEYS joins lead with — recompute it on load
                # (mirrors what _reconstruct does for the eventlog)
                if "_key" not in frontier.columns:
                    frontier = frontier.withColumn("_key", self._seen_key())
                if "_key" not in seen.columns:
                    seen = seen.withColumn("_key", self._seen_key())
            if self._bloom is not None:  # rebuild the seen bloom (T5)
                self._bloom = build_bloom_from_df(
                    seen.withColumn("k", self._seen_key()), "k",
                    self.bloom_capacity,
                )
            if self.bloom_mode == "cuckoo":  # T5 for the deletable
                # filter: one distributed groupBy-build over the seen
                # keys (the round-2 shape iterated the WHOLE seen set
                # through the driver — hours after 10^8 fetches)
                from moca_spark.filters.sharded_cuckoo import (
                    build_sharded_cuckoo,
                )

                self._cuckoo_shards = build_sharded_cuckoo(
                    seen.select(self._seen_key().alias("k")), "k",
                    self.n_bloom_shards, self.bloom_capacity,
                ).localCheckpoint(eager=True)
            if self.bloom_mode == "sharded":
                # T5 for the sharded bloom — without this rebuild a
                # pre-resume seen URL probes as a definitive MISS and
                # is admitted WITHOUT the exact join, breaking the
                # depth-qualified re-crawl rule (latent round-3 bug:
                # only the monolith and cuckoo filters were rebuilt)
                from moca_spark.filters.sharded_bloom import (
                    build_sharded_bloom,
                )

                self._bloom_shards = build_sharded_bloom(
                    seen.select(self._seen_key().alias("k")), "k",
                    self.n_bloom_shards, self.bloom_capacity,
                ).localCheckpoint(eager=True)
        else:
            start = 0
            self._state_rows_bound = 0  # empty seen state
            frontier, seen = self._initial_state()
            if self.durable == "eventlog":
                self.store.append_events(
                    0,
                    frontier.select(
                        "run_id", "url", "host", "depth", "seq",
                        F.lit("add").alias("kind"), F.lit(0).alias("wave"),
                    ),
                )
                frontier, seen = self._reconstruct()
            elif self.durable:
                frontier, seen = self.store.commit_wave(
                    0, frontier, seen, None, None
                )
            else:
                frontier = frontier.localCheckpoint(eager=True)
                seen = seen.localCheckpoint(eager=True)
        if self._frontier_lsm:
            # hot-loop schema: host string -> 64-bit host_key, run_id
            # string -> dense ordinal (see _trim_frontier/_trim_runids);
            # boundaries above (journal, snapshots, resume loads) all
            # carry the string schema
            rids = sorted({r["run_id"] for r in self.runs})
            self._run_ords = (
                rids if len(rids) <= self.runid_trim_max_runs else None
            )
            frontier = self._trim_frontier(frontier)
            seen_t = self._trim_runids(seen)
            if seen_t is not seen:
                # the trim rewrote the base: materialize ONCE (sorted,
                # AQE-off) so the mapping join never re-plans inside
                # the per-wave admission join — it would otherwise
                # re-exchange + re-sort the base EVERY wave until the
                # first fold (measured: +2 s/wave on the e2e bench)
                seen_t = self._materialize(seen_t, sort=True)
            seen = seen_t
        self._seen_base, self._seen_deltas = seen, []

        runs_b = F.broadcast(self._runs_df())
        wave = start
        self.wave_times: list[float] = []
        import time as _time

        while wave < max_waves:
            _t0 = _time.monotonic()
            # no per-wave isEmpty action: _step's own slice count (a
            # job every wave pays anyway) doubles as the emptiness
            # signal — it returns None on an exhausted frontier before
            # committing anything (round 6, one fewer action per wave)
            stepped = self._step(wave + 1, frontier, runs_b)
            if stepped is None:
                break
            wave += 1
            frontier = stepped
            self.wave_times.append(_time.monotonic() - _t0)
            if self.durable is True and self.keep_snapshots:
                self.store.expire_snapshots(self.keep_snapshots)
            if (self.durable == "eventlog" and self.compact_every
                    and wave % self.compact_every == 0):
                self.store.compact(wave)
                frontier, seen = self._reconstruct()
                if self._frontier_lsm:
                    # mirror the run-start block: the trims apply only
                    # in LSM mode — with frontier_lsm=False the non-LSM
                    # _step path expects the string schema (round-5
                    # advice: unguarded trims broke eventlog+
                    # compact_every with the LSM explicitly disabled)
                    frontier = self._trim_frontier(frontier)
                    seen_t = self._trim_runids(seen)
                    if seen_t is not seen:  # see run-start comment
                        seen_t = self._materialize(seen_t, sort=True)
                    seen = seen_t
                self._seen_base, self._seen_deltas = seen, []

        seen = self._fold_seen()
        if self._frontier_lsm:
            # compact the one-fresh-layer-deep LSM view down to the
            # merged contract shape callers (and the oracle) see —
            # re-deriving the host + run_id strings the hot loop dropped
            frontier = fold_frontier(self._rehost(
                self._rerun_id(frontier).drop("_run_ord"), drop_key=True))
            seen = self._rerun_id(seen).drop("_run_ord")
        if self.durable:
            results, metrics = self.store.all_results(), self.store.all_metrics()
        else:
            results = self._union_acc(self._results_acc)
            metrics = self._union_acc(self._metrics_acc)
        return CrawlResult(frontier, seen, results, metrics, wave)

    def _union_acc(self, acc: list[DataFrame]) -> DataFrame | None:
        if not acc:
            return None
        out = acc[0]
        for df in acc[1:]:
            out = out.unionByName(df)
        return out

    def _materialize(self, df: DataFrame, sort: bool = False,
                     aqe_off: bool = True) -> DataFrame:
        """localCheckpoint planned with AQE OFF: under AQE the
        checkpointed LogicalRDD reports UnknownPartitioning (the
        AdaptiveSparkPlan hides the final plan's partitioning), so every
        later state join would re-shuffle the big side. Planned without
        AQE, the checkpoint keeps outputPartitioning AND outputOrdering
        — downstream same-key joins/aggregations skip the exchange (and
        with ``sort=True`` the sort-merge sort) on this side entirely.
        State-merge plans are uniform hash-keyed shapes; they don't need
        AQE's skew handling (the expand/slice stages keep AQE).

        NOTE: this briefly mutates the session-global AQE conf — the
        engine assumes a single-threaded driver (one crawl loop per
        SparkSession, the deployment shape of jobs/crawl_job.py). A
        concurrent query planned on the same session during the window
        would plan without AQE; run concurrent workloads on their own
        SparkSession (``spark.newSession()``) if needed.

        ``aqe_off=False`` (round 6) keeps AQE for checkpoints whose
        partitioning claim nothing downstream needs — e.g. the admit
        output while the seen state is small enough that its joins
        broadcast (_small_state): AQE then coalesces the tiny stages
        instead of running full-width exchanges."""
        if sort:
            df = df.sortWithinPartitions(*STATE_KEYS)
        if not aqe_off:
            return df.localCheckpoint(eager=True)
        aqe = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return df.localCheckpoint(eager=True)
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe)

    def _probe_filter(self, cand2: DataFrame) -> DataFrame:
        """Tag candidates with ``_maybe_seen`` against the LSM filter:
        BASE shard-table probe (sharded bloom or cuckoo) OR exact
        membership in the unfolded add-delta key stack. PASS-only
        discipline holds by construction: delta membership only ADDS
        maybe-hits (routed to the exact join, which alone decides);
        del-deltas pending in the stack are ignored until fold — a
        stale maybe costs join work, never correctness. The delta
        broadcast is bounded and ENFORCED: the engine counts stacked
        keys per wave and folds early once they cross
        ``filter_delta_max_keys`` (default 10M ~ 80 MB broadcast), so
        the exact-membership frame can never grow past that no matter
        how many hosts a wave schedules."""
        tagged = cand2.withColumn("_k", F.col("_key"))
        if self.bloom_mode == "sharded" and self._bloom_shards is not None:
            from moca_spark.filters.sharded_bloom import probe_sharded_bloom

            tagged = probe_sharded_bloom(
                tagged, "_k", self._bloom_shards, self.n_bloom_shards)
        elif self.bloom_mode == "cuckoo" and self._cuckoo_shards is not None:
            from moca_spark.filters.sharded_cuckoo import probe_sharded_cuckoo

            tagged = probe_sharded_cuckoo(
                tagged, "_k", self._cuckoo_shards, self.n_bloom_shards)
        else:  # no base yet (fresh run before the first fold): the
            # delta stack alone IS the filter state
            tagged = tagged.withColumn("_maybe_seen", F.lit(False))
        tagged = tagged.drop("_k")
        adds = [df for kind, df in self._filter_deltas if kind == "add"]
        if adds:
            d = adds[0]
            for extra in adds[1:]:
                d = d.unionByName(extra)
            d = d.distinct().withColumn("_in_delta", F.lit(True))
            tagged = (
                tagged.join(F.broadcast(d), tagged["_key"] == d["k"], "left")
                .drop("k")
                .withColumn(
                    "_maybe_seen",
                    F.col("_maybe_seen")
                    | F.coalesce(F.col("_in_delta"), F.lit(False)),
                )
                .drop("_in_delta")
            )
        return tagged

    def _fold_filter(self) -> None:
        """Fold the pending add/del key deltas into the base filter
        shard table — the filter-side LSM compaction, run alongside
        _fold_seen so the whole-table rewrite amortizes over
        ``fold_every`` waves (round-3 rewrote every wave). Only shards
        the deltas actually touch pass through the pandas
        re-serialization; untouched base rows union through unchanged
        (fold cost = O(touched shards), not O(shard table))."""
        if not self._filter_deltas:
            self._filter_delta_keys = 0
            return
        if self.bloom_mode == "sharded":
            from moca_spark.filters.sharded_bloom import (
                build_sharded_bloom,
                merge_sharded_blooms,
                shard_of,
            )

            adds = [df for kind, df in self._filter_deltas if kind == "add"]
            if adds:
                d = adds[0]
                for extra in adds[1:]:
                    d = d.unionByName(extra)
                delta = build_sharded_bloom(
                    d, "k", self.n_bloom_shards, self.bloom_capacity)
                if self._bloom_shards is None:
                    merged = delta
                else:
                    # bounded collect (<= n_bloom_shards values) over
                    # the checkpointed key frames: base shards with no
                    # delta keys skip the OR-merge rewrite entirely
                    touched = sorted(r.s for r in d.select(
                        shard_of(F.col("k"), self.n_bloom_shards).alias("s")
                    ).distinct().collect())
                    merged = self._bloom_shards.filter(
                        ~F.col("shard").isin(touched)
                    ).unionByName(merge_sharded_blooms(
                        self._bloom_shards.filter(
                            F.col("shard").isin(touched)),
                        delta,
                    ))
                self._bloom_shards = merged.localCheckpoint(eager=True)
        elif self.bloom_mode == "cuckoo":
            from moca_spark.filters.sharded_cuckoo import apply_cuckoo_deltas

            self._cuckoo_shards = apply_cuckoo_deltas(
                self._cuckoo_shards, self._filter_deltas, "k",
                self.n_bloom_shards, self.bloom_capacity,
            ).localCheckpoint(eager=True)
        self._filter_deltas = []
        self._filter_delta_keys = 0

    def _fold_seen(self) -> DataFrame:
        """Fold the pending consume deltas into the seen base (min
        best_depth per (run, url)) — the LSM compaction of the seen
        state. The base is already hash-partitioned by STATE_KEYS from
        the previous fold, so only the deltas shuffle; the rewrite cost
        is O(|seen|) local work, amortized over `fold_every` waves."""
        self._fold_filter()
        if not self._seen_deltas:
            return self._seen_base
        merged = self._seen_base
        for d in self._seen_deltas:
            merged = merged.unionByName(d)
        folded = self._materialize(
            merged.groupBy(*STATE_KEYS)
            .agg(F.min("best_depth").alias("best_depth")),
            sort=True,
        )
        self._seen_base, self._seen_deltas = folded, []
        return folded

    def _small_state(self) -> bool:
        """True while the seen state is PROVABLY tiny (see
        state_broadcast_max): the admission joins may broadcast and the
        admit materialization may keep AQE."""
        return (self._state_rows_bound is not None
                and self._state_rows_bound <= self.state_broadcast_max)

    def _admit_unseen(self, df: DataFrame, keep_flag: bool = False) -> DataFrame:
        """The J1/T8 admission rule over the base+delta seen state:
        keep rows never seen, or seen only at a strictly larger depth
        (re-crawl). One left join against the (big) base — which is
        hash-partitioned AND sorted by STATE_KEYS from the fold, so it
        joins with no exchange and no sort — and one against the
        (small) delta stack. The base is never unioned or re-shuffled
        per wave. While the whole state is provably small
        (_small_state) both sides take an explicit broadcast hint
        instead — same rows out, zero exchange and zero sort on the
        candidate side."""
        small = self._small_state()
        base = self._seen_base.withColumnRenamed("best_depth", "_bd_base")
        out = df.join(F.broadcast(base) if small else base,
                      STATE_KEYS, "left")
        if self._seen_deltas:
            d = self._seen_deltas[0]
            for extra in self._seen_deltas[1:]:
                d = d.unionByName(extra)
            d_min = d.groupBy(*STATE_KEYS).agg(
                F.min("best_depth").alias("_bd_delta")
            )
            out = out.join(F.broadcast(d_min) if small else d_min,
                           STATE_KEYS, "left")
        else:
            out = out.withColumn("_bd_delta", F.lit(None).cast("int"))
        bd = F.least("_bd_base", "_bd_delta")
        out = out.filter(bd.isNull() | (F.col("depth") < bd))
        if keep_flag:  # re-crawl marker (cuckoo eviction needs it)
            out = out.withColumn("_was_seen", bd.isNotNull())
        return out.drop("_bd_base", "_bd_delta")

    def _checkpoint_increment(self, wave: int, name: str, df: DataFrame) -> DataFrame:
        """Checkpoint a per-wave append table once; downstream reads
        (metrics derivation, final union) reuse the checkpoint instead
        of recomputing the fetch join. Memory mode checkpoints LAZILY
        (round 6): nothing reads the increments until run end (or the
        same-wave metrics derivation), so the per-wave materialization
        job disappears — all increments materialize together in the
        first action that touches them, each branch a narrow read over
        its wave's already-checkpointed slice. Durable modes stay
        eager by nature (the write IS the durability)."""
        if self.durable:
            return self.store.write_increment(wave, name, df)
        # AQE-off planning makes the checkpoint ACTUALLY lazy: under
        # AQE, toRdd materializes every intermediate query stage
        # eagerly (getFinalPhysicalPlan), so even eager=False would run
        # the increment's broadcast/shuffle stages per wave. The
        # increment plans are projections over the wave's cached slice
        # and a broadcast fetch join — nothing AQE helps with.
        aqe = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            c = df.localCheckpoint(eager=False)
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe)
        (self._results_acc if name == "results" else self._metrics_acc).append(c)
        return c

    def _needs_domains(self) -> bool:
        """True iff some run's criteria (same-domain) or any registered
        custom filter could read the domain columns."""
        return bool(self.custom_by_name) or any(
            r["same_domain"] for r in self.runs
        )

    def _reconstruct(self) -> tuple[DataFrame, DataFrame]:
        """Eventlog mode: (frontier, seen) from the committed journal.
        The journal itself stays hash-free; the state key is recomputed
        here (one projection over the aggregated state)."""
        from moca_spark.store.lakehouse import _reconstruct_state

        log = self.store.read_log()
        if log is None:
            empty_f = self.spark.createDataFrame(
                [],
                "run_id string, url string, host string, depth int, seq long",
            )
            empty_s = self.spark.createDataFrame(
                [], "run_id string, url string, best_depth int"
            )
        else:
            empty_f, empty_s = _reconstruct_state(log)
        return (
            empty_f.withColumn("_key", self._seen_key()),
            empty_s.withColumn("_key", self._seen_key()),
        )

    @staticmethod
    def _seen_key(run_col: str = "run_id", url_col: str = "url") -> F.Column:
        """64-bit bloom key over (run, url) — xxhash64, JVM-side."""
        return F.xxhash64(F.concat_ws("\x00", F.col(run_col), F.col(url_col)))

    # parquet evaluates a pushed In as a values-deep Or recursion and
    # stack-overflows near ~2000 values; Spark's
    # parquet.pushdown.inFilterThreshold (session.py: 256) degrades
    # larger Ins to a min/max range, which skips nothing over uniform
    # sha1 ids. Chunking the SORTED id list keeps every chunk under the
    # threshold, so each branch scan gets an exact pushed In.
    FETCH_PRUNE_CHUNK = 200

    def _pruned_links(self, parents: DataFrame) -> DataFrame:
        """The links-graph side of the expand join, pruned to the
        wave's scheduled hosts. Joining on (src_url, src_host) —
        src_url alone determines the match; the redundant src_host key
        enables partition pruning on a src_host-partitioned links
        table. With links_canonical, two pruning shapes by host count:

        - <= prune_hosts_threshold hosts: a literal host-list filter —
          static PartitionFilters on the scan, each wave reads only the
          scheduled hosts' graph partitions, not the whole web;
        - above the threshold (a literal list that big would bloat
          every plan and the driver): a broadcast LEFT SEMI join on the
          distinct scheduled hosts — on a partitioned links table Spark
          inserts a dynamicpruningexpression into the scan's
          PartitionFilters (DPP), so pruning survives ANY host count
          instead of silently disappearing (tools/plan_audit.py
          asserts the DPP shape)."""
        links = self.links
        if not self.links_canonical:
            return links
        hosts = [
            r.src_host
            for r in parents.select("src_host").distinct()
            .limit(self.prune_hosts_threshold + 1).collect()
        ]
        if 0 < len(hosts) <= self.prune_hosts_threshold:
            return links.filter(F.col("src_host").isin(hosts))
        if hosts:
            return links.join(
                F.broadcast(parents.select("src_host").distinct()),
                "src_host", "left_semi",
            )
        return links

    def _pruned_images(self, sliced: DataFrame,
                       n_rows: int | None = None) -> DataFrame:
        """The corpus side of the fetch join, pruned to this wave's
        slice — per-wave fetch reads O(slice), independent of corpus
        size (the round-2 scale-killer: the old shape scanned the whole
        corpus table every wave).

        The slice is bounded (budget × active hosts), so its image-ids
        are collected, sorted, and pushed into the corpus scan as
        literal In filters, chunked to <= FETCH_PRUNE_CHUNK ids per
        scan branch so parquet applies them exactly. What each pushed
        branch skips, by corpus layout (write_corpus_bucketed):

        - bucket pruning: a branch reads only the bucket FILES its ids
          hash to (chunks are bucket-aligned when corpus_buckets is
          set, so branches cover disjoint bucket ranges);
        - row-group skipping: sorted image_id gives tight min/max
          stats; row-group bloom filters skip on exact membership.
          Skipping bites when ids-per-bucket < row-groups-per-bucket —
          rows read are O(min(corpus, slice × rowgroup_rows)), vs the
          round-2 shape's O(corpus) always.

        Policy: a single pushed branch for slices <= FETCH_PRUNE_CHUNK
        (helps on prunable layouts, harmless otherwise — still one
        scan); multi-branch chunking ONLY on a bucketed corpus (on an
        unprunable layout every branch would rescan the whole table —
        measured 10x worse, tools/fetch_bench.py); above
        fetch_prune_threshold — where collecting an unbounded id list
        would trade a scan problem for a driver problem — a bucketed
        corpus degrades to BUCKET-level pruning (_bucket_pruned_images:
        collect the <= corpus_buckets distinct bucket ids, bounded at
        ANY slice size, and read only those buckets' files), and an
        unbucketed one to the full join; at that regime the corpus
        belongs in a point-lookup store (Iceberg + file blooms / KV;
        README divergence #6). tools/plan_audit.py asserts the plan
        shapes; tools/fetch_bench.py measures rows-read flatness under
        8x corpus growth."""
        if not self.fetch_prune_threshold:
            return self.images
        id_col = F.sha1(F.encode("url", "UTF-8")).alias("image_id")
        if n_rows is not None and n_rows <= self.fetch_prune_threshold:
            # round-6: the caller already knows the slice's exact row
            # count (the seen-delta count the wave pays anyway), and it
            # bounds the distinct-id count — so the id collect needs NO
            # distinct exchange and NO limit machinery: one narrow scan
            # of the cached slice, dedup on the driver (<= n_rows
            # values). The distinct+limit path below remains for
            # callers without a count (row count above the threshold
            # can still mean few DISTINCT ids on multi-run slices).
            if self.corpus_buckets:
                rows = sliced.select(
                    id_col,
                    F.pmod(F.hash("image_id"), F.lit(self.corpus_buckets))
                    .alias("_b"),
                ).collect()
                ids = [i for _, i in sorted({(r._b, r.image_id) for r in rows})]
            else:
                ids = sorted({r.image_id for r in sliced.select(id_col).collect()})
            return self._images_for_ids(ids)
        if self.corpus_buckets:
            # bucket-aligned chunk order: consecutive chunks cover
            # consecutive buckets, so each branch's bucket pruning
            # selects only the ~chunk/ids-per-bucket files it needs
            # distinct BEFORE limit: a multi-run slice carries the same
            # image_id (sha1(url) is run-independent) on several rows —
            # limiting raw rows could under-collect distinct ids past
            # the threshold and silently prune real fetches into misses
            rows = sliced.select(id_col).select(
                "image_id",
                F.pmod(F.hash("image_id"), F.lit(self.corpus_buckets))
                .alias("_b"),
            ).distinct().limit(self.fetch_prune_threshold + 1).collect()
            ids = [i for _, i in sorted({(r._b, r.image_id) for r in rows})]
        else:
            ids = sorted({
                r.image_id
                for r in sliced.select(id_col).distinct()
                .limit(self.fetch_prune_threshold + 1).collect()
            })
        if len(ids) > self.fetch_prune_threshold:
            if self.corpus_buckets:
                return self._bucket_pruned_images(sliced)
            if not self._warned_unbucketed:
                import warnings

                self._warned_unbucketed = True
                warnings.warn(
                    "a wave scheduled more than fetch_prune="
                    f"{self.fetch_prune_threshold} URLs against an "
                    "UNBUCKETED corpus: every such wave rescans the "
                    "whole corpus table. Write the corpus with "
                    "store.lakehouse.write_corpus_bucketed and pass "
                    "corpus_buckets= so big waves prune to the touched "
                    "buckets' files instead",
                    stacklevel=2,
                )
            return self.images
        return self._images_for_ids(ids)

    def _images_for_ids(self, ids: list[str]) -> DataFrame:
        """The corpus pruned to a bounded, sorted id list (<=
        fetch_prune_threshold ids; bucket-aligned order when
        corpus_buckets is set) — the chunked pushed-In scan shape the
        class docstring describes."""
        if not ids:
            return self.images
        chunk = self.FETCH_PRUNE_CHUNK
        if len(ids) > chunk and not self.corpus_buckets:
            # multi-branch chunking multiplies SCANS; without bucket
            # pruning to pay for them (each branch would rescan the
            # whole table) the full join is strictly cheaper
            return self.images
        branches = [
            self.images.filter(F.col("image_id").isin(ids[i:i + chunk]))
            for i in range(0, len(ids), chunk)
        ]
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    def _bucket_files(self) -> dict[int, list[str]]:
        """bucket id -> parquet files of the bucketed corpus, parsed
        from the Spark bucketed-file naming convention
        (``part-<task>-<uuid>_<bucket:05d>.c000...``). Built once per
        engine — the corpus is immutable during a crawl. Empty dict =
        layout not recognized OR not consistent with ``corpus_buckets``
        (caller falls back to the correct-by-construction full join).

        The constructor's ``corpus_buckets`` is correctness-bearing on
        this path (a wrong value silently prunes real fetches into
        misses), so the layout hypothesis is VALIDATED, once, before
        any pruning:

        - every parsed bucket id must be < corpus_buckets (catches a
          configured count smaller than the physical one);
        - a sample of rows from a few files must hash to their file's
          bucket id under pmod(hash(image_id), corpus_buckets)
          (catches a larger configured count and a corpus bucketed on
          a different column — each sampled row of a mis-declared
          layout agrees only by 1/k chance, so ~20 rows make a false
          pass negligible)."""
        if self._corpus_bucket_files is None:
            import re as _re

            mapped: dict[int, list[str]] = {}
            for f in self.images.inputFiles():
                m = _re.search(r"_(\d{5})\.c000", f)
                if not m:
                    mapped = {}
                    break
                mapped.setdefault(int(m.group(1)), []).append(f)
            if mapped and not self._validate_bucket_layout(mapped):
                mapped = {}
            self._corpus_bucket_files = mapped
        return self._corpus_bucket_files

    def _validate_bucket_layout(self, mapped: dict[int, list[str]]) -> bool:
        import warnings

        if max(mapped) >= self.corpus_buckets:
            warnings.warn(
                f"corpus_buckets={self.corpus_buckets} but the corpus "
                f"layout has bucket ids up to {max(mapped)} — bucket "
                "pruning disabled, falling back to the full fetch join "
                "(pass the n_buckets the corpus was actually written "
                "with; see store.lakehouse.write_corpus_bucketed)",
                stacklevel=3,
            )
            return False
        # sample rows from up to 8 files; every row must land in its
        # file's bucket under the declared (column, count) hypothesis.
        # F.hash IS Spark's bucketing hash (Murmur3 seed 42).
        # Buckets are sampled evenly ACROSS the parsed range (not the
        # first 8) and the probed file is a deterministic pseudo-random
        # pick per bucket (round-5 advice: first-file-of-first-buckets
        # sampling could pass a corpus with files appended later under
        # a different layout). Bounded: still <= 8 file reads. Mixed
        # layouts that dodge this sample — same filename convention,
        # consistent ids only in the probed files — remain out of
        # scope; append to a bucketed corpus only via
        # write_corpus_bucketed with the same n_buckets.
        items = sorted(mapped.items())
        stride = max(1, len(items) // 8)
        sample = [
            (b, fs[zlib.crc32(str(b).encode()) % len(fs)])
            for b, fs in items[::stride][:8]
        ]
        for b, f in sample:
            rows = (
                self.spark.read.schema(self.images.schema).parquet(f)
                .select(
                    F.pmod(F.hash("image_id"), F.lit(self.corpus_buckets))
                    .alias("_b"))
                .limit(20).collect()
            )
            if any(r._b != b for r in rows):
                warnings.warn(
                    f"corpus file for bucket {b} holds rows hashing "
                    f"elsewhere under pmod(hash(image_id), "
                    f"{self.corpus_buckets}) — the corpus was bucketed "
                    "with a different count or column; bucket pruning "
                    "disabled, falling back to the full fetch join",
                    stacklevel=3,
                )
                return False
        return True

    def _bucket_pruned_images(self, sliced: DataFrame) -> DataFrame:
        """Bucket-level corpus pruning for slices ABOVE
        fetch_prune_threshold (round-3 gap: a production wave at the
        10^10 target schedules ~10^5-10^6 URLs — exactly the regime
        where the id-list fallback rescanned the whole corpus).
        Collecting the slice's distinct BUCKET ids is bounded at
        <= corpus_buckets values for ANY slice size, so the driver
        cost stays O(buckets); reading only those buckets' files makes
        the fetch scan O(touched_buckets/B x corpus) instead of
        O(corpus). The file-list read loses the catalog's bucket
        metadata (no bucketed-join claim), which the fetch join never
        relied on — the slice side broadcasts. On Iceberg this is the
        ``bucket(B, image_id)`` partition-transform prune (README
        divergence #6)."""
        files_by_bucket = self._bucket_files()
        if not files_by_bucket:
            return self.images
        id_col = F.sha1(F.encode("url", "UTF-8"))
        # F.hash IS Spark's bucketing hash (Murmur3 seed 42)
        buckets = sorted(
            r._b for r in sliced.select(
                F.pmod(F.hash(id_col), F.lit(self.corpus_buckets))
                .alias("_b")
            ).distinct().collect()
        )
        if not buckets or len(buckets) >= len(files_by_bucket):
            return self.images
        files = [f for b in buckets for f in files_by_bucket.get(b, [])]
        if not files:  # slice ids hash only to empty buckets: nothing
            # can match; the left fetch join sees an empty corpus
            return self.images.filter(F.lit(False))
        return self.spark.read.schema(self.images.schema).parquet(*files)

    def _step(
        self, wave: int, frontier: DataFrame, runs_b: DataFrame
    ) -> DataFrame | None:
        # 1. SLICE — per-host politeness-bounded queue heads
        if self._frontier_lsm:
            # dedup + slice + split in the slice's own exchange; rest
            # is a filter over the checkpointed ranked split point.
            # eager=False: the split-point checkpoint materializes
            # inside the seen-delta count below (a full scan of
            # sliced), not as its own job (round 6)
            sliced, rest = slice_split(frontier, self.budget, self.n_salts,
                                       eager=False)
            # the hot loop dropped the host + run_id strings
            # (_trim_frontier); everything downstream of the slice
            # (fetch politeness groups, results/events schemas,
            # metrics) wants them — re-derive on the budget-bounded
            # slice only (the ordinal rides along as _run_ord for the
            # ord-space seen-delta projection below)
            sliced = self._rehost(self._rerun_id(sliced)).cache()
        else:
            sliced = top_k_per_host(frontier, self.budget, self.n_salts).cache()
            # frontier is hash-partitioned+sorted by STATE_KEYS from the
            # previous merge — the anti-join moves only the small slice
            rest = frontier.join(
                sliced.select(*STATE_KEYS), STATE_KEYS, "left_anti"
            )

        # 3a. SEEN delta (materialized FIRST — round 6): the count job
        #    below is the wave's cache-populating action on the slice,
        #    its row count doubles as the loop's emptiness signal (an
        #    empty slice ⟺ an empty frontier, so run() needs no
        #    per-wave isEmpty action) and it bounds the fetch-prune id
        #    collect (a <= n_delta plain collect instead of a
        #    distinct+limit exchange; _pruned_images).
        #    Lazy checkpoint + count(): the count job IS the
        #    materialization (eager=True would run the same job
        #    internally), so the delta's row count comes for free —
        #    it feeds the filter-delta broadcast bound below.
        seen_delta = sliced.select(
            "_key",
            # ord space when trimming: the delta folds into the
            # ord-space seen base and feeds the STATE_KEYS admit join
            (F.col("_run_ord").alias("run_id")
             if "_run_ord" in sliced.columns else F.col("run_id")),
            "url", F.col("depth").alias("best_depth")
        ).localCheckpoint(eager=False)
        n_delta = seen_delta.count()
        if n_delta == 0:
            # frontier exhausted: the slice of a (deduped) frontier is
            # empty iff the frontier is — signal run() to stop without
            # committing anything for this wave
            sliced.unpersist()
            return None
        self._seen_deltas.append(seen_delta)
        if self._state_rows_bound is not None:
            self._state_rows_bound += n_delta
        if self.bloom_mode in ("sharded", "cuckoo"):
            # the wave's filter add-delta is the SAME key set — a
            # projection of the checkpoint above, no extra
            # materialization; O(delta) per-wave filter maintenance
            self._filter_deltas.append(
                ("add", seen_delta.select(F.col("_key").alias("k"))))
            self._filter_delta_keys += n_delta
            if self._filter_delta_keys > self.filter_delta_max_keys:
                # enforce the probe-broadcast bound: fold the stack
                # into the shard base now instead of broadcasting an
                # oversized exact-membership frame this wave
                self._fold_filter()

        # incremental bloom maintenance: this wave's fetches ARE the new
        # seen entries; add their keys via distributed partial bitmaps
        if self._bloom is not None:
            self._bloom.merge(
                build_bloom_from_df(
                    sliced.select(F.col("_key").alias("k")), "k",
                    self.bloom_capacity,
                )
            )
        # sharded/cuckoo filter maintenance is LSM-deferred: the wave's
        # add keys ride the seen delta's checkpoint (3a) onto the
        # _filter_deltas stack; shards rewrite only at _fold_filter

        # 2. FETCH — equi-join against the image+caption corpus, pruned
        #    to the slice's ids (O(slice) corpus reads; _pruned_images —
        #    n_delta bounds the id collect)
        fetched = sliced.withColumn("image_id", F.sha1(F.encode("url", "UTF-8"))) \
            .join(self._pruned_images(sliced, n_delta), "image_id", "left")
        if self.use_token_bucket:
            fetched = fetch_with_token_bucket(
                fetched, POLITENESS_INTERVAL_S, wave, self.budget
            )
        if self.verify_fetch:
            # per-row image invariant (input_hint): decode + PSNR gate,
            # Arrow-batched mapInPandas (pipeline/multimodal.py)
            from moca_spark.pipeline.multimodal import verify_images

            v = verify_images(
                fetched.filter(F.col("bytes").isNotNull())
                .select("image_id", "bytes", "w", "h", "fmt", "phash")
            ).select("image_id", "psnr", "psnr_ok")
            fetched = fetched.join(v, "image_id", "left")
        else:
            fetched = fetched.withColumn(
                "psnr_ok", F.lit(None).cast("boolean")
            )
        results_w = fetched.select(
            "run_id",
            F.lit(wave).alias("wave"),
            "host",
            "rank",
            "url",
            "depth",
            F.col("bytes").isNotNull().alias("fetched"),
            F.sha1(F.col("bytes")).alias("content_hash"),
            "caption",
            "phash",
            "psnr_ok",
            F.concat_ws("/", "run_id", F.lit(wave).cast("string"), "image_id")
            .alias("content_uri"),
            # politeness schedule: rank-th fetch of this host's wave
            (
                F.col("fetch_time_s")
                if self.use_token_bucket
                else (
                    F.lit((wave - 1) * self.budget * POLITENESS_INTERVAL_S)
                    + (F.col("rank") - 1) * POLITENESS_INTERVAL_S
                ).cast("double")
            ).alias("fetch_offset_s"),
        )

        # 4. EXPAND — max-depth gates the PARENT (MaxDepthCriteria)
        parents_src = fetched.filter(F.col("bytes").isNotNull())
        if "_run_ord" in fetched.columns and self._run_ords is not None:
            # trim mode (round 6): the per-run criteria are driver-side
            # constants and the ordinal is already on every row, so the
            # criteria columns attach as O(1) literal-array lookups —
            # the per-wave runs broadcast join (a broadcast-build job
            # each wave) disappears. Bounded by runid_trim_max_runs
            # (<= 4096 literals per array), exactly like _rerun_id.
            by_id = {r["run_id"]: r for r in self.runs}

            def _crit(col: str) -> F.Column:
                arr = F.array(*[F.lit(by_id[rid][col])
                                for rid in self._run_ords])
                return F.element_at(arr, F.col("_run_ord") + 1)

            for c in ("criteria_name", "max_depth", "same_host",
                      "same_domain", "robots_txt"):
                parents_src = parents_src.withColumn(c, _crit(c))
        else:
            parents_src = parents_src.join(
                runs_b.drop("seed_url", "seed_seq"), "run_id")
        parents = (
            parents_src
            .filter((F.col("max_depth") < 0) | (F.col("depth") < F.col("max_depth")))
            .select(
                "run_id", "criteria_name", "same_host", "same_domain",
                "robots_txt",
                F.col("url").alias("src_url"),
                # the REAL host (criteria R3 compares hosts) — the
                # frontier 'host' column is the partition key, which
                # differs under a non-default partition_selector (U3)
                url_host(F.col("url")).alias("src_host"),
                # PSL domains need a pandas UDF (Arrow round-trip); skip
                # it when no run's criteria and no custom filter can
                # look at domains
                (
                    domain_udf(url_host(F.col("url")))
                    if self._needs_domains()
                    else F.lit(None).cast("string")
                ).alias("src_domain"),
                (F.col("depth") + 1).alias("depth"),
                F.col("rank").alias("parent_rank"),
                # ord passthrough (trim mode): candidates inherit the
                # parent's run ordinal so the consolidation below needs
                # no string keys and no extra mapping join
                *([F.col("_run_ord")]
                  if "_run_ord" in fetched.columns else []),
            )
        )
        links = self._pruned_links(parents)
        # deliberate join strategy (round 6): the parent side is
        # bounded by the slice (n_delta rows, known exactly) — when it
        # is provably small, hint the broadcast instead of leaving the
        # strategy to AQE's runtime size estimate. Above the bound the
        # AQE path (runtime broadcast + skew join) stands.
        if n_delta <= self.expand_broadcast_max:
            parents = F.broadcast(parents)
        cand = (
            parents.join(links, ["src_url", "src_host"])
            .withColumn("dst_host", url_host(F.col("dst_url")))
            .withColumn(
                "dst_domain",
                domain_udf(F.col("dst_host"))
                if self._needs_domains()
                else F.lit(None).cast("string"),
            )
        )
        cand = apply_criteria(cand, self.robots, self.custom_by_name)

        # 5. DEDUP — consolidate, then classify vs seen (re-crawl on
        #    strictly smaller depth)
        # Consolidation groups by EXACTLY the state keys (round 6):
        # dst_host is a pure function of dst_url (url_host), so it
        # rides as first() instead of a group key — the aggregate's
        # output partitioning (_key, run, url) then matches the admit
        # join's clustering, and its SortAggregate ordering doubles as
        # the join's sort: in the fused plan below the candidates cross
        # ONE exchange between expansion and admission, with zero extra
        # sort. The state key is computed BEFORE consolidation (it
        # needs the run_id STRING, still on cand rows); in trim mode
        # the groupBy runs in ord space — the run_id string never
        # enters the consolidation exchange. Grouping by (_run_ord,
        # dst_url) is the same partition of rows as (run_id, dst_url):
        # the ordinal <-> run_id map is a bijection.
        rcol = "_run_ord" if "_run_ord" in cand.columns else "run_id"
        cand2 = (
            cand.withColumn("_key", self._seen_key(url_col="dst_url"))
            .groupBy("_key", rcol, "dst_url")
            .agg(F.min(F.struct("depth", "parent_rank")).alias("m"),
                 F.first("dst_host").alias("dst_host"))
            .select(
                F.col(rcol).alias("run_id"),
                F.col("dst_url").alias("url"),
                F.col("dst_host").alias("host"),
                F.col("m.depth").alias("depth"),
                F.col("m.parent_rank").alias("parent_rank"),
                "_key",
            )
        )
        # Checkpoint cand2 only when something consumes it twice (the
        # approximate-filter paths probe it AND route both halves
        # onward). On the plain exact path it has exactly ONE consumer
        # — the admission join — so the wave FUSES expand → criteria →
        # consolidate → admit → project into the single `fresh`
        # materialization below (one job instead of two per wave; the
        # broadcast hint above keeps the expand join sane without AQE
        # when the parent side is provably small, and above the hint
        # bound the checkpoint returns so the skew-prone expand join
        # keeps AQE).
        fuse = (self.bloom_mode is False
                and n_delta <= self.expand_broadcast_max)
        if not fuse:
            cand2 = cand2.localCheckpoint(eager=True)
        fresh_cols = [
            "_key", "run_id", "url",
            # lsm hot loop carries the politeness hash only; the value
            # is identical to xxhash64 of the host column the merged
            # path carries (host ≡ partition_selector(url))
            (F.xxhash64(self.partition_selector(F.col("url")))
             .alias("host_key")
             if self._frontier_lsm
             else self.partition_selector(F.col("url")).alias("host")),
            "depth",
            (F.lit(wave * SEQ_WAVE_STRIDE) + F.col("parent_rank")).alias("seq"),
        ]
        if self._bloom is not None:
            # Bloom pre-filter (J1 north rule): a MISS is definitive —
            # those rows are admitted without touching the seen table;
            # HITs go to the exact join, which alone decides (false
            # positives cost join work, never correctness).
            # the previous wave's broadcast is fully consumed once that
            # wave's state materialized — release it or a long crawl
            # leaks waves × bloom-size on driver and executors
            if self._bloom_bc is not None:
                self._bloom_bc.unpersist()
            bloom_bytes = self._bloom_bc = \
                self.spark.sparkContext.broadcast(self._bloom.to_bytes())

            @pandas_udf(BooleanType())
            def maybe_seen(keys: pd.Series) -> pd.Series:
                bf = BloomFilter.from_bytes(bloom_bytes.value)
                return pd.Series(bf.contains_many(keys.to_numpy()))

            tagged = cand2.withColumn("_maybe", maybe_seen(F.col("_key")))
            definitely_new = tagged.filter(~F.col("_maybe")).select(*fresh_cols)
            checked = self._admit_unseen(
                tagged.filter(F.col("_maybe"))
            ).select(*fresh_cols)
            fresh = definitely_new.unionByName(checked)
        elif self.bloom_mode == "sharded":
            tagged = self._probe_filter(cand2)
            definitely_new = tagged.filter(~F.col("_maybe_seen")).select(*fresh_cols)
            checked = self._admit_unseen(
                tagged.filter(F.col("_maybe_seen"))
            ).select(*fresh_cols)
            fresh = definitely_new.unionByName(checked)
        elif self.bloom_mode == "cuckoo":
            # deletable-filter variant of the sharded-bloom path
            tagged = self._probe_filter(cand2)
            definitely_new = tagged.filter(~F.col("_maybe_seen")) \
                .select(*fresh_cols)
            checked_full = self._materialize(self._admit_unseen(
                tagged.filter(F.col("_maybe_seen")), keep_flag=True
            ), aqe_off=not self._small_state())
            # small: filter-hit admissions; with a big state AQE-off
            # keeps the base side of the admit join exchange-free
            fresh = definitely_new.unionByName(
                checked_full.select(*fresh_cols))
            # T8 + deletability: evict fingerprints of re-admitted URLs
            # so the hit set stays tight under re-crawls. PASS-only
            # discipline holds: a deleted entry re-routes future
            # candidates into the frontier min-merge (harmless dup),
            # never drops one — and the URL is re-inserted when its
            # re-crawl is sliced. The eviction is a stacked del-delta
            # applied at fold time (per-shard, on executors).
            # stacked UNCONDITIONALLY: deciding emptiness here would
            # cost a per-wave driver action (a job over checked_full),
            # and an empty del frame is free at fold time — its shard
            # set is empty, so it touches nothing
            dels = checked_full.filter(F.col("_was_seen")) \
                .select(F.col("_key").alias("k"))
            self._filter_deltas.append(("del", dels))
        else:
            fresh = self._admit_unseen(cand2).select(*fresh_cols)
        # Materialization: the admit joins against the seen base plan
        # here, so with a big state the AQE-off planning keeps the base
        # side exchange-free/sort-free (see _materialize); with a
        # provably small state the joins broadcast instead and AQE
        # stays on to coalesce the tiny stages. Also makes `fresh`
        # single-compute for its two consumers (merge + events).
        fresh = self._materialize(fresh, aqe_off=not self._small_state())

        # 6. MERGE — frontier keeps min (depth, seq) per (run, url).
        # LSM mode defers the min-merge into next wave's slice_split:
        # the union is lazy over two checkpoints (ranked-rest + fresh),
        # so no per-wave merge exchange, agg, or materialization.
        if self._frontier_lsm:
            frontier_new = rest.unionByName(fresh)
        else:
            frontier_new = merge_frontier(rest, fresh)

        # 7. COMMIT — results first (one materialization), metrics
        #    derived from the checkpointed results (A7 lineage), then
        #    the state snapshot + marker (the atomic journal commit)
        results_c = self._checkpoint_increment(wave, "results", results_w)
        if self.collect_metrics:
            metrics_w = (
                results_c.groupBy("host")
                .agg(
                    F.count("*").alias("scheduled"),
                    F.sum(F.col("fetched").cast("long")).alias("fetched"),
                )
                .withColumn("wave", F.lit(wave))
                .withColumn("partition_id", F.spark_partition_id())
            )
            self._checkpoint_increment(wave, "metrics", metrics_w)
        if self.durable == "eventlog":
            # O(delta) durable append; the live state is chained in
            # memory (localCheckpoint) — the journal is read back ONLY
            # on resume and after compaction, never per wave (a
            # per-wave O(|log|) re-aggregation would dominate at scale).
            events = sliced.select(
                "run_id", "url", "host", "depth", "seq",
                F.lit("consume").alias("kind"), F.lit(wave).alias("wave"),
            ).unionByName(
                # the journal schema keeps the host + run_id strings
                # (cross-version replay); fresh is trimmed in lsm mode
                # — re-derive on the O(delta) add rows at append time
                (self._rehost(self._rerun_id(fresh), drop_key=True)
                 if self._frontier_lsm else fresh).select(
                    "run_id", "url", "host", "depth", "seq",
                    F.lit("add").alias("kind"), F.lit(wave).alias("wave"),
                )
            )
            self.store.append_events(wave, events)
            frontier_out = (
                frontier_new if self._frontier_lsm
                else self._materialize(frontier_new, sort=True)
            )
        elif self.durable:
            # snapshot mode writes full state every wave anyway, so the
            # deltas fold every wave and the committed state is re-read
            # (lineage = one scan)
            frontier_out, seen_rd = self.store.commit_wave(
                wave, frontier_new, self._fold_seen(), None, None
            )
            self._seen_base = seen_rd
        else:
            frontier_out = (
                frontier_new if self._frontier_lsm
                else self._materialize(frontier_new, sort=True)
            )
        if len(self._seen_deltas) >= self.fold_every:
            self._fold_seen()
        sliced.unpersist()
        return frontier_out
