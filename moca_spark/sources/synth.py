"""Deterministic synthetic world: image+caption corpus, link graphs,
robots rules.

Stand-ins for the network-facing parts of the reference (FIXTURES.md):
- ``images``  — the fetch corpus (BASELINE.json input_hint schema):
  a crawl "fetch" is an equi-join frontier -> images on image_id,
  replacing the reference's HTTP GET + WebKit render
  (browser/webkit/BrowserWindow.scala:60-70, role/worker/Minion.scala:110-117).
- ``links``   — the synthetic web graph, replacing jsoup a[href]
  extraction (criteria/AHrefCriteria.scala:16-21).
- ``robots``  — per-host disallow prefixes, replacing robots.txt
  fetch+parse (criteria/RobotsTxtCriteria.scala:30-52).

All generation is seeded and wall-clock-free. The corpus generator has
two modes: eager (small fixtures, driver-side) and distributed
(``spark.range``-based mapInPandas, scales to 10^8+ rows without ever
materializing on the driver).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from moca_spark.sources.png import (
    average_hash64,
    encode_png,
    quantize_lossy,
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

LINKS_SCHEMA = "src_url string, dst_url string"


def url_id(url: str) -> str:
    """image_id of a page = SHA-1 hex of its canonical URL (Url.scala:16-20)."""
    return hashlib.sha1(url.encode()).hexdigest()


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels seeded by crc32(image_id):
    smooth gradients + seeded noise (compressible but non-trivial)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            128 + 127 * np.sin(xx / max(w, 1) * np.pi * rng.uniform(0.5, 3)),
            128 + 127 * np.cos(yy / max(h, 1) * np.pi * rng.uniform(0.5, 3)),
            (xx + yy) % 256,
        ],
        axis=2,
    )
    noise = rng.randint(-16, 17, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _dims_for(image_id: str) -> tuple[int, int]:
    hv = int(image_id[:8], 16)
    return 8 + hv % 57, 8 + (hv >> 8) % 57  # w, h in 8..64


def make_image_row(url: str, lossy: bool = False) -> dict:
    """One corpus row for a page URL (FIXTURES.md §1 generation rules)."""
    iid = url_id(url)
    w, h = _dims_for(iid)
    pixels = gen_pixels(iid, w, h)
    if lossy:
        stored = quantize_lossy(pixels)
        fmt = "jpeg"  # documented stand-in: 6-bit-quantized PNG (png.py)
    else:
        stored, fmt = pixels, "png"
    return {
        "image_id": iid,
        "bytes": encode_png(stored),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"caption-{iid[:12]}",
        "phash": average_hash64(stored),
    }


def images_for_urls(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Eager fixture corpus: one image row per page URL; every 7th row
    takes the lossy path to exercise the PSNR gate."""
    rows = [make_image_row(u, lossy=(i % 7 == 3)) for i, u in enumerate(sorted(set(urls)))]
    # via pandas for the Arrow createDataFrame path (see links_df):
    # the fixture corpus is re-scanned every wave's fetch join — the
    # pickle path would run a Python unpickle stage per scan
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA]),
        schema=IMAGES_SCHEMA,
    )


def images_distributed(spark: SparkSession, urls_df: DataFrame) -> DataFrame:
    """Distributed corpus generator: mapInPandas over a DataFrame with a
    ``url`` column. Never touches the driver; scales with partitions.

    The generator is re-spread over the full parallelism before the
    opaque Python stage (round 6, guide §4): PNG synthesis costs ~1 ms
    per row, which Spark cannot see — AQE coalesces the tiny distinct
    down to one partition and would run the whole corpus on a single
    Python worker (measured 2x the warm wall at local[32]). The floor
    keeps cluster-sized distinct outputs unshrunk."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                make_image_row(u, lossy=(zlib.crc32(u.encode()) % 7 == 3))
                for u in pdf["url"]
            ]
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in IMAGES_SCHEMA}
            )

    n_par = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return (
        urls_df.select("url").distinct().repartition(n_par)
        .mapInPandas(gen, IMAGES_SCHEMA)
    )


# --------------------------------------------------------------------------
# Fixture link graphs (shapes required by FIXTURES.md §2, derived from
# PgRunControlTest.scala:42-243 and README.md:264-295)
# --------------------------------------------------------------------------

def chain_graph(host: str = "site0.test", n: int = 5) -> list[tuple[str, str]]:
    """Single-host chain: /0 -> /1 -> ... -> /n-1."""
    base = f"http://{host}"
    return [(f"{base}/{i}", f"{base}/{i+1}") for i in range(n - 1)]


def handoff_graph() -> list[tuple[str, str]]:
    """Two-host handoff: siteA/a -> siteB/a (cross-partition, D5)."""
    return [
        ("http://sitea.test/a", "http://sitea.test/b"),
        ("http://sitea.test/a", "http://siteb.test/a"),
        ("http://siteb.test/a", "http://siteb.test/b"),
    ]


def diamond_graph() -> list[tuple[str, str]]:
    """README.md:264-295 case: two paths to siteA/d at depths 3 and 2."""
    return [
        ("http://sitea.test/a", "http://sitea.test/b"),
        ("http://sitea.test/a", "http://siteb.test/a"),
        ("http://sitea.test/b", "http://sitea.test/c"),
        ("http://sitea.test/c", "http://sitea.test/d"),  # depth 3 path
        ("http://siteb.test/a", "http://sitea.test/d"),  # depth 2 path
        ("http://sitea.test/d", "http://sitea.test/e"),
    ]


def cycle_graph() -> list[tuple[str, str]]:
    """Host cycle: a -> b -> c -> a (termination relies on seen-set)."""
    return [
        ("http://cyc.test/a", "http://cyc.test/b"),
        ("http://cyc.test/b", "http://cyc.test/c"),
        ("http://cyc.test/c", "http://cyc.test/a"),
    ]


def zipf_graph(
    n_hosts: int = 20, pages_per_host: int = 30, seed: int = 42
) -> list[tuple[str, str]]:
    """Zipf host-skewed random graph: host0 gets ~half the pages (the
    hot-host case the salting/skew machinery must handle)."""
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    pages: list[str] = []
    for hi in range(n_hosts):
        cnt = max(2, int(round(probs[hi] * n_hosts * pages_per_host)))
        pages += [f"http://host{hi}.test/p{i}" for i in range(cnt)]
    edges = set()
    for src in pages:
        for _ in range(rng.randint(1, 4)):
            dst = pages[rng.randint(0, len(pages))]
            if dst != src:
                edges.add((src, dst))
    return sorted(edges)


def links_df(spark: SparkSession, edges: list[tuple[str, str]]) -> DataFrame:
    # via pandas so createDataFrame takes the Arrow path (round 6):
    # a plain list of tuples goes through the legacy pickle path,
    # which plans a PythonRDD scan — every later read of the links
    # graph then runs Python workers (a whole per-session worker pool
    # + per-scan round trips) just to unpickle 2 string columns. The
    # Arrow path converts driver-side and scans JVM-only.
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["src_url", "dst_url"]),
        schema=LINKS_SCHEMA,
    )


def robots_df(
    spark: SparkSession, rules: list[tuple[str, str]] | None = None
) -> DataFrame:
    """Per-host disallow prefixes (FIXTURES.md §3); empty by default."""
    rules = rules or []
    return spark.createDataFrame(
        rules or [("", "")], ["host", "disallow_prefix"]
    ).filter(F.col("host") != "") if not rules else spark.createDataFrame(
        rules, ["host", "disallow_prefix"]
    )


def scale_frontier(spark: SparkSession, n_urls: int, n_hosts: int,
                   partitions: int = 64, seed: int = 42) -> DataFrame:
    """Lazy synthetic frontier at arbitrary scale (10^10-ready):
    ``spark.range``-based, Zipf-ish host skew via a power transform on a
    seeded uniform hash — pure column expressions, zero driver memory,
    zero Python. Used by bench.py and the skew tests."""
    # Zipf(s=1) via inverse-CDF: P(rank<=k) ~ ln(k)/ln(n) => rank = n^u.
    return (
        spark.range(0, n_urls, 1, partitions)
        .withColumn("u", (F.abs(F.xxhash64(F.col("id") + F.lit(seed))) %
                          F.lit(1_000_000)) / F.lit(1_000_000.0))
        .withColumn(
            "host_rank",
            F.least(
                F.lit(n_hosts - 1),
                F.floor(F.pow(F.lit(float(n_hosts)), F.col("u"))) - F.lit(1),
            ).cast("long"),
        )
        .select(
            F.concat(
                F.lit("http://host"), F.col("host_rank"), F.lit(".test/p"), F.col("id")
            ).alias("url"),
            F.concat(F.lit("host"), F.col("host_rank"), F.lit(".test")).alias("host"),
            (F.abs(F.xxhash64(F.col("id") + F.lit(seed + 1))) % 10)
            .cast("int")
            .alias("depth"),
            F.col("id").alias("seq"),
        )
    )
