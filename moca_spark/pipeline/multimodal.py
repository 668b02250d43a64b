"""Multimodal column operators: binary image payloads + typed metadata.

The corpus keeps media as opaque ``binary`` columns with typed
metadata (w, h, fmt — BASELINE.json input_hint); all decode/featurize
work runs in Arrow-batched ``mapInPandas`` so bytes never take the
row-at-a-time Python path.

Real here: PNG decode (sources/png.py, pure Python + numpy), PSNR
verification against the deterministic source pixels, perceptual-hash
recompute, resize (nearest-neighbor, numpy), and frame-ish stats.
Stubbed (no image/audio libs in this container, marked explicitly):
JPEG entropy decode, audio/video codecs — the Spark-side plumbing
(schema, batch shape, partitioning) is identical, swap the inner
function for PIL/ffmpeg in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moca_spark.sources.png import average_hash64, decode_png, psnr
from moca_spark.sources.synth import gen_pixels

VERIFY_SCHEMA = (
    "image_id string, fmt string, w int, h int, "
    "decoded boolean, psnr double, psnr_ok boolean, phash_match boolean"
)

FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "brightness double, contrast double, phash bigint"
)


def _decode(fmt: str, data: bytes) -> np.ndarray:
    if fmt in ("png", "jpeg"):
        # 'jpeg' rows in the synthetic corpus are 6-bit-quantized PNG
        # bytes (sources/png.py stand-in). A real deployment dispatches:
        #   if fmt == "jpeg": return np.asarray(PIL.Image.open(...))
        return decode_png(data)
    raise NotImplementedError(f"decoder for fmt={fmt!r} not available here")


def verify_images(images: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Per-row decode + invariant check (input_hint): decoded pixels
    PSNR >= 40 dB vs the deterministic source, phash consistent."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = _decode(r.fmt, bytes(r.bytes))
                    src = gen_pixels(r.image_id, r.w, r.h)
                    p = psnr(src, px)
                    rows.append(
                        (r.image_id, r.fmt, r.w, r.h, True,
                         float(min(p, 1e6)), bool(p >= min_psnr),
                         average_hash64(px) == r.phash)
                    )
                except (NotImplementedError, ValueError):
                    rows.append((r.image_id, r.fmt, r.w, r.h, False,
                                 0.0, False, False))
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "w", "h", "decoded",
                               "psnr", "psnr_ok", "phash_match"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt", "phash") \
        .mapInPandas(check, VERIFY_SCHEMA)


def image_features(images: DataFrame) -> DataFrame:
    """Decode → channel means / brightness / contrast / phash. The
    Arrow batch shape (one pdf per partition chunk) is the production
    shape for any per-image featurizer (CLIP embed, OCR, ...)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = _decode(r.fmt, bytes(r.bytes)).astype(np.float64)
                means = px.mean(axis=(0, 1))
                rows.append(
                    (r.image_id, round(means[0], 4), round(means[1], 4),
                     round(means[2], 4), round(float(px.mean()), 4),
                     round(float(px.std()), 4),
                     average_hash64(px.astype(np.uint8)))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "mean_r", "mean_g", "mean_b",
                               "brightness", "contrast", "phash"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(feats, FEATURE_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded PNG — the thumbnail stage.
    Returns (image_id, bytes, w, h)."""
    from moca_spark.sources.png import encode_png

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = _decode(r.fmt, bytes(r.bytes))
                ys = (np.arange(out_h) * px.shape[0] // out_h)
                xs = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[ys][:, xs]
                rows.append((r.image_id, encode_png(small), out_w, out_h))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        rz, "image_id string, bytes binary, w int, h int"
    )


def phash_near_dups(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate images via perceptual-hash hamming distance,
    LSH-style: split the 64-bit phash into n_bands equal bands with
    n_bands > max_hamming — then any pair within hamming<=max_hamming
    shares at least one exact band (pigeonhole: max_hamming differing
    bits cannot touch all n_bands bands). 100% recall within the
    radius; band-bucket join + exact popcount verify, no cross join.

    NOTE the count must strictly exceed max_hamming: 4 bands do NOT
    guarantee recall at hamming 4-6 (6 bits can spread 2+2+1+1 over 4
    bands), which was a round-1 bug."""
    if not 0 <= max_hamming < 64:
        raise ValueError("max_hamming must be in [0, 64)")
    n_bands = next(n for n in (1, 2, 4, 8, 16, 32, 64) if n > max_hamming)
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("phash"), i * band_bits)
            .bitwiseAND(F.lit(mask)).alias("bkey"),
        )
        for i in range(n_bands)
    ])
    banded = images.select("image_id", "phash", F.explode(bands).alias("b")) \
        .select("image_id", "phash", F.col("b.band"), F.col("b.bkey"))
    a = banded.select(F.col("image_id").alias("a"), F.col("phash").alias("pa"),
                      "band", "bkey")
    b = banded.select(F.col("image_id").alias("b"), F.col("phash").alias("pb"),
                      "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "pa", "pb").distinct()
        .withColumn("hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
