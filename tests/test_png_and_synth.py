"""PNG codec round-trip, PSNR gate, phash, and synthetic corpus tests."""

from __future__ import annotations

import numpy as np

from moca_spark.sources.png import (
    average_hash64,
    decode_png,
    encode_png,
    psnr,
    quantize_lossy,
)
from moca_spark.sources.synth import (
    diamond_graph,
    gen_pixels,
    images_for_urls,
    make_image_row,
    scale_frontier,
    url_id,
    zipf_graph,
)


def test_png_roundtrip_lossless():
    px = gen_pixels("abc123", 33, 17)
    assert px.shape == (17, 33, 3)
    back = decode_png(encode_png(px))
    assert np.array_equal(px, back)
    assert psnr(px, back) == float("inf")


def test_png_decode_all_filters():
    """Decoder must handle filters 1/2/3/4 (encoders in the wild use them)."""
    import struct
    import zlib as z

    from moca_spark.sources.png import _SIG, _chunk

    px = gen_pixels("filters", 16, 8)
    h, w = px.shape[:2]
    stride = w * 3
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        line = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        if ft == 0:
            enc = line
        elif ft == 1:
            left = np.concatenate([[0, 0, 0], line[:-3]])
            enc = (line - left) & 0xFF
        elif ft == 2:
            enc = (line - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([[0, 0, 0], line[:-3]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        else:
            enc = np.empty(stride, np.int32)
            for x in range(stride):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 0xFF
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", z.compress(bytes(raw))) + _chunk(b"IEND", b"")
    assert np.array_equal(decode_png(data), px)


def test_lossy_psnr_between_40_and_inf():
    px = gen_pixels("lossy", 48, 48)
    q = quantize_lossy(px)
    p = psnr(px, q)
    assert 40.0 <= p < 60.0


def test_phash_properties():
    px = gen_pixels("ph", 32, 32)
    h1 = average_hash64(px)
    assert average_hash64(px) == h1  # deterministic
    assert -(1 << 63) <= h1 < (1 << 63)
    # near-duplicate (lossy) stays close in hamming distance
    h2 = average_hash64(quantize_lossy(px))
    ham = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham <= 8
    # different image is far
    h3 = average_hash64(gen_pixels("other", 32, 32))
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") > 8


def test_make_image_row_invariants():
    url = "http://sitea.test/a"
    row = make_image_row(url)
    assert row["image_id"] == url_id(url)
    decoded = decode_png(row["bytes"])
    assert decoded.shape == (row["h"], row["w"], 3)
    assert psnr(gen_pixels(row["image_id"], row["w"], row["h"]), decoded) == float("inf")
    assert row["caption"] == f"caption-{row['image_id'][:12]}"
    lossy = make_image_row(url, lossy=True)
    assert lossy["fmt"] == "jpeg"
    src = gen_pixels(lossy["image_id"], lossy["w"], lossy["h"])
    assert psnr(src, decode_png(lossy["bytes"])) >= 40.0


def test_images_for_urls_spark(spark):
    urls = sorted({u for e in diamond_graph() for u in e})
    df = images_for_urls(spark, urls)
    rows = df.collect()
    assert len(rows) == len(urls)
    assert {r.image_id for r in rows} == {url_id(u) for u in urls}
    for r in rows:
        assert decode_png(bytes(r.bytes)).shape == (r.h, r.w, 3)


def test_zipf_graph_is_skewed_and_deterministic():
    g1, g2 = zipf_graph(), zipf_graph()
    assert g1 == g2
    hosts = [s.split("/")[2] for s, _ in g1]
    from collections import Counter

    counts = Counter(hosts)
    assert counts.most_common(1)[0][0] == "host0.test"
    assert counts["host0.test"] > 3 * counts.get("host10.test", 1)


def test_scale_frontier_lazy_and_skewed(spark):
    df = scale_frontier(spark, 100_000, 50, partitions=8)
    assert df.schema.simpleString() == "struct<url:string,host:string,depth:int,seq:bigint>"
    top = df.groupBy("host").count().orderBy("count", ascending=False).limit(3).collect()
    assert top[0]["count"] > 2 * top[2]["count"]  # skew present
    assert df.count() == 100_000
