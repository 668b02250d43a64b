"""Training-data pipeline operator tests: text, dedup, ANN, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from moca_spark.pipeline.ann import brute_force_topk, ivf_topk, lsh_topk
from moca_spark.pipeline.dedup import (
    cosine_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_near_dups,
    shingles,
    simhash_near_dups,
)
from moca_spark.pipeline.multimodal import (
    image_features,
    phash_near_dups,
    resize_images,
    verify_images,
)
from moca_spark.pipeline.text import with_text_features
from moca_spark.sources.synth import images_for_urls

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "The quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "The quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
    (4, "Der schnelle braune Fuchs springt und das ist ein ganz anderer Satz hier"),
    (5, "completely different content about spark dataframes and shuffle behavior"),
    (6, "  the   QUICK brown fox jumps over the lazy dog near the river bank today "),  # ws/case dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = exact_dedup(docs).collect()
    groups = {r.keep_id: r.n_dups for r in out}
    assert groups[1] == 3  # 1, 2, 6 collapse after normalization
    assert groups[3] == 1 and groups[4] == 1 and groups[5] == 1


def test_shingles_and_jaccard(spark, docs):
    sh = shingles(docs, n=3)
    pairs = spark.createDataFrame([(1, 3)], ["a", "b"])
    j = jaccard_pairs(sh, pairs).collect()[0]
    # 14 words -> 12 shingles; docs 1 and 3 differ in the 13th word
    # ("bank" -> "bend") -> 2 shingles touched: intersection 10, union 14
    assert j.n_a == 12 and j.n_b == 12
    assert j.n_inter == 10
    assert abs(j.jaccard - 10 / 14) < 1e-6


def test_minhash_near_dups(docs):
    out = minhash_near_dups(docs, num_perm=32, bands=8, threshold=0.5)
    pairs = {(r.a, r.b) for r in out.collect()}
    assert (1, 2) in pairs and (1, 6) in pairs and (2, 6) in pairs  # exact dups
    assert (1, 3) in pairs  # near dup (jaccard 0.6)
    assert not any(5 in p for p in pairs)


def test_simhash_near_dups(docs):
    out = simhash_near_dups(docs)
    pairs = {(r.a, r.b) for r in out.collect()}
    assert {(1, 2), (1, 6), (2, 6)} <= pairs  # identical after normalize
    assert not any(5 in p for p in pairs)


def test_cosine_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {(r.a, r.b): r.cosine for r in cosine_pairs(emb, threshold=0.9).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.99
    assert (1, 3) not in out


@pytest.fixture(scope="module")
def emb_corpus(spark):
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(60, 8)).round(4)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), vecs


def test_brute_force_topk_matches_numpy(spark, emb_corpus):
    corpus, vecs = emb_corpus
    q = spark.createDataFrame([(0, [float(x) for x in vecs[0]])],
                              ["q_id", "embedding"])
    got = [r.vec_id for r in brute_force_topk(q, corpus, k=5).orderBy("rnk").collect()]
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    want = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
    assert got == [int(w) for w in want]


def test_lsh_topk_recall(spark, emb_corpus):
    corpus, vecs = emb_corpus
    q = spark.createDataFrame([(0, [float(x) for x in vecs[0]])],
                              ["q_id", "embedding"])
    exact = {r.vec_id for r in brute_force_topk(q, corpus, k=5).collect()}
    approx = {r.vec_id for r in lsh_topk(q, corpus, dim=8, k=5, bits=16, bands=8).collect()}
    assert len(exact & approx) >= 3  # recall >= 0.6 with generous bands
    assert 0 in approx  # the vector itself always found


def test_ivf_topk_finds_self(spark, emb_corpus):
    corpus, vecs = emb_corpus
    q = spark.createDataFrame([(7, [float(x) for x in vecs[7]])],
                              ["q_id", "embedding"])
    got = ivf_topk(q, corpus, dim=8, k=3, n_cells=8, n_probe=4).collect()
    assert got and got[0].vec_id == 7 and got[0].cosine == 1.0


def test_text_features(spark, docs):
    out = {r.doc_id: r for r in with_text_features(docs).collect()}
    assert out[4].lang_pred == "de"
    assert out[1].lang_pred == "en"
    assert out[1].fingerprint == out[2].fingerprint == out[6].fingerprint
    assert out[1].n_words == 14
    assert 0.0 <= out[1].quality <= 1.0
    assert out[1].n_tokens >= 13


def test_verify_and_features_images(spark):
    urls = [f"http://img.test/{i}" for i in range(8)]
    images = images_for_urls(spark, urls)
    v = verify_images(images).collect()
    assert len(v) == 8
    assert all(r.decoded and r.psnr_ok and r.phash_match for r in v)
    feats = image_features(images).collect()
    assert all(0 <= r.brightness <= 255 for r in feats)
    ph = {r.image_id: r.phash for r in feats}
    want = {r.image_id: r.phash for r in images.select("image_id", "phash").collect()}
    assert ph == want


def test_resize_images(spark):
    images = images_for_urls(spark, ["http://img.test/r1"])
    out = resize_images(images, 8, 8).collect()[0]
    from moca_spark.sources.png import decode_png

    assert decode_png(bytes(out.bytes)).shape == (8, 8, 3)


def test_phash_near_dups(spark):
    images = images_for_urls(spark, [f"http://img.test/{i}" for i in range(6)])
    # duplicate one image under a different id: hamming 0 pair must appear
    dup = images.limit(1).withColumn("image_id", F.lit("dup-of-first"))
    all_imgs = images.unionByName(dup)
    pairs = phash_near_dups(all_imgs, max_hamming=2).collect()
    assert any(r.hamming == 0 for r in pairs)


def test_phash_near_dups_adversarial_spread_recall(spark):
    """Recall guarantee within the radius: flips spread so that EVERY
    16-bit quarter of the hash differs (the round-1 4-band scheme
    missed these pairs at hamming 4-6). With bands > max_hamming the
    pigeonhole guarantee is real: one band must be untouched."""
    base = 0x123456789ABCDEF0
    cases = {
        # one flipped bit in each 16-bit quarter -> hamming 4
        "spread4": base ^ ((1 << 3) | (1 << 19) | (1 << 35) | (1 << 51)),
        # 2+2+1+1 across the quarters -> hamming 6
        "spread6": base ^ ((1 << 0) | (1 << 5) | (1 << 17) | (1 << 22)
                          | (1 << 40) | (1 << 60)),
    }
    rows = [("base", base)] + [(k, v) for k, v in cases.items()]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {(r.a, r.b): r.hamming
             for r in phash_near_dups(df, max_hamming=6).collect()}
    assert pairs[("base", "spread4")] == 4
    assert pairs[("base", "spread6")] == 6


def test_connected_components_long_chain(spark):
    """Pointer doubling closes a diameter-300 chain in O(log d) rounds;
    the old one-hop propagation needed 300. Also: exhausting max_iter
    must raise, never return under-merged labels."""
    import pytest as _pytest

    from moca_spark.pipeline.clusters import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], ["a", "b"]
    ).coalesce(4)
    comp = connected_components(pairs, max_iter=15).collect()
    assert all(r.component == 0 for r in comp)
    assert len(comp) == 301
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_no_row_python_in_pipeline_plans(spark, docs):
    plan = minhash_near_dups(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_connected_components_chain_and_islands(spark):
    from moca_spark.pipeline.clusters import connected_components

    # chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["a", "b"],
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_dedup_decisions_end_to_end(spark, docs):
    """Full pipeline: minhash near-dup pairs -> components -> keep/drop.
    Docs 1,2,3,6 form one near-dup family (keep 1); 4,5 stand alone."""
    from moca_spark.pipeline.clusters import dedup_decisions
    from moca_spark.pipeline.dedup import minhash_near_dups

    pairs = minhash_near_dups(docs, num_perm=32, bands=8, threshold=0.5)
    out = {r.doc_id: (r.component, r.keep)
           for r in dedup_decisions(docs, pairs).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[6] == (1, False)
    assert out[4] == (4, True)
    assert out[5] == (5, True)
