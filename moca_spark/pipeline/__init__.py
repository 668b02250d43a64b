"""Training-data pipeline operators over the crawl output.

A 100 TB crawl corpus is training data; these are the standard
large-scale curation operators, each DataFrame-first:

- dedup.py       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                 embedding-cosine near-dup
- ann.py         similarity search: brute-force cosine top-k baseline
                 + LSH-bucketed scale path
- text.py        language-ID, quality scoring, token counting,
                 rolling-hash fingerprinting
- multimodal.py  binary image columns: decode / verify / feature
                 extraction via Arrow-batched mapInPandas
"""
