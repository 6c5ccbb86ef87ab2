"""Reusable large-scale data-pipeline operators (the LLM-training-data
surface layered over the decode engine):

- :mod:`.dedup`       — exact, MinHash-LSH, SimHash, n-gram Jaccard,
                        embedding-cosine near-dup
- :mod:`.similarity`  — brute-force cosine top-k, IVF index/search,
                        sign-LSH bucketing
- :mod:`.text`        — stats, quality score, language ID, fingerprints
- :mod:`.multimodal`  — opaque binary columns + Arrow-batched decode
                        plumbing (decoders stubbed; schema/batching real)
- :mod:`.asof`        — generic as-of join (native window plan + cogrouped
                        merge_asof for tolerance/nearest semantics)

All operators take/return DataFrames and are built on native column
expressions wherever semantics allow; Python appears only behind Arrow
batches (`mapInPandas` / cogrouped `applyInPandas`).
"""
