"""Scale extensions: training-data pipeline operators beyond the
reference surface (SURVEY.md §7.1 `scale/`).

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (quality scoring, token counting,
fingerprinting) and multimodal binary-column plumbing — all designed
partition-parallel for the 100 TB target and oracle-checkable where
the semantics are deterministic.
"""
