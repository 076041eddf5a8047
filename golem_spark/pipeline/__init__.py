"""Large-scale training-data pipeline operators.

Beyond the reference's GLM surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), similarity search over embeddings (brute-force
cosine top-k + LSH-bucketed ANN), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal column plumbing.

Every operator is pure DataFrame API (JVM-side expressions, no Python
UDFs in the hot path) and carries a DuckDB-oracle SQL twin in
golem_spark.pipeline.kernels for the correctness gate.
"""
