"""Training-data pipeline operators over the documents/embeddings tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(quality stats, token counting, fingerprinting, language-ID heuristic), and
multimodal column plumbing.

All operators are Spark-built-in-first (JVM-side, whole-stage codegen);
NumPy via mapInArrow only where DataFrame ops can't express the semantics
(SimHash bit aggregation, hyperplane LSH).
"""
