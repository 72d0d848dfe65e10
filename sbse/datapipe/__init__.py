"""Training-data pipeline operators over document/embedding tables.

First-class components alongside the core rollup engine: deduplication
(exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity search (brute-force
cosine, LSH-bucketed ANN), text analysis (quality, language heuristic, token
counting, fingerprinting), and multimodal binary-column plumbing.
"""
