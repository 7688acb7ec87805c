"""Engine operators that go beyond single Spark built-ins.

Each module composes DataFrame primitives into a reusable operator the
reference's users (and a 100 TB training-data pipeline) need:

- asof:       time-series as-of join (union + last-observation window)
- dedup:      exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- similarity: cosine top-k (brute force) and LSH-bucketed ANN
- text:       tokenization, language ID, quality scoring, TF-IDF,
              document fingerprinting
- multimodal: binary-column plumbing with Arrow-batched decode hooks
"""
