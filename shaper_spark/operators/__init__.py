"""Large-scale training-data pipeline operators, Spark-first.

These go beyond the reference's own surface (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal columns. Every
operator is a composition of built-in DataFrame ops (posting-list joins,
LSH banding) rather than driver-side loops, so the same code runs on a
1000-executor cluster.
"""
