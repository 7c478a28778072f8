"""shaper_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of taleshape-com/shaper (SQL dashboards,
render-type inference, JSON ingestion with schema evolution, scheduled
SQL tasks, exports) plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Reference (behavior only, not code): /root/reference — a Go server
embedding DuckDB. This package re-expresses the same capabilities on
Spark SQL / Catalyst / Structured Streaming.
"""

from __future__ import annotations

__version__ = "0.1.0"
