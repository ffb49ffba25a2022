"""aw3d30_parquet_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(``mbrobbel/aw3d30-parquet``, a single-binary Rust GeoTIFF→Parquet
converter) as an idiomatic Spark engine, and extends it with the
relational / LLM-data-pipeline / streaming operator surface declared in
``SURVEY.md §2``.

Layout:

- ``session``    — SparkSession factory + testdata view registration
- ``queries``    — the declared query contract (Q1–Q28) as DataFrame ops
- ``sources``    — GeoTIFF ingest (tile codec, decoder, partitioned sink)
- ``functions``  — text analysis, dedup, vector similarity kernels
- ``streaming``  — Structured Streaming operators over the events table
- ``plans``      — plan inspection / optimization helpers
"""

from aw3d30_parquet_spark.session import get_spark, register_views

__all__ = ["get_spark", "register_views"]
__version__ = "0.1.0"
