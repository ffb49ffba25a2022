"""aw3d30_parquet_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(``mbrobbel/aw3d30-parquet``, a single-binary Rust GeoTIFF→Parquet
converter) as an idiomatic Spark engine, and extends it with the
relational / LLM-data-pipeline / streaming operator surface declared in
``SURVEY.md §2``.

Layout:

- ``session``    — SparkSession factory + testdata view registration
- ``queries``    — DuckDB oracle SQL for the relational query family
- ``operators``  — relational queries + bucketing / skew / ranking ops
- ``sources``    — GeoTIFF ingest (tile codec, decoder, partitioned
  sink, object-store wiring, raster analytics demo queries)
- ``functions``  — text analysis, dedup, vectors, multimodal, pipeline
- ``streaming``  — Structured Streaming operators over the events table
- ``plans``      — plan inspection / optimization helpers

The full registered surface (the q/a/d/v/t/p/m/g/s/u query families —
see SURVEY.md §2 for the authoritative inventory and counts) is
assembled by ``__spark_entry__.py`` at the repo root.
"""

from aw3d30_parquet_spark.session import get_spark, register_views

__all__ = ["get_spark", "register_views"]
__version__ = "0.1.0"
