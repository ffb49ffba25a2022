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

# Lazy re-exports (PEP 562): the package itself must import without a
# Spark installation so DuckDB-only tooling can load the oracle-SQL
# modules (``queries``, ``constants``) standalone; ``session`` (and
# with it pyspark) loads on first attribute access.
__all__ = ["get_spark", "register_views"]
__version__ = "0.1.0"


def __getattr__(name: str):
    if name in ("get_spark", "register_views"):
        from aw3d30_parquet_spark import session

        return getattr(session, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
