"""Engine operators: relational (Q1–Q28) and reusable building blocks."""

from aw3d30_parquet_spark.operators.relational import RELATIONAL_QUERIES

__all__ = ["RELATIONAL_QUERIES"]
