"""LLM-data-pipeline operator surface: text analysis, dedup, vectors.

``EXTENDED_QUERIES`` / ``EXTENDED_ORACLE_SQL`` aggregate the
driver-checkable entries contributed by each module (a query may omit
its oracle when the semantics are not SQL-expressible — the driver then
records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

EXTENDED_QUERIES: dict[str, Callable] = {}
EXTENDED_ORACLE_SQL: dict[str, str] = {}


def _register(queries: dict, oracles: dict) -> None:
    EXTENDED_QUERIES.update(queries)
    EXTENDED_ORACLE_SQL.update(oracles)


def _load() -> None:
    from aw3d30_parquet_spark.functions import (
        dedup,
        multimodal,
        pipeline,
        text,
        udfs,
        vectors,
    )

    for mod in (text, dedup, vectors, multimodal, udfs, pipeline):
        _register(mod.QUERIES, mod.ORACLE_SQL)


_load()
