"""Result canonicalization + DuckDB oracle harness (t2 gate, SURVEY §5.2).

Canonicalization rules (SURVEY §2.3): floats at FULL precision via
``repr`` (STRICT — int/float dtype skew and ulp drift must fail here,
not only in the driver; queries are responsible for producing
bit-identical values on both engines), naive datetimes ISO-8601 with
microseconds, dates midnight-datetimes, null ``\\N``; columns sorted by
name; rows sorted; SHA-256 over ``|``-joined cells. Matches the
driver's order-insensitive value-hash contract.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os
import pandas as pd


def _cell(v) -> str:
    if v is None or v is pd.NaT:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "\\N"
        # STRICT: render full precision and keep the int/float dtype
        # distinction visible ("5927098" != "5927098.0"). The driver's
        # canonicalizer does not collapse integral floats — DuckDB's
        # HUGEINT sum() surfacing as float64 must be fixed in the oracle
        # SQL (CAST ... AS BIGINT), not papered over here.
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "\\N"
        return v.to_pydatetime().strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        # DuckDB hands DATE back as midnight datetime64, Spark as
        # datetime.date — render both as midnight datetimes.
        return v.strftime("%Y-%m-%dT00:00:00.000000")
    if v is pd.NaT or (isinstance(v, type(pd.NA)) and v is pd.NA):
        return "\\N"
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[str]:
    """Columns sorted by name, each cell canonicalized, rows sorted."""
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        "|".join(_cell(v) for v in rec)
        for rec in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def canonical_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in canonical_rows(pdf):
        h.update(row.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def duckdb_connection(sf_dir: str):
    """In-memory DuckDB with the ten testdata tables registered as views
    (mirrors the driver's pre-registered oracle environment)."""
    import duckdb

    from aw3d30_parquet_spark.session import TABLES

    con = duckdb.connect(":memory:")
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def compare(spark_df, con, sql: str) -> tuple[bool, str, str]:
    """Run a Spark DataFrame and a DuckDB SQL; return (match, h1, h2)."""
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).df()
    h1, h2 = canonical_hash(spark_pdf), canonical_hash(duck_pdf)
    return h1 == h2, h1, h2
