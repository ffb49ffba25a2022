"""Test-only replay staging for the streaming S-tests.

Materializes the ``events`` table as ts-ordered Parquet chunks that
``read_event_stream`` consumes one micro-batch at a time. Lives under
``tests/`` (not the package) because it deliberately collects the
fixture table to pandas — a driver-side materialization that is fine at
fixture scale (sf0.001, ~6 k rows) and must never sit in a package code
path (the engine's no-collect invariant, README "Scale posture").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from aw3d30_parquet_spark.session import register_views

#: hard ceiling: staging is a fixture tool, never a data-plane path
_MAX_REPLAY_ROWS = 1_000_000


def stage_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    stage_dir: str,
    n_chunks: int = 8,
    duplicate_every: int = 0,
    duplicate_jitter_s: int = 0,
) -> None:
    """Materialize ``events`` as ``n_chunks`` ts-ordered Parquet files.

    Chunk k holds the k-th contiguous ts-range slice, written one file
    per chunk with strictly increasing mtimes so the file stream source
    replays them in event-time order. ``duplicate_every > 0`` re-appends
    every k-th row of each chunk (intra- and cross-batch duplicates for
    the stateful-dedup test S4); ``duplicate_jitter_s`` shifts each
    injected duplicate's event time forward (the broker-re-stamp retry
    case for the within-watermark dedup test S8).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    register_views(spark, sf_dir)
    events = spark.table("events").orderBy("ts", "event_id")
    n = events.count()
    if n > _MAX_REPLAY_ROWS:
        raise ValueError(
            f"replay staging is fixture-scale only ({n} rows > "
            f"{_MAX_REPLAY_ROWS}); stream from the real source instead"
        )
    pdf = events.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    os.makedirs(stage_dir, exist_ok=True)
    size = (len(pdf) + n_chunks - 1) // n_chunks
    t0 = 1_700_000_000  # synthetic arrival clock: chunk k arrives at t0+k
    prev = None
    for k in range(n_chunks):
        chunk = pdf.iloc[k * size : (k + 1) * size]
        if chunk.empty:
            continue
        if duplicate_every:
            # intra-batch dups from this chunk + cross-batch dups from the
            # previous chunk (exercises state carried across micro-batches)
            dups = [chunk.iloc[::duplicate_every]]
            if prev is not None:
                dups.append(prev.iloc[::duplicate_every])
            if duplicate_jitter_s:
                dups = [
                    d.assign(
                        ts=(
                            d["ts"] + pd.Timedelta(seconds=duplicate_jitter_s)
                        ).astype("datetime64[us]")
                    )
                    for d in dups
                ]
            chunk = pd.concat([chunk, *dups], ignore_index=True)
            chunk["ts"] = chunk["ts"].astype("datetime64[us]")
            prev = pdf.iloc[k * size : (k + 1) * size]
        path = os.path.join(stage_dir, f"chunk-{k:04d}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), path)
        os.utime(path, (t0 + k, t0 + k))
