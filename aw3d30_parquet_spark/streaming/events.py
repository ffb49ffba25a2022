"""Event-stream operators: replay source, windows, watermark, dedup.

The reference is a batch pipeline — its only "streaming" is download/
convert overlap (reference ``src/main.rs:333-349``). The engine mandate
(SURVEY §2.2 "Streaming") adds real event-stream processing over the
driver's ``events`` table (event-time column ``ts``).

Design: every operator is a pure DataFrame→DataFrame function that works
identically on a batch or streaming input — the *same code* is the
batch oracle and the streaming query, so the S-tests verify
stream↔batch equivalence directly (SURVEY §5.2 S1–S4).

Replay source: the events table re-written as N ts-ordered Parquet
chunks consumed by ``readStream`` with ``maxFilesPerTrigger=1`` — each
chunk is one micro-batch, giving deterministic arrival order for
watermark tests. The chunk *staging* helper lives in
``tests/streaming_replay.py`` — it collects the fixture table to the
driver, which is test-only behavior the package never does. At
production scale the same operators sit on a Kafka/file-arrival source
unchanged; state size is bounded by the watermark (late rows beyond it
are dropped, state for closed windows evicted).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aw3d30_parquet_spark.numeric import round_half_up
from aw3d30_parquet_spark.session import register_views

#: Post-conversion schema of the events view (nanos already truncated to
#: micros TIMESTAMP_NTZ by session.register_views — never read the raw
#: parquet here, its TIMESTAMP(NANOS) needs the legacy conf).
_EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def read_event_stream(spark: SparkSession, stage_dir: str, sf_dir: str) -> DataFrame:
    """File-replay streaming DataFrame with event-time ``ts``."""
    register_views(spark, sf_dir)
    schema = spark.table("events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(stage_dir, "*.parquet"))
        .select(*_EVENTS_COLS)
    )


# ---------------------------------------------------------------------------
# Stream/batch-agnostic operators (the S-test contract: same fn, both modes)
# ---------------------------------------------------------------------------


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """S1: tumbling event-time window — count + value sum per window."""
    return (
        events.groupBy(F.window("ts", duration), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            round_half_up(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "cnt",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """S2: sliding window — each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "cnt")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """S3: session windows per user (gap-based, data-driven extent)."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "user_id",
            "cnt",
        )
    )


def windowed_counts_with_watermark(
    events: DataFrame, duration: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """S3b: watermarked tumbling agg — rows later than the watermark are
    dropped and closed-window state is evicted (bounded state at scale).

    Watermarks require TIMESTAMP (not NTZ); with the session timezone
    pinned to UTC the cast is a deterministic reinterpretation, applied
    identically in batch and stream mode so equivalence is preserved.
    """
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "cnt")
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """S4: stateful exact dedup on event_id; watermark bounds the state
    (an id seen again within the horizon is suppressed). TIMESTAMP cast
    as in :func:`windowed_counts_with_watermark`."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
    )


def dedup_events_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """S8: ``dropDuplicatesWithinWatermark`` — the at-least-once RETRY
    case where the redelivered event carries a NEW event time (a
    broker re-stamps on retry). Plain ``dropDuplicates`` keys its
    state eviction on the first occurrence's own timestamp;
    ``dropDuplicatesWithinWatermark`` guarantees suppression of any
    duplicate arriving within the watermark delay of the first, even
    when the duplicate's timestamp differs. STREAMING-ONLY by Spark
    contract (batch raises ``dropDuplicatesWithinWatermark is not
    supported with batch DataFrames``), so this operator has a replay
    test but no batch driver entry — the batch-equivalent relation is
    ``dropDuplicates`` on the same key (s04)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream⋈static enrichment: events joined to the customer dimension.

    The static side is broadcast per micro-batch (small dim), so the
    stream never shuffles — the standard scale pattern for dimension
    enrichment.
    """
    dim = F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment"))
    return events.join(dim, events.user_id == dim.c_custkey, "inner").select(
        "event_id", "ts", "user_id", "event_type", "value", "c_name", "c_mktsegment"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "30 days",
    how: str = "inner",
) -> DataFrame:
    """Stream⋈stream event-time interval join: each purchase matched to
    the same user's clicks in the preceding hour — the attribution-join
    pattern (ad click → conversion).

    Both sides carry watermarks and the join predicate bounds event
    time (``c_ts BETWEEN p_ts - 1h AND p_ts``), so Spark can evict
    state older than watermark+interval — at scale, state is
    proportional to one hour of traffic per side, not the stream
    history. The default watermark here is wider than the fixture's
    span so the replay test is exactly batch-equivalent.
    """
    p = (
        left.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        right.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"
        ),
        how,
    ).select("purchase_id", "click_id")


def interval_join_outer(
    left: DataFrame, right: DataFrame, watermark: str = "30 days"
) -> DataFrame:
    """LEFT OUTER stream⋈stream interval join — attribution where
    unconverted purchases must still emit (click_id NULL). In stream
    mode the null row can only be produced once the watermark passes
    the purchase's join window (no more clicks can arrive), which is
    exactly the state-eviction deadline of the inner form — same state
    bound, delayed null emission."""
    return interval_join(left, right, watermark, how="left_outer")


def interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: batch form of :func:`interval_join` (the
    same mode-agnostic function — S6 verifies stream↔batch equality).
    The oracle is a plain self-join with the same interval predicate."""
    register_views(spark, sf_dir)
    ev = spark.table("events")
    return interval_join(ev, ev).orderBy("purchase_id", "click_id")


def session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: per-user session windows (10-minute gap),
    batch form of :func:`session_counts` over the events view.

    The DuckDB oracle reimplements ``session_window`` relationally
    (gaps-and-islands: a new session starts when the gap to the previous
    event is ≥ the timeout; window end = last ts + timeout) — an
    independent derivation of the same semantics, not a dialect copy.
    """
    register_views(spark, sf_dir)
    return (
        session_counts(spark.table("events"), gap="10 minutes")
        .orderBy("user_id", "s_start")
        .select("user_id", "s_start", "s_end", "cnt")
    )


def sliding_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: 1-hour windows sliding every 15 minutes,
    batch form of :func:`sliding_counts`.

    The oracle derives the same relation without a window operator:
    each event belongs to exactly duration/slide = 4 windows, generated
    by unnesting k ∈ {0..3} against ``time_bucket`` — an independent
    reconstruction of Spark's sliding-window semantics.
    """
    register_views(spark, sf_dir)
    return (
        sliding_counts(spark.table("events"), "1 hour", "15 minutes")
        .orderBy("w_start")
        .select("w_start", "cnt")
    )


def stateful_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: batch form of :func:`dedup_events` (S4)
    over a stream with injected duplicates (every 7th event replayed
    twice — the at-least-once delivery failure dedup exists to absorb).
    Per-type counts after dedup must equal the clean feed's counts; the
    oracle states exactly that."""
    register_views(spark, sf_dir)
    ev = spark.table("events")
    noisy = ev.unionByName(ev.filter(F.col("event_id") % 7 == 0))
    return (
        dedup_events(noisy)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type")
    )


def stream_static_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: batch form of :func:`stream_static_join`
    (S5) + per-segment rollup. The value total is summed as exact
    integer cents (floor(value·100) per row — IEEE-identical on both
    engines) so the aggregate is merge-order-proof."""
    register_views(spark, sf_dir)
    j = stream_static_join(spark.table("events"), spark.table("customer"))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(
                F.floor(F.col("value") * 100).cast("bigint")
            ).alias("value_cents"),
        )
        .orderBy("c_mktsegment")
    )


def interval_join_outer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: batch form of :func:`interval_join_outer`
    — per-purchase click counts so the unmatched (NULL) branch shows up
    as zero-click purchases in a deterministic aggregate."""
    register_views(spark, sf_dir)
    ev = spark.table("events")
    j = interval_join_outer(ev, ev)
    return (
        j.groupBy("purchase_id")
        .agg(F.count("click_id").alias("n_clicks"))
        .groupBy("n_clicks")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("n_clicks")
    )


def windowed_leaderboard(events: DataFrame, duration: str = "1 day") -> DataFrame:
    """Per-window top-3 users by event count — the streaming
    leaderboard. Mode-agnostic aggregate: in stream mode the windowed
    counts maintain incrementally and the rank runs on the (tiny)
    per-window result in the sink query or a foreachBatch; in batch
    mode the same expression tree evaluates directly."""
    counts = (
        events.groupBy(F.window("ts", duration), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "user_id", "cnt")
    )
    from pyspark.sql.window import Window as W

    r = F.row_number().over(
        W.partitionBy("w_start").orderBy(
            F.col("cnt").desc(), F.col("user_id")
        )
    )
    return counts.withColumn("rank", r).filter(F.col("rank") <= 3)


def windowed_leaderboard_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: daily top-3 leaderboard, batch form."""
    register_views(spark, sf_dir)
    return windowed_leaderboard(spark.table("events")).orderBy(
        "w_start", "rank"
    )


def running_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s09: driver-contract entry — batch twin of
    :func:`running_user_totals`, the ``applyInPandasWithState`` custom
    stateful operator (S7). The stream's FINAL state (per-user event
    count + value total after every micro-batch) must equal this plain
    batch aggregate; the S7 replay test pins stream ≡ batch on the
    same feed, and this entry puts the batch side under the driver's
    oracle. ``value_cents`` is summed as exact integer cents (s05's
    merge-order-proof form) so the hash is partition-order-stable."""
    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100).cast("bigint")
            ).alias("value_cents"),
        )
        .orderBy("user_id")
    )


def chained_window_rollup(
    events: DataFrame,
    hourly: str = "1 hour",
    daily: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """S10: CHAINED windowed aggregations — hourly partials roll up
    into daily totals inside one query, the Spark ≥3.4 multiple-
    stateful-operators capability (`window_time` re-exposes the first
    aggregation's window as an event-time column the second can window
    over). In stream mode both levels maintain state incrementally and
    append-emit as the watermark closes each day; in batch mode the
    identical expression tree evaluates directly (the twin the driver
    hash-checks).

    ``n_hours`` (distinct non-empty hours per day) is what makes the
    two-level structure observable — a single-level daily aggregate
    cannot produce it. Money as exact-integer cents (s09's contract).

    At scale: the first level's state is one row per open hourly
    window; the second's one row per open day — both bounded by the
    watermark, never by the stream's length.
    """
    hourly_agg = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", hourly))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    return (
        hourly_agg.groupBy(F.window(F.window_time("window"), daily))
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("cnt").alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .select(
            F.col("window.start").cast("date").alias("day"),
            "n_hours",
            "n_events",
            "value_cents",
        )
    )


def chained_rollup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s10: driver-contract entry — batch twin of
    :func:`chained_window_rollup` (the replay test pins the streamed
    append output to this aggregate on the closed windows)."""
    register_views(spark, sf_dir)
    return chained_window_rollup(spark.table("events")).orderBy("day")


QUERIES = {
    "s01_session_windows": session_windows_batch,
    "s02_sliding_windows": sliding_windows_batch,
    "s03_interval_join": interval_join_batch,
    "s04_stateful_dedup": stateful_dedup_batch,
    "s05_stream_static_enrich": stream_static_enrich_batch,
    "s06_interval_join_outer": interval_join_outer_batch,
    "s07_windowed_leaderboard": windowed_leaderboard_batch,
    "s09_running_totals": running_totals_batch,
    "s10_chained_window_rollup": chained_rollup_batch,
}
ORACLE_SQL = {
    # s10: two-level rollup recomputed relationally — the hourly CTE is
    # the first stateful operator's closed-window output, the outer
    # aggregate the second's
    "s10_chained_window_rollup": """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS cnt,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
)
SELECT CAST(date_trunc('day', h) AS DATE) AS day,
       count(*) AS n_hours,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM hourly GROUP BY 1 ORDER BY day
""",
    # s09: the batch twin of the applyInPandasWithState running-totals
    # op (the S7 replay test pins stream final state ≡ this aggregate)
    "s09_running_totals": """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY user_id ORDER BY user_id
""",
    "s03_interval_join": """
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
ORDER BY purchase_id, click_id
""",
    "s02_sliding_windows": """
SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
       count(*) AS cnt
FROM events
CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) offsets
GROUP BY w_start ORDER BY w_start
""",
    "s01_session_windows": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL '10' MINUTE
              THEN 0 ELSE 1 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS s_start,
       max(ts) + INTERVAL '10' MINUTE AS s_end,
       count(*) AS cnt
FROM sess GROUP BY user_id, sid
ORDER BY user_id, s_start
""",
    # s04: injected duplicates are exact copies, so post-dedup counts
    # must equal the clean feed's per-type counts
    "s04_stateful_dedup": """
SELECT event_type, count(*) AS cnt FROM events
GROUP BY event_type ORDER BY event_type
""",
    "s05_stream_static_enrich": """
SELECT c.c_mktsegment, count(*) AS cnt,
       CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
    # s06: unmatched purchases surface as the n_clicks = 0 bucket
    "s06_interval_join_outer": """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, ts FROM events
  WHERE event_type = 'click'
), per AS (
  SELECT p.purchase_id, count(c.click_id) AS n_clicks
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id
   AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
  GROUP BY p.purchase_id
)
SELECT n_clicks, count(*) AS n_purchases
FROM per GROUP BY n_clicks ORDER BY n_clicks
""",
    # s07: time_bucket = Spark's window().start for day buckets
    "s07_windowed_leaderboard": """
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, user_id,
         count(*) AS cnt
  FROM events GROUP BY w_start, user_id
), ranked AS (
  SELECT w_start, user_id, cnt,
         CAST(row_number() OVER (PARTITION BY w_start
              ORDER BY cnt DESC, user_id) AS INTEGER) AS rank
  FROM counts
)
SELECT w_start, user_id, cnt, rank FROM ranked
WHERE rank <= 3 ORDER BY w_start, rank
""",
}


RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_RUNNING_STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, one updated row per user per
    micro-batch.

    This is the escape hatch for stateful semantics no built-in
    aggregation expresses (arbitrary per-group state machines); state
    here is a 2-field tuple per user — fixed-size, so 100 TB of events
    needs state proportional to |users|, not |events|. The S7 test
    checks the final state equals the batch aggregate.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        RUNNING_TOTALS_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def has_tws_runtime() -> bool:
    """True when ``transformWithStateInPandas`` can actually RUN here:
    its Python state-server worker imports
    ``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs the
    ``protobuf`` runtime. In this container the import of the API
    succeeds but the query dies at runtime with ``[STREAM_FAILED] …
    TransformWithStateInPySpark driver worker exited unexpectedly``
    (SURVEY §7.4, r10 adjudication: no network, protobuf cannot be
    vendored) — so availability is probed by the worker's own import,
    not by the API surface."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except (ImportError, ModuleNotFoundError):
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """s09's twin on the Spark 4 arbitrary-state API v2
    (``transformWithStateInPandas``): identical semantics — per-user
    running event count + value total, one updated row per user per
    micro-batch — expressed as a ``StatefulProcessor`` with a single
    ValueState field instead of the ``GroupState`` closure.

    Environment-gated, the multimodal-codec pattern: where the
    ``protobuf`` runtime exists this lights up with no code change
    (``tests/test_streaming.py`` carries the skipif-gated replay twin
    of the S7 test); here it raises the loud named refusal before the
    stream is even constructed, because the failure otherwise surfaces
    only at runtime inside the state-server worker. Not registered in
    QUERIES (SURVEY §7.4: a registration that cannot run in the
    driver's container would be a standing red row, not coverage)."""
    if not has_tws_runtime():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf runtime "
            "(google.protobuf) for its state-server worker: install "
            "protobuf — the operator is wired, only the library is "
            "absent (SURVEY §7.4)"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._st.get() if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._st.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
) -> None:
    """Drain a streaming DataFrame into the in-memory sink (availableNow:
    process every staged file as micro-batches, then stop)."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
