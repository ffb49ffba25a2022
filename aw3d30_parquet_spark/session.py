"""SparkSession factory and testdata catalog registration.

The reference's "catalog" is an S3 key listing (reference
``src/main.rs:265-331``); ours is a set of Parquet-backed temp views over
the driver testdata, registered once per (session, sf_dir).

Scale posture: every config here is chosen to survive a 1000-executor
cluster, not just local[32] — AQE on (runtime re-planning, skew joins,
partition coalescing), broadcast threshold left at default so small dims
(region/nation/supplier) broadcast, Arrow enabled for the Pandas-UDF
paths, shuffle partitions sized for local test scale but overridable.
"""

from __future__ import annotations

import itertools
import os
import weakref

from pyspark.sql import SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: Some testdata generations store ``events.ts`` as Parquet
#: TIMESTAMP(NANOS, NTZ), which Spark's vectorized reader rejects
#: (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong=
#: true`` — the int64 nanos then surface as a plain BIGINT which we
#: truncate to micros exactly like DuckDB does (integer ``div``, not
#: float division). Other generations store micros directly, in which
#: case the raw scan already yields TIMESTAMP_NTZ and no conversion is
#: needed (see register_views, which picks per-schema).
_EVENTS_NANOS_VIEW_SQL = """
SELECT event_id,
       CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ) AS ts,
       user_id, event_type, value, props
FROM {raw}
"""

# Confs that are safe / required at runtime on an externally-provided
# session (the driver hands queries() its own SparkSession).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # the aw3d30 Python DataSource implements pushFilters (tile-level
    # pruning); Spark requires this opt-in before it will call it
    "spark.sql.python.filterPushdown.enabled": "true",
}


def get_spark(
    app_name: str = "aw3d30-parquet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[*] by default; override with SPARK_GRAFT_CPUS. Shuffle
    partitions default to the local core count — at cluster scale the
    caller sets this (or relies on AQE coalescing, which is on).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parseable (bench prints ONE JSON line)
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_confs(spark: SparkSession) -> None:
    """Apply required runtime confs to an externally-created session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf may be static on some builds; registration still
            # proceeds — the reads below will surface a real error.
            pass
    ship_package(spark)


#: applicationId → package already shipped to its executors.
#: ``addPyFile`` is per SparkContext, and applicationId (unlike the
#: id() of a session wrapper) is never recycled in-process.
_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas UDFs defined at module top level pickle *by reference* — the
    worker re-imports ``aw3d30_parquet_spark`` to unpickle them. The
    driver may have imported us from a directory that is not on the
    workers' ``sys.path`` (and on a real cluster the executors don't
    share the driver's filesystem at all), so we ship a zip of the
    package through ``addPyFile`` — the same file-server channel
    ``spark-submit --py-files`` uses on a 1000-executor cluster. One
    zip per process, a few tens of KB, built once per session.
    """
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"aw3d30_parquet_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        # Spark Connect sessions have no sparkContext; UDFs are shipped
        # via the Connect artifact channel instead.
        pass
    _SHIPPED.add(key)


#: Floor on per-task input bytes for spread()'s fan-out. Fanning a
#: small input out to defaultParallelism makes every task carry a few
#: KB: at that size the per-task fixed costs (launch, codegen instance
#: setup, Arrow stream + Python-worker handshake on kernel stages)
#: exceed the work itself, and with more concurrent tasks than
#: effective cores the fixed costs additionally inflate superlinearly
#: (measured r13: an identical JVM text kernel burned 5.9 s of task
#: CPU across 32 thin tasks vs 0.42 s across 8 fat ones; the probe
#: plateau was flat from ~64 KB/task up). Same logic as AQE's
#: coalescePartitions.minPartitionSize (1 MB), re-derived for these
#: CPU-dense kernels (~16x denser per byte than a plain aggregate),
#: and applied here because AQE never coalesces an explicit
#: repartition(n). Overridable for cluster tuning.
SPREAD_BYTES_PER_TASK = int(
    os.environ.get("SPARK_GRAFT_SPREAD_BYTES_PER_TASK", str(64 * 1024))
)

#: Measured effective core count (memoized per process). None = not
#: yet probed; 0 = probe failed, fall back to the nominal count.
_EFFECTIVE_CORES: int | None = None


def effective_parallelism() -> int:
    """MEASURED effective parallelism of this host — not the vCPU
    count. Virtualized hosts routinely deliver fewer effective cores
    than they advertise (this sandbox: a 32-process integer-loop probe
    measures ~15-20× on 32 vCPUs post-reboot, r12/r13), and running
    more concurrent compute-bound tasks than effective cores does not
    merely queue them — per-task CPU inflates superlinearly (cache
    thrash + scheduler churn; r12's driver measured mapInPandas paths
    5-7× slower at 32 slots than at 8 on ~15 effective cores). The
    probe: one fixed CPU burn single-process, then the same burn in
    nominal-count concurrent processes; the scaling ratio IS the
    effective core count. ~0.3 s, once per process, memoized — query
    warm-up absorbs it, timed runs never see it. Overridable with
    SPARK_GRAFT_EFFECTIVE_CORES (a cluster operator pins it; CI keeps
    determinism).
    """
    global _EFFECTIVE_CORES
    if _EFFECTIVE_CORES is None:
        env = os.environ.get("SPARK_GRAFT_EFFECTIVE_CORES")
        if env:
            _EFFECTIVE_CORES = max(1, int(env))
            return _EFFECTIVE_CORES
        nominal = os.cpu_count() or 1
        try:
            import multiprocessing as mp
            import time as _time

            n = 2_000_000
            # min over two measurements of each phase: transient JVM/GC
            # activity in the host process inflates a single sample
            # (observed ±30%); the min of each phase is the quiet-host
            # estimate, and the quiet/quiet ratio is the stable one
            singles, pars = [], []
            ctx = mp.get_context("fork")
            for _ in range(2):
                t0 = _time.perf_counter()
                _burn(n)
                singles.append(_time.perf_counter() - t0)
                with ctx.Pool(nominal) as pool:
                    t0 = _time.perf_counter()
                    pool.map(_burn, [n] * nominal)
                    pars.append(_time.perf_counter() - t0)
            _EFFECTIVE_CORES = max(
                1,
                min(nominal, round(nominal * min(singles) / min(pars))),
            )
        except Exception:
            _EFFECTIVE_CORES = 0
    return _EFFECTIVE_CORES or (os.cpu_count() or 1)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def spread(df, min_partitions: int | None = None, dense: bool = False):
    """Fan a compute-bound input out when its scan yields fewer splits
    than the work supports.

    A small Parquet file arrives as ONE input split, so an expensive
    per-row stage (shingling, minhash, media decode, cosine) would run
    on a single core regardless of cluster size. Round-robin
    repartition costs one tiny shuffle of the (small) input and buys
    parallelism. The fan-out target is derived, not the vCPU count
    (guide §2.2 "scale-adaptive, not a constant tuned for local or
    cluster"):

    - capped at MEASURED effective parallelism (``effective_
      parallelism()``): more concurrent compute tasks than effective
      cores inflates per-task CPU superlinearly — the r12 driver's
      32-slots-on-~15-cores collapse;
    - and, unless ``dense=True``, floored at ``SPREAD_BYTES_PER_TASK``
      input bytes per task: a task under the byte floor pays more in
      launch/codegen/Arrow-handshake overhead than its work is worth
      (measured r13: suite-wide, 32 thin tasks lost 20-60% wall vs
      size-derived counts at sf0.1 under local[32]). ``dense=True``
      declares a per-ROW Python codec/generator kernel (PNG/BMFF/WAV
      fabrication: ~ms of CPU per row off a few bytes of id) whose
      work the input-byte proxy underestimates ~100×; those sites get
      the full effective-parallelism fan.

    Inputs big enough to hit the caps get every effective core; a
    100 TB table's thousands of splits never enter (n_parts >= target
    → no-op), so the policy is safe to leave on at scale.
    """
    # Under Spark Connect there is no sparkContext, no _jdf, and no
    # df.rdd (all raise) — no partition probe exists there, so return
    # the plan unchanged: Connect clusters set sane AQE/split configs
    # server-side, and a blind repartition would add a shuffle to the
    # 100 TB case this helper exists to avoid.
    try:
        sc = df.sparkSession.sparkContext
    except Exception:
        return df
    target = min_partitions or min(
        sc.defaultParallelism, effective_parallelism()
    )
    if min_partitions is None and not dense:
        # Catalyst's own size estimate (file bytes for the base-table
        # scans spread() fronts) — no job, ~free. Unknown sizes
        # default to Long.Max-ish and keep the parallelism cap.
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            target = min(
                target, -(-size // max(1, SPREAD_BYTES_PER_TASK)) or 1
            )
        except Exception:
            pass
    # JVM-side internal-row RDD: same partition count as df.rdd but
    # without building the Python-serializer conversion plan (~2 ms vs
    # ~0.3 s per fresh DataFrame — this probe runs on every family
    # entry, so the difference is a measurable slice of the suite).
    try:
        n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except AttributeError:
        n_parts = df.rdd.getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


#: session → sf_dir currently registered (testdata is immutable, so
#: re-registration is only needed when the sf_dir changes). Keyed on
#: the session OBJECT (temp views are per session, not per context);
#: the strong reference also prevents the id-recycling hazard a bare
#: id() key would have.
_REGISTERED: dict[SparkSession, str] = {}

#: live session object → assigned token (see session_token). A weak
#: mapping: the entry dies WITH the session, so a recycled id() can
#: never resurrect a dead session's token (ADVICE r11 — the old
#: f"connect_{id(spark):x}" fallback could serve a stale memo entry to
#: a brand-new session whose object landed on a freed address).
_SESSION_TOKENS: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)
_TOKEN_SEQ = itertools.count()


def session_token(spark: SparkSession) -> str:
    """Stable identifier for (session, input-dir) memo keys — the p05
    broadcast gate and the m06 candidate-volume gate cache one measured
    scalar per session over an immutable sf_dir. Classic Spark: the
    applicationId. Spark Connect (no sparkContext): a monotonically
    assigned token held weakly against the session object, unique for
    the object's lifetime and never reused after collection."""
    try:
        return spark.sparkContext.applicationId
    except Exception:
        tok = _SESSION_TOKENS.get(spark)
        if tok is None:
            tok = f"connect_{next(_TOKEN_SEQ)}"
            _SESSION_TOKENS[spark] = tok
        return tok


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register the ten testdata Parquet tables as temp views.

    ``events`` is schema-conditional: only when its ``ts`` column reads
    as bigint (nanos-as-long generation) is it registered through the
    nanos→micros converting projection (_EVENTS_NANOS_VIEW_SQL);
    otherwise it is a direct scan like every other table, so Catalyst
    keeps full pushdown/pruning into the Parquet source.

    Memoized per (session, sf_dir): every query entry calls this, and
    re-reading ten Parquet footers per query is pure fixed overhead.
    """
    if _REGISTERED.get(spark) == sf_dir:
        return
    apply_runtime_confs(spark)
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos-as-long generation: convert through the view
            df.createOrReplaceTempView("events_raw")
            spark.sql(
                _EVENTS_NANOS_VIEW_SQL.format(raw="events_raw")
            ).createOrReplaceTempView("events")
        else:
            df.createOrReplaceTempView(name)
    _REGISTERED[spark] = sf_dir
