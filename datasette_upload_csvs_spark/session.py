"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the configs below are the ones
that matter identically on a real cluster: AQE (runtime re-planning,
skew-join splitting, partition coalescing), a generous broadcast
threshold (every TPC-H-ish dimension table is broadcast-able), Arrow
for any pandas-UDF path, and UTC session time so timestamp semantics
are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and wanted) on any cluster size. Shuffle
# partition count is a *starting* value only: AQE coalesces small
# post-shuffle partitions and splits skewed ones at runtime, so the
# same code scales from local[32] to 1000 executors without retuning.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: push filters + prune columns (defaults, pinned
    # explicitly because correctness of the bench depends on them).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime row-level join pruning: when one join side is filtered
    # selective, inject a bloom filter on the other side so the big
    # scan drops non-joining rows before the shuffle. Gated by
    # Spark's own size thresholds (application side >= 10 GB), so
    # it is a no-op at test scale and kicks in exactly where it
    # pays — at 100 TB it is the difference between shuffling a
    # full fact table and shuffling the ~1% that joins. (The
    # companion semiJoinReduction conf is deliberately NOT set: it
    # hangs the 4.1.2 planner on shuffle joins — verified locally.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS); Spark has
    # no nanos timestamp type, so scan them as long and convert
    # (queries.load re-derives micros with exact integer division).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Micros-precision naive timestamps (isAdjustedToUTC=false, the
    # regenerated testdata's events.ts) must read as TIMESTAMP (LTZ
    # under the UTC session zone), not TIMESTAMP_NTZ: LTZ is what the
    # nanos→micros conversion produced in earlier testdata vintages,
    # keeps unix_micros/epoch arithmetic legal, and matches how the
    # DuckDB oracle treats the same naive column under UTC.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Long-running-driver hygiene: the UI state store retains 1000
    # SQL executions BY DEFAULT, each holding the full plan graph of
    # its query — and this engine's streaming epochs submit very
    # large plans (state-union reads, CC chains). Measured on the
    # 520k-doc streaming-funnel leg (40 epochs, one driver): default
    # retention degrades per-epoch wall progressively (last/first
    # quartile 2.50, sporadic 30-56 s stalls, no matching GC pauses);
    # the bounded set below fixes it (1.36, total drain 621 s -> 496 s)
    # and matches the spark.ui.enabled=false control (1.38) — see
    # BENCH_FUNNEL_STREAM.json scale_tiered / _noui / _lowret. These
    # are STATIC confs: they land on fresh sessions (the streaming
    # drivers that need them). On an already-active session,
    # conf.set() on spark.ui.* is accepted SILENTLY but has no
    # effect — no exception, no warning — so a metered bench reusing
    # a shared session keeps whatever retention that session started
    # with. The _ShuffleMeter copies therefore detect stage eviction
    # between snapshots and warn when the measurement window was
    # truncated. Benches that meter shuffle bytes via the UI REST API
    # override retainedStages upward on a FRESH session (their
    # measure window must out-live a stage block; see
    # bench_funnel_scale.py).
    "spark.sql.ui.retainedExecutions": "50",
    "spark.ui.retainedJobs": "500",
    "spark.ui.retainedStages": "500",
    "spark.ui.retainedTasks": "20000",
    # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
    # INT96 columns carry no min/max footer statistics, which silently
    # disables row-group skipping (and broke the clustering-layout
    # invariant once the testdata switched to real timestamp columns).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def _host_ram_gib(default: int = 64) -> int:
    """Physical RAM in GiB via sysconf; `default` when unknowable."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page = os.sysconf("SC_PAGE_SIZE")
        return max(1, (pages * page) >> 30)
    except (ValueError, OSError, AttributeError):
        return default


def get_spark(
    app_name: str = "datasette-upload-csvs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's configs.

    If a session already exists (e.g. the driver harness owns it),
    runtime-settable confs are applied to it and it is returned
    (``extra_confs`` that are static confs cannot apply then — they
    must land before the JVM launches).

    SHARED-SESSION SIDE EFFECT (ADVICE r12): ``extra_confs`` applied
    to an already-active session PERSIST on it for every subsequent
    user in the process — they are runtime session confs, and this
    function never restores prior values. When an extra_conf
    overwrites a DIFFERING existing value, a RuntimeWarning names
    the conf and both values so cross-caller leakage is visible;
    callers that need their confs scoped should snapshot/restore
    around their work (or run in their own session).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        configure(active)
        # caller-requested confs must not silently vanish just
        # because a harness already owns the session: apply each
        # runtime-settable one; warn (don't raise) for static confs,
        # which can only land before the JVM launches.
        for k, v in (extra_confs or {}).items():
            try:
                # no-default get: the EFFECTIVE value (conf.get(k,
                # None) returns None for any conf not explicitly set,
                # even when Spark has a live default — overwriting
                # that default still changes later users' behavior)
                try:
                    prev = active.conf.get(k)
                except Exception:
                    prev = None  # no effective value registered
                active.conf.set(k, v)
                if prev is not None and prev != str(v):
                    import warnings

                    warnings.warn(
                        f"extra_conf {k!r} overwrites {prev!r} with "
                        f"{v!r} on the shared active session; the new "
                        "value persists for later users of this "
                        "session (see get_spark docstring)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
            except Exception as ex:
                import warnings

                warnings.warn(
                    f"extra_conf {k!r} could not be applied to the "
                    f"active session (static conf?): {ex}",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    resolved_master = master or f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(resolved_master)
    # In local mode the driver JVM IS the cluster; the 1g default
    # heap starves 32 executor threads (GCLocker retry warnings,
    # broadcast-build OOMs on the dedup pipelines). Size it from the
    # host RAM (half of physical, capped at 32g) so a small CI box
    # isn't pushed into swap; a real cluster master keeps
    # spark-submit's own sizing. PySpark passes builder confs to
    # spark-submit before the JVM launches, so this takes effect in
    # client mode.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if driver_mem is None and resolved_master.startswith("local"):
        driver_mem = f"{max(1, min(32, _host_ram_gib() // 2))}g"
    if driver_mem:
        builder = builder.config("spark.driver.memory", driver_mem)
    # JVM unified logging defaults to STDOUT; under memory pressure a
    # GC warning ("Retried waiting for GCLocker...") interleaves with
    # bench.py's single machine-readable JSON line and corrupts it.
    # Route all JVM log output to stderr instead.
    builder = builder.config(
        "spark.driver.extraJavaOptions", "-Xlog:all=warning:stderr"
    )
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus))
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep its value
    _ship_package(spark)
    return spark


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable by Spark's Python workers
    regardless of the driver's cwd.

    Pickled (pandas-)UDFs reference functions by module path; workers
    then import the module. When the driver process was launched from
    outside the repo (the driver harness, bench from /tmp), the repo
    root is on the driver's sys.path but NOT in the env the workers
    inherit — every UDF dies with ModuleNotFoundError. The
    Spark-native fix is to ship the code: zip the package once per
    process and sc.addPyFile it (exactly how --py-files deploys
    Python code to a real cluster's executors)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"ducs_spark_pkg_{os.getpid()}.zip"
    if not zip_path.exists():
        tmp = zip_path.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=str(Path(pkg_dir.name) / py.relative_to(pkg_dir)))
        tmp.rename(zip_path)
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED.add(app_id)
