"""SparkSession factory tuned for the log pipeline.

Defaults chosen for a local[N] developer box but scale-safe: AQE on (runtime
re-plan + skew-join handling), Arrow on (all our Python stages are Arrow
batch UDFs, never per-row Python), session TZ pinned to UTC so results are
comparable against UTC-naive oracles (DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "otelcol-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    On a real cluster, ``master`` is left to spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS or *]``. ``shuffle_partitions`` defaults to
    the core count — right-sized for local; on a 1000-executor cluster this
    is set to ~2-3× total cores by the submitter.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    # local[N] hard-codes task maxFailures=1, so ONE task failure kills the
    # job — combined with the idle-timeout worker kill below that would turn
    # a recoverable worker wedge into a job abort. local[N,4] restores the
    # cluster default of 4 attempts (deterministic failures still surface,
    # after 3 extra attempts of the failing task only — not 3 reruns of the
    # job). SPARK_GRAFT_LOCAL_RETRIES=1 restores fail-fast for debugging.
    retries = os.environ.get("SPARK_GRAFT_LOCAL_RETRIES", "4")
    if master.startswith("local[") and "," not in master and retries != "1":
        master = f"{master[:-1]},{retries}]"

    # The worker daemon is a fresh `python -m <spark.python.daemon.module>`
    # process: it sees PYTHONPATH, not the driver's sys.path mutations — a
    # driver launched from outside the repo (driver harness, notebooks)
    # would otherwise fail to import daemon_preload and kill every Python
    # stage. Exported here AND as executorEnv for real clusters.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    # Single-threaded numeric libraries in every Python WORKER, exported
    # before the JVM (and thus the worker daemon) starts so the daemon's
    # preloaded imports spawn no threads (fork safety — daemon_preload.py)
    # and so N parallel workers don't each spin an M-thread BLAS pool
    # (oversubscription: parallelism belongs to Spark, not per-worker BLAS).
    # setdefault — an explicit user/env choice wins.
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("MKL_NUM_THREADS", "1")
    os.environ.setdefault("JE_ARROW_MALLOC_CONF", "background_thread:false")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else n

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize the Python-worker roundtrip of the
        # fused decode+parse stage (default 10k → too many tiny batches)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        # pcommon.Map semantics: repeated keys upsert (last wins) rather
        # than the default EXCEPTION policy killing the job on hostile or
        # legal-but-odd records (RFC 5424 repeated PARAM-NAME, duplicate
        # OTLP attribute keys). Operators also dedup explicitly
        # (parsers.dedup_entries_last_win) so semantics don't depend on
        # whose SparkSession runs them.
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # Spark 4.1.2's single-threaded PythonRunner deadlocks under worker
        # REUSE once an Arrow-UDF stage runs enough tasks per worker
        # (observed reliably at 320 tasks / 32 threads on an 80M-row run:
        # the job parks with one task in EPoll.wait while an orphaned
        # worker blocks in tcp_sendmsg — jstack + /proc/<pid>/stack
        # evidence in docs/SCALE.md). A fresh daemon-forked worker per task
        # costs ~20% wall on small local runs but removes the hang class
        # entirely; long-task production stages barely notice the fork.
        # SPARK_GRAFT_WORKER_REUSE=true restores reuse for experiments.
        .config(
            "spark.python.worker.reuse",
            os.environ.get("SPARK_GRAFT_WORKER_REUSE", "false"),
        )
        # Second hang class (rarer, seen even with the stock daemon): a
        # freshly forked worker wedges before its first reply — main thread
        # parked on the socket, the JVM task thread parked in
        # ReaderInputStream's selector, both waiting on the other, forever.
        # Spark 4.1's idle-timeout watchdog converts that into a killed
        # worker + task failure after 60 s of NO data from the worker, and
        # the local[N,4] master (above) lets the task retry on a fresh fork
        # instead of aborting the job. 60 s is >10× our longest legit
        # worker silence (fork + pandas import + first 32k-row Arrow batch
        # ≈ 3-5 s, even under a 32-way cold-start fork storm), so false
        # kills are not a risk, and each wedge costs ~1 min, not forever.
        .config("spark.python.worker.idleTimeoutSeconds", "60")
        .config("spark.python.worker.killOnIdleTimeout", "true")
        # partitionBy writes: without this, FileFormatWriter inserts a
        # per-task SORT by the partition columns, which at 80M rows spills
        # (~450 MB execution memory per task on local[32]) — measured 166 s
        # → 140 s on the routed sink. Our sinks have bounded partition
        # cardinality (a handful of route_ids / exporter shards), so 8
        # concurrent open writers per task always suffices; tasks exceeding
        # it fall back to the sort automatically.
        .config("spark.sql.maxConcurrentOutputFileWriters", "8")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
    )
    # Preloading pandas/numpy/pyarrow in the worker daemon
    # (daemon_preload.py) reclaims the fresh-fork import cost of
    # reuse=false. The first attempt wedged 4/5 runs — the imports started
    # background threads in the daemon (32-thread OpenBLAS pool,
    # jemalloc_bg_thd) and fork() under a held lock deadlocked the child —
    # so preload now runs with the thread-cap envs above (verified: exactly
    # 1 OS thread after the imports) and re-execs the stock daemon if
    # anything still spawned a thread. Default ON; SPARK_GRAFT_DAEMON_PRELOAD=0
    # restores the stock pyspark.daemon.
    if os.environ.get("SPARK_GRAFT_DAEMON_PRELOAD", "1") == "1":
        b = b.config(
            "spark.python.daemon.module",
            "opentelemetry_collector_contrib_spark.daemon_preload",
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
