"""Python-worker daemon with heavy libraries preloaded — fork-safe form.

``get_spark`` disables worker REUSE to dodge the Spark 4.1.2
PythonRunner pipe deadlock (see ``session.py`` / ``docs/SCALE.md``),
which means every task forks a fresh worker from the daemon. A bare
``pyspark.daemon`` child then pays the ``pandas``/``numpy``/``pyarrow``
import (~1 s cold) on its first Arrow batch. Importing them HERE — in
the daemon process, before any fork — lets every forked worker inherit
the loaded modules via copy-on-write for free, reclaiming most of the
reuse=false overhead.

The first attempt at this (round 5, reverted) wedged 4/5 runs: the
imports start BACKGROUND THREADS in the daemon — numpy's OpenBLAS spins
up a pool sized to the machine (32 threads here) and pyarrow's bundled
jemalloc starts ``jemalloc_bg_thd`` — and a ``fork()`` that lands while
one of them holds an internal lock produces a child that deadlocks
before serving its task (classic fork-vs-threads; docs/SCALE.md
"daemon-preload fork wedge"). The fix is to make the imports
single-threaded BY CONSTRUCTION, then VERIFY:

- ``OPENBLAS_NUM_THREADS=1`` / ``OMP_NUM_THREADS=1`` /
  ``MKL_NUM_THREADS=1`` before ``import numpy`` — no BLAS pool. This is
  also the correct Spark-worker config independent of forking: N
  parallel workers × M BLAS threads oversubscribes the box (the
  parallelism belongs to Spark, not to per-worker BLAS).
- ``JE_ARROW_MALLOC_CONF=background_thread:false`` before pyarrow's
  jemalloc loads (the bundled jemalloc is built with the ``je_arrow_``
  prefix, so this — not ``MALLOC_CONF`` — is its option env var;
  measured: the only env of the three candidates that removes
  ``jemalloc_bg_thd``).
- After the imports, COUNT OS threads via ``/proc/self/task``. If
  anything still spawned a thread (different BLAS build, future library
  version), fall back to the stock single-threaded ``pyspark.daemon``
  by re-exec — env and the JVM-facing stdin/stdout pipe fds survive
  ``execv``, so the JVM never notices. Preload is then merely lost, not
  a hang risk.

Enabled by default via ``session.get_spark`` (opt out with
``SPARK_GRAFT_DAEMON_PRELOAD=0``).
"""

import os
import sys

# Must happen before the numpy/pyarrow shared objects initialize.
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("JE_ARROW_MALLOC_CONF", "background_thread:false")

import numpy  # noqa: F401, E402
import pandas  # noqa: F401, E402
import pyarrow  # noqa: F401, E402
import pyspark.worker  # noqa: F401, E402  — the module the daemon forks into


def _os_threads() -> int:
    try:
        return len(os.listdir("/proc/self/task"))
    except OSError:  # non-Linux: can't verify → don't risk it
        return -1


if __name__ == "__main__":
    if _os_threads() != 1:
        # a library ignored the caps (or we can't verify) — preloaded
        # modules + threads = fork wedge risk, so hand the pipe fds to the
        # stock daemon, which imports nothing heavy before fork
        os.execv(sys.executable, [sys.executable, "-m", "pyspark.daemon"])
    from pyspark.daemon import manager

    manager()
