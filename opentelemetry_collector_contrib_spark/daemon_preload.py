"""Python-worker daemon with heavy libraries preloaded.

``get_spark`` disables worker REUSE to dodge the Spark 4.1.2
PythonRunner pipe deadlock (see ``session.py`` / ``docs/SCALE.md``),
which means every task forks a fresh worker from the daemon. A bare
``pyspark.daemon`` child then pays the ``pandas``/``numpy``/``pyarrow``
import (~300 ms) on its first Arrow batch. Importing them HERE — in the
daemon process, before any fork — lets every forked worker inherit the
loaded modules via copy-on-write for free, reclaiming most of the
reuse=false overhead.

OPT-IN ONLY (``SPARK_GRAFT_DAEMON_PRELOAD=1`` → ``session.get_spark``
wires ``spark.python.daemon.module``): these imports start background
threads in the daemon (allocator purge threads, BLAS pools), and a
``fork()`` that lands while one of them holds an internal lock wedges the
child worker before it ever speaks — measured as 4/5 hung fresh-JVM
pipeline runs at local[2]/local[8] on 8M rows, 0/5 with the stock daemon
(see ``docs/SCALE.md``). Kept for single-threaded-import experiments; the
default stays the stock ``pyspark.daemon``, which deliberately imports
nothing heavy before fork.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.worker  # noqa: F401  — the module the daemon forks into
from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
