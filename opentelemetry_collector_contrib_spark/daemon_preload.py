"""Python-worker daemon with heavy libraries preloaded.

``get_spark`` disables worker REUSE to dodge the Spark 4.1.2
PythonRunner pipe deadlock (see ``session.py`` / ``docs/SCALE.md``),
which means every task forks a fresh worker from the daemon. A bare
``pyspark.daemon`` child then pays the ``pandas``/``numpy``/``pyarrow``
import (~300 ms) on its first Arrow batch. Importing them HERE — in the
daemon process, before any fork — lets every forked worker inherit the
loaded modules via copy-on-write for free, reclaiming most of the
reuse=false overhead.

Wired via ``spark.python.daemon.module`` in ``session.get_spark``; on a
real cluster the package ships with ``--py-files`` so the module resolves
on executors exactly like the UDFs themselves.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.worker  # noqa: F401  — the module the daemon forks into
from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
