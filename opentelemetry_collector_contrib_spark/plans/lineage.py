"""Lineage / metrics / checkpoint bookkeeping.

Replicates the filelog checkpoint contract (``pkg/stanza/fileconsumer/
internal/checkpoint/checkpoint.go:24-60``: offsets persisted after every poll
cycle; resume = load offsets, skip consumed ranges) at Spark granularity:
one lineage record per (stage, input_fingerprint) written atomically WITH the
stage output (the _SUCCESS-gated directory is the commit point), so a rerun
sees exactly which inputs were already processed and skips them — idempotent
restart, at-least-once upgraded to effectively-once for deterministic stages.

Backed by parquet dirs here; the table layout is Iceberg-compatible and the
pipeline's dataset writers go through ``sources/table_format.py`` — set
``SPARK_GRAFT_TABLE_FORMAT=iceberg`` on a cluster with the Iceberg runtime on
the classpath to switch every sink (gated test: tests/test_table_format.py).
The lineage records themselves are driver-side JSON commit markers (one per
(stage, fingerprint), written after the output's _SUCCESS — the ordering is
the atomicity) and are format-independent.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class LineageLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)

    def completed(self, stage: str, fingerprint: str) -> bool:
        """Has (stage, fingerprint) already committed? (resume check)"""
        p = self._path(stage, fingerprint)
        return os.path.exists(p)

    def commit(self, stage: str, fingerprint: str, rows_in: int, rows_out: int, extra: dict | None = None) -> None:
        """Record a completed stage run. Written AFTER the stage's output
        directory is fully materialized — the ordering is the atomicity."""
        rec = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_ts": time.time(),
            "run_id": str(uuid.uuid4()),
            **(extra or {}),
        }
        tmp = self._path(stage, fingerprint) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(stage, fingerprint))  # atomic rename = commit

    def _path(self, stage: str, fingerprint: str) -> str:
        safe = fingerprint.replace("/", "_")
        return os.path.join(self.root, "_lineage", f"{stage}__{safe}.json")

    # ---- per-partition (per input file) checkpoints -------------------
    # The filelog receiver checkpoints {Fingerprint, Offset} PER FILE after
    # every poll (reader.go:30-40); the fingerprint there is a hash of the
    # file's FIRST 1000 BYTES so it survives renames/rotation
    # (fileconsumer/design.md). Same contract here: md5 of the first 1 KiB
    # plus the size — a renamed file is NOT reprocessed, and an in-place
    # content change (within the head) or size change IS.

    @staticmethod
    def file_fingerprint(path: str) -> str:
        import hashlib

        st = os.stat(path)
        with open(path, "rb") as f:
            head = f.read(1024)
        return f"{hashlib.md5(head).hexdigest()}:{st.st_size}"

    def files_done(self, stage: str) -> set[str]:
        d = os.path.join(self.root, "_lineage")
        out = set()
        for f in os.listdir(d):
            if f.startswith(f"{stage}@") and f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.add(json.load(fh)["fingerprint"])
        return out

    def commit_file(self, stage: str, fingerprint: str, rows_in: int, rows_out: int) -> None:
        rec = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_ts": time.time(),
        }
        safe = fingerprint.replace("/", "_").replace(":", "_")
        p = os.path.join(self.root, "_lineage", f"{stage}@{safe}.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, p)

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        d = os.path.join(self.root, "_lineage")
        files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".json")]
        if not files:
            return spark.createDataFrame([], "stage string, fingerprint string, rows_in long, rows_out long")
        return spark.read.json(files)
