"""opentelemetry_collector_contrib_spark — a PySpark-native log pipeline engine.

A brand-new implementation (NOT a port) of the query / data-processing
capabilities of open-telemetry/opentelemetry-collector-contrib's logs path,
re-expressed Spark-first: the collector's receiver → processor → connector →
exporter graph becomes composable ``DataFrame -> DataFrame`` stage functions
driven by the Catalyst optimizer.

Layout
------
- ``sources``    — token-table generator + decode, file sources (filelog analog)
- ``operators``  — stanza parsers / transformers, pdata processors, connectors
- ``functions``  — OTTL-subset → Column compiler, grok expansion, severity /
                   strptime translation tables
- ``plans``      — pipeline composition, lineage / metrics bookkeeping
- ``streaming``  — Structured Streaming variants of the stages

Reference anchors are cited in docstrings as ``<path>:<line>`` relative to
/root/reference (open-telemetry/opentelemetry-collector-contrib @ 2026-08-07).
"""

__version__ = "0.1.0"
