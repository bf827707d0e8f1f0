from . import parsers, transformers, enrich, connectors, dedup, processors  # noqa: F401
