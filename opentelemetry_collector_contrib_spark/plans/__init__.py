from .pipeline import LogPipeline, salted_repartition  # noqa: F401
from .lineage import LineageLog  # noqa: F401
