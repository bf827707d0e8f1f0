import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4, app_name="tests")
    yield s


@pytest.fixture(scope="session")
def tokens_path(tmp_path_factory):
    from opentelemetry_collector_contrib_spark.sources.tokens import write_tokens_parquet

    p = str(tmp_path_factory.mktemp("tokens") / "t1")
    write_tokens_parquet(p, n=2000, seed=42)
    return p
