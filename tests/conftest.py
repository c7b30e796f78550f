import sys
from pathlib import Path

import pytest

# repo root importable regardless of pytest invocation dir
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from html5ever_elixir_spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
