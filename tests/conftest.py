import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from langid_mr_spark import pipeline  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        pipeline.session(app="langid_mr_spark-tests", master="local[4]",
                         shuffle_partitions=4)
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
