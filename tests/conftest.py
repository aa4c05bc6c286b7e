import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    from cld2_spark.session import get_spark

    s = get_spark("cld2_spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
