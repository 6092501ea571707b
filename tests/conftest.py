import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pysearch.session import build_spark

    n = os.environ.get("PYSEARCH_TEST_CORES", "8")
    spark = build_spark(master=f"local[{n}]", app_name="pysearch-tests",
                        shuffle_partitions=int(n))
    yield spark
    spark.stop()
