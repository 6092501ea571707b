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


@pytest.fixture(scope="session")
def index(spark):
    """Full 8-case doMatch index, built once per test session."""
    import shutil

    from pysearch import corpus
    from pysearch.build import build_index

    index_dir = "/tmp/pysearch_test_index"
    df = corpus.webtext_df(spark, cases=corpus.CASES)
    shutil.rmtree(index_dir, ignore_errors=True)
    build_index(spark, df, index_dir, segment_size=256)
    return index_dir
