"""North-rule deployment path: the whole pipeline runs via
``spark-submit --py-files pysearch.zip`` — proven by actually invoking
spark-submit as a subprocess from a clean cwd with NO repo on sys.path, so
every import (driver AND executor python workers, which run the build's
pandas UDFs) must resolve from the zip."""

import os
import shutil
import subprocess

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER_SCRIPT = """
from pyspark.sql import SparkSession

# plain SparkSession — deliberately NOT pysearch.session.build_spark, which
# would inject a repo path; imports must come from --py-files alone
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .appName("pysearch-submit-test").getOrCreate())

from pysearch import corpus
from pysearch.build import build_index
from pysearch.query import Searcher

df = corpus.webtext_df(spark, cases=[(6, "in the realm of", 40, 200)])
build_index(spark, df, "{ix}", segment_size=16)
s = Searcher(spark, "{ix}")
hits = s.search_ids("in the realm of", k=100, case_id="6")
url_of = {{r["doc_id"]: r["url"] for r in s.docs.select("doc_id", "url").collect()}}
got = sorted(int(url_of[i].rsplit("/", 1)[1]) for i in hits["doc_id"])
want = [i for i in range(1, 41) if i % 3 != 2]
assert got == want, (got, want)
print("SUBMIT_OK", len(got))
spark.stop()
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_pyfiles(tmp_path):
    from pysearch.cli import make_pyfiles_zip

    zip_path = make_pyfiles_zip(str(tmp_path / "pysearch.zip"))
    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT.format(ix=str(tmp_path / "submit_ix")))

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", zip_path, str(script)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SUBMIT_OK 27" in res.stdout, (res.stdout[-1000:],
                                          res.stderr[-2000:])
