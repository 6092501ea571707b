"""Isolated index-build probe (bench §1 noop-style isolation): times
build_index over the already-materialized bench corpus, N repeats, with
host calibration before/after each.  Does not touch bench.py."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrate, calibrate_mt  # noqa: E402


def main():
    from pysearch.session import build_spark
    from pysearch import corpus
    from pysearch.build import build_index

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(os.environ.get("PROBE_REPEATS", "3"))
    spark = build_spark(
        master=f"local[{cpus}]", app_name="pysearch-probe-build",
        shuffle_partitions=3 * cpus,
        extra={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
    )
    corpus_dir = "/tmp/pysearch_bench_corpus_50000"
    if not os.path.isdir(corpus_dir):
        corpus.webtext_df(spark, cases=[(7, "a cornucopia of", 50000, 400)],
                          partitions=64).write.mode("overwrite").parquet(corpus_dir)
    wt = spark.read.parquet(corpus_dir)
    index_dir = "/tmp/pysearch_probe_index"
    warm = corpus.webtext_df(spark, cases=[(1, "be the person who", 500, 200)])
    shutil.rmtree(index_dir + "_warm", ignore_errors=True)
    build_index(spark, warm, index_dir + "_warm", segment_size=128)
    shutil.rmtree(index_dir + "_warm", ignore_errors=True)
    for i in range(n):
        shutil.rmtree(index_dir, ignore_errors=True)
        cal0 = round(calibrate(1.0))
        mt0 = round(calibrate_mt(seconds=1.0))
        t0 = time.time()
        build_index(spark, wt, index_dir, segment_size=512, n_partitions=cpus * 2)
        dt = time.time() - t0
        print(f"PROBE build[{i}] {dt:.2f}s cal={cal0} mt={mt0}", flush=True)
    shutil.rmtree(index_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
