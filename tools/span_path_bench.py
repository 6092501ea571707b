"""Measure the positions-index span-path win on LONG documents.

The claim (SURVEY/VERDICT parity item): re-analyze span construction pays a
full tokenize per hit per query — O(doc length); index-side positions
(store_positions=True) pay O(query-term postings + matched tokens).  Case
8's shape (100 KB docs) is where it matters.

    python tools/span_path_bench.py [n_docs] [doc_len] [trials]
"""
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
DOC_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def main():
    from pysearch import corpus
    from pysearch.build import build_index
    from pysearch.query import Searcher
    from pysearch.session import build_spark

    spark = build_spark(master="local[8]", shuffle_partitions=8)
    ix = "/tmp/span_bench_ix"
    shutil.rmtree(ix, ignore_errors=True)
    df = corpus.webtext_df(
        spark, cases=[(8, "if you are wrong then", N_DOCS, DOC_LEN)]
    )
    t0 = time.time()
    build_index(spark, df, ix, store_positions=True, segment_size=32)
    print(f"build ({N_DOCS} docs x {DOC_LEN}B, positions on): "
          f"{time.time() - t0:.1f}s")
    s = Searcher(spark, ix)
    q = "if you are wrong then"
    # warm both paths once
    s.search(q, k=10, case_id="8", spans="index").collect()
    s.search(q, k=10, case_id="8", spans="reanalyze").collect()
    times = {"index": [], "reanalyze": []}
    for _ in range(TRIALS):
        for path in ("index", "reanalyze"):
            t0 = time.time()
            n = len(s.search(q, k=10, case_id="8", spans=path).collect())
            times[path].append(time.time() - t0)
            assert n > 0
    for path, ts in times.items():
        print(f"spans={path}: median {statistics.median(ts):.3f}s "
              f"over {[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
