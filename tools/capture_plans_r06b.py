"""Capture .explain("formatted") evidence for the r6 late-session ops
rewrites (t1_bm25 single-pass pivot, tx_quality / tx_repetition map-only
array-native forms, tx_decontaminate eval-filter pushdown).

Run BEFORE the rewrite to produce <op>_before.txt and AFTER to produce
<op>_after.txt (pass "after" as argv[2]).

    python tools/capture_plans_r06b.py [sf_dir] [before|after]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TAG = sys.argv[2] if len(sys.argv) > 2 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")

OPS_TO_CAPTURE = ("t1_bm25_top10", "tx_quality", "tx_repetition",
                  "tx_decontaminate_top50")


def write(name: str, df) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name + ".txt"), "w") as f:
        f.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))


def main() -> None:
    from pysearch.ops import OPS
    from pysearch.session import build_spark

    spark = build_spark(master="local[8]", app_name="plans-r06b",
                        shuffle_partitions=8)
    for name in OPS_TO_CAPTURE:
        fn, _sql = OPS[name]
        write(f"{name}_{TAG}", fn(spark, SF_DIR))
    spark.stop()
    print("plans written to", OUT, "tag", TAG)


if __name__ == "__main__":
    main()
