"""One-session A/B: dd_simhash as 32 conditional sums (current) vs the r1
explode+pivot form — decides whether the r2 bench regression (1.74s -> 2.58s)
was host drift or a real plan cost (VERDICT r2 'what's wrong' #3).

    python tools/simhash_ab.py [sf_dir] [trials]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def variant_a(spark, sf_dir):
    from pysearch.ops import OPS

    return OPS["dd_simhash"][0](spark, sf_dir)


def variant_b(spark, sf_dir):
    """r1-style: explode 32 bit rows per (doc, term-hash), two shuffles."""
    from pyspark.sql import functions as F

    from pysearch.ops import _HEX_SPARK, _tokens

    terms = _tokens(spark, sf_dir).distinct()
    th = terms.select("doc_id", F.expr(_HEX_SPARK.format(x="term")).alias("hv"))
    bits = (
        th.select("doc_id", "hv", F.explode(F.expr("sequence(0, 31)")).alias("bit"))
        .withColumn("c", F.when(F.expr("(hv >> bit) & 1") == 1, 1).otherwise(-1))
        .groupBy("doc_id", "bit").agg(F.sum("c").alias("s"))
        .withColumn("contrib", F.when(F.col("s") > 0,
                                      F.expr("cast(1 as bigint) << bit"))
                    .otherwise(F.lit(0).cast("long")))
        .groupBy("doc_id").agg(F.sum("contrib").alias("simhash"))
        .orderBy("doc_id")
    )
    return bits


def main():
    from pysearch.session import build_spark

    spark = build_spark(master="local[32]", app_name="simhash-ab",
                        shuffle_partitions=32)
    # warm the scan + JIT once, untimed
    variant_a(spark, SF).collect()
    results = {"A_condsum": [], "B_explode": []}
    for t in range(TRIALS):
        for name, fn in (("A_condsum", variant_a), ("B_explode", variant_b)):
            t0 = time.time()
            n = len(fn(spark, SF).collect())
            results[name].append(round(time.time() - t0, 3))
            print(f"trial {t}: {name} {results[name][-1]}s ({n} rows)", flush=True)
    # value identity between the variants
    a = [tuple(r) for r in variant_a(spark, SF).collect()]
    b = [tuple(r) for r in variant_b(spark, SF).collect()]
    print("values identical:", a == b)
    import statistics

    for name, ts in results.items():
        print(f"{name}: median {statistics.median(ts)}s over {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
