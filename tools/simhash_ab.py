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


def variant_c(spark, sf_dir):
    """Numpy fold: shuffle narrow (doc_id, hv) rows once (repartition by
    doc_id), then compute the whole simhash per doc vectorized inside
    mapInPandas — no 32x row volume, no 32-column codegen aggregate."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pysearch.ops import _HEX_SPARK, _tokens

    terms = _tokens(spark, sf_dir).distinct()
    th = terms.select("doc_id", F.expr(_HEX_SPARK.format(x="term")).alias("hv"))

    def fold(batches):
        from collections import defaultdict

        acc = defaultdict(lambda: np.zeros(32, dtype=np.int64))
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            hv = pdf["hv"].to_numpy(dtype=np.uint32)
            bits = ((hv[:, None] >> np.arange(32, dtype=np.uint32)) & 1
                    ).astype(np.int64) * 2 - 1
            order = np.argsort(ids, kind="stable")
            ids_s, bits_s = ids[order], bits[order]
            uniq, start = np.unique(ids_s, return_index=True)
            sums = np.add.reduceat(bits_s, start, axis=0)
            for d, s in zip(uniq, sums):
                acc[int(d)] += s
        if acc:
            docs = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
            mat = np.stack([acc[int(d)] for d in docs])
            sh = ((mat > 0).astype(np.int64)
                  * (1 << np.arange(32, dtype=np.int64))).sum(axis=1)
            yield pd.DataFrame({"doc_id": docs, "simhash": sh})

    return (
        th.repartition("doc_id")
        .mapInPandas(fold, schema="doc_id long, simhash long")
        .orderBy("doc_id")
    )


def main():
    from pysearch.session import build_spark

    spark = build_spark(master="local[32]", app_name="simhash-ab",
                        shuffle_partitions=32)
    # warm the scan + JIT once, untimed
    variant_a(spark, SF).collect()
    results = {"A_condsum": [], "B_explode": [], "C_numpy": []}
    for t in range(TRIALS):
        for name, fn in (("A_condsum", variant_a), ("B_explode", variant_b),
                         ("C_numpy", variant_c)):
            t0 = time.time()
            n = len(fn(spark, SF).collect())
            results[name].append(round(time.time() - t0, 3))
            print(f"trial {t}: {name} {results[name][-1]}s ({n} rows)", flush=True)
    # value identity between the variants
    a = [tuple(r) for r in variant_a(spark, SF).collect()]
    b = [tuple(r) for r in variant_b(spark, SF).collect()]
    c = [tuple(r) for r in variant_c(spark, SF).collect()]
    print("values identical:", a == b == c)
    import statistics

    for name, ts in results.items():
        print(f"{name}: median {statistics.median(ts)}s over {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
