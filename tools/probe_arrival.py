"""Phase probe for score_arriving_batch (st_arrival op): time the dedupe+
tokenize+stats action vs the scoring collect separately (guide §1 isolation;
does not touch bench.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from pysearch.session import build_spark, ship_package
    from pysearch import streaming as st
    from pysearch.analyze import get_analyzer

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(master=f"local[{cpus}]", app_name="probe-arrival",
                        shuffle_partitions=3 * cpus,
                        extra={"spark.sql.adaptive."
                               "advisoryPartitionSizeInBytes": "16m"})
    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    webtext = docs.select(
        F.format_string("doc://docs/%09d", F.col("doc_id")).alias("url"),
        "text")
    from pysearch.ops import _BM25_TERMS
    queries = {"q": " ".join(_BM25_TERMS)}
    an, _, _ = get_analyzer("simple")
    analyzed = {qid: an(q) for qid, q in queries.items()}
    union_terms = sorted({t for ts in analyzed.values() for t in ts})

    # warm
    st.score_arriving_batch(webtext, queries, k=10, analyzer="simple").collect()
    for i in range(3):
        t0 = time.time()
        df = st._dedupe_batch(st._shape_batch_text(webtext))
        toks = df.mapInPandas(
            st._tok_query_tfs(an, set(union_terms), {}),
            schema="url string, dl long, term string, tf long").persist()
        t1 = time.time()
        per_term = {
            r["term"]: (int(r["n"]), int(r["s"]))
            for r in toks.groupBy("term").agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
            ).collect()
        }
        t2 = time.time()
        rows = toks.filter(F.col("term").isNotNull()).collect()
        t3 = time.time()
        toks.unpersist()
        n_docs, _ = per_term.pop(None, (0, 0))
        print(f"pass {i}: plan={t1-t0:.3f}s stats_agg={t2-t1:.3f}s "
              f"score_collect={t3-t2:.3f}s n_docs={n_docs} "
              f"cand_rows={len(rows)}", flush=True)
        # end-to-end for reference
        t4 = time.time()
        st.score_arriving_batch(webtext, queries, k=10,
                                analyzer="simple").collect()
        print(f"pass {i}: end_to_end={time.time()-t4:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
