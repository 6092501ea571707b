"""Benchmark driver — prints ONE JSON line per the graft contract.

Headline numbers:
- ``index_build``: full SPIMI index build over the FIXTURES.md §5 bench
  corpus (doMatch case-7 arithmetic scaled to the sf level, docLen=400)
  -> docs/sec.
- ``q_*``: warm query latencies over the engine (the case-7 phrase plus a
  mix of rare/common terms) and the headline ops queries (BM25-in-SQL,
  minhash pairs, ann top-k, relational aggregates) at the sf dir.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).

Scaling evidence (local[8] vs local[32]) is produced by
``python BENCH/run_scaling.py`` which shells out to this file.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# bench corpus size by sf level (FIXTURES.md §5: case-7 generator, docLen=400)
BENCH_DOCS = {"0.001": 1000, "0.01": 5000, "0.1": 50000}
# first 8 keep their historical order so q_engine_0..7 stay comparable
# across rounds; the extension to 20 gives p95 a defensible sample size
# (r2 verdict: 8 points make "p95" ≈ max)
ENGINE_QUERIES = [
    "a cornucopia of",
    "cornucopia",
    "software stack",
    "pdf full text search",
    "customer problems",
    "library ecosystem",
    "indexing and search",
    "unexpected ways",
    "powerful open source",
    "technical depth",
    "programming culture",
    "text extraction",
    "bounding boxes",
    "small pull request",
    "go ecosystem",
    "modern software product companies",
    "solve customer problems in unexpected ways",
    "high quality libraries",
    "necessary library",
    "australian company",
]
OPS_QUERIES = [
    "t1_bm25_top10",
    "a2_term_df_top50",
    "dd_minhash_pairs",
    "dd_simhash",
    "dd_simhash_band_pairs",
    "dd_embed_lsh_verify",
    "ann_cosine_top5",
    "tx_quality",
    "tx_fingerprints",
    "tx_decontaminate_top50",
    "samp_token_budget",
    "rel_q1_pricing",
    "rel_nation_revenue",
    "st_arrival_bm25_top10",
    # round-4 capabilities (r4 verdict #6): dedup end-to-end, the composed
    # pretrain filter, NRT hybrid, and time-travel snapshot reads
    "dd_dup_clusters",
    "dd_dedup_survivors",
    "pipeline_pretrain_filter",
    "st_nrt_bm25_top10",
    "tt_snapshot_bm25_top10",
    # round-5 capabilities: unordered proximity retrieval over pos_bin,
    # Lucene boolean occurs (+must -must_not should), fuzzy edit-distance
    # expansion (term~d)
    "t1_engine_near_top10",
    "t1_engine_bool_top10",
    "t1_engine_fuzzy_top10",
    "t1_engine_prefix_top10",
    "tx_repetition",
    # round-5 late additions: regexp MultiTermQuery, spell suggest, MLT,
    # result faceting, language balancing, chunk-level dedup+reassembly
    "t1_engine_regexp_top10",
    "t1_engine_suggest_top3",
    "t1_engine_mlt_top10",
    "t1_engine_facet_lang",
    "samp_balance_lang",
    "dd_chunk_dedup",
    # round-5 filter context (Lucene filtered query): metadata-gated search
    # and the dedup-pipeline × engine composition
    "t1_engine_filter_lang_top10",
    "t1_engine_filter_survivors_top10",
    # round-5 result-set surface: pagination and total-hits count
    "t1_engine_page2_top10",
    "t1_engine_count",
]


def sf_label(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def calibrate(seconds: float = 2.0) -> float:
    """Single-core sha256 ops/s — sampled before and after the bench so
    cross-round comparisons are decidable (r2 verdict: bench numbers
    drifted +10-30% with no way to tell host from code; this sandbox's
    single-core speed swings ±50% over minutes).  Runs with no Spark JVM
    alive, so it measures the host, not contention."""
    import hashlib
    import time as _time

    h = b"x" * 4096
    t0 = _time.time()
    n = 0
    while _time.time() - t0 < seconds:
        for _ in range(300):
            hashlib.sha256(h).digest()
        n += 300
    return n / (_time.time() - t0)


def calibrate_mt(threads: int = 16, seconds: float = 2.0) -> float:
    """Aggregate sha256 ops/s across ``threads`` concurrent threads (hashlib
    releases the GIL).  This sandbox intermittently penalizes processes with
    many concurrently-syscalling threads ~3-12x (measured: 32 threads in one
    process hash SLOWER than 1 thread; back-to-back local[32] benches on the
    same code at the same single-core cal differed 3.3x).  The single-core
    sample cannot see that regime, so this probes it directly.  Interpret as
    a raw regime sample, not a binary flag: the penalty depth itself drifts
    (observed 41k -> 15k agg ops/s within one 90s bench, vs ~233k
    single-core), so compare mt/st ratios ACROSS bench lines before
    attributing cross-round deltas to code."""
    import hashlib
    import threading
    import time as _time

    h = b"x" * 4096
    counts = [0] * threads
    stop = _time.time() + seconds

    def worker(i):
        n = 0
        while _time.time() < stop:
            for _ in range(300):
                hashlib.sha256(h).digest()
            n += 300
        counts[i] = n

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(threads)]
    t0 = _time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return sum(counts) / (_time.time() - t0)


def main() -> None:
    from pysearch.session import build_spark

    cal_start = calibrate()
    cal_mt_start = calibrate_mt()
    t_all = time.time()
    # PYSEARCH_TASK_CPUS=2 charges each task for its Python worker too —
    # used by the scaling harness so local[N] really consumes ~N cores;
    # default 1 maximizes absolute throughput for the headline bench
    task_cpus = int(os.environ.get("PYSEARCH_TASK_CPUS", "1"))
    slots = max(2, CPUS // task_cpus)
    # the scaling harness pins partition counts across BOTH configurations:
    # a real N->4N comparison runs the SAME job on the SAME data layout —
    # letting the small config use coarser partitions flatters it
    shuffle_parts = int(os.environ.get("PYSEARCH_SHUFFLE_PARTS", 3 * slots))
    build_parts = int(os.environ.get("PYSEARCH_BENCH_PARTITIONS", CPUS * 2))
    extra = {
        # 3 waves per stage smooths stragglers; smaller AQE advisory stops
        # coalescing below the slot count on mid-size shuffles
        "spark.task.cpus": str(task_cpus),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    }
    work_root = "/tmp"
    if os.environ.get("PYSEARCH_BENCH_TMPFS") == "1":
        # single-node scaling measurement: this host has ONE virtual disk
        # shared by every configuration, while a real 4N-executor cluster
        # brings 4N local disks — RAM-backed shuffle+index storage removes
        # the shared-disk ceiling that would otherwise be measured instead
        # of the engine
        work_root = "/dev/shm/pysearch_bench"
        os.makedirs(work_root, exist_ok=True)
        extra["spark.local.dir"] = f"{work_root}/spark_local"
    spark = build_spark(
        master=f"local[{CPUS}]", app_name="pysearch-bench",
        shuffle_partitions=shuffle_parts,
        extra=extra,
    )
    timings: dict = {}
    sf = sf_label(SF_DIR)

    # ---- index build throughput over the bench corpus ------------------
    from pysearch import corpus
    from pysearch.build import build_index
    from pysearch.query import Searcher

    n_docs = int(os.environ.get("PYSEARCH_BENCH_DOCS", 0)) or BENCH_DOCS.get(sf, 5000)
    bench_case = [(7, "a cornucopia of", n_docs, 400)]
    # the input is "an Iceberg table of web pages": materialize the corpus
    # to parquet first (not timed), then time the build from storage
    corpus_dir = f"/tmp/pysearch_bench_corpus_{n_docs}"
    if not os.path.isdir(corpus_dir):
        corpus.webtext_df(spark, cases=bench_case,
                          partitions=max(CPUS * 2, 16)).write.mode(
            "overwrite").parquet(corpus_dir + ".tmp")
        os.rename(corpus_dir + ".tmp", corpus_dir)
    if os.environ.get("PYSEARCH_BENCH_CORPUS_ONLY") == "1":
        spark.stop()
        print(json.dumps({"metric": "corpus_only", "value": 0, "unit": "sec",
                          "queries": {}, "sf": 0}))
        return
    wt = spark.read.parquet(corpus_dir)
    index_dir = f"{work_root}/pysearch_bench_index_{CPUS}"
    # warmup build (tiny, untimed): JIT/classloading/python-worker spin-up
    # otherwise lands in the first timed build
    warm = corpus.webtext_df(spark, cases=[(1, "be the person who", 500, 200)])
    shutil.rmtree(index_dir + "_warm", ignore_errors=True)
    build_index(spark, warm, index_dir + "_warm", segment_size=128)
    shutil.rmtree(index_dir + "_warm", ignore_errors=True)
    # best-of-N timed builds: single-node wall times swing ~20% run to run
    # (page cache, AQE decisions, worker scheduling); the minimum is the
    # standard low-variance estimator for identical work
    repeats = int(os.environ.get("PYSEARCH_BENCH_REPEATS", "1"))
    dt_build = None
    for _ in range(max(1, repeats)):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        build_index(spark, wt, index_dir, segment_size=512,
                    n_partitions=build_parts)
        dt = time.time() - t0
        dt_build = dt if dt_build is None else min(dt_build, dt)
    timings["index_build"] = round(dt_build, 3)
    docs_per_sec = n_docs / dt_build

    # ---- engine + ops query latencies (warm) -----------------------------
    # every query runs QUERY_REPEATS times and reports the MEDIAN (r3
    # verdict: one sample per query per round left r2-vs-r3 per-query
    # deltas host-noise-hostage on a host whose single-process thread
    # penalty flips between back-to-back runs).  The repeats are
    # INTERLEAVED — full passes over the whole query suite, one sample per
    # query per pass — not back-to-back per query: a host slump episode
    # lasting longer than one query's 3 consecutive samples (~10 s)
    # otherwise lands entirely inside a single query's median and reads as
    # a per-query regression (observed: two 0.7 s queries reported 2.5 s /
    # 3.4 s medians while a same-code re-probe minutes later measured them
    # at 0.7 s).  Interleaving spreads any episode across the whole suite,
    # where the calibration fields already expose it.  Raw samples ride
    # along in query_samples so outlier passes stay auditable.
    import statistics

    repeats = max(1, int(os.environ.get("PYSEARCH_QUERY_REPEATS", "3")))
    samples: dict = {}

    searcher = Searcher(spark, index_dir)
    suite = []
    for i, q in enumerate(ENGINE_QUERIES):
        suite.append((f"q_engine_{i}",
                      lambda q=q: searcher.search_ids(q, k=10, case_id="7")))
    # batched query-log scoring: all engine queries in ONE postings scan
    # (search_ids_many) — the offline-eval pattern; compare to sum(q_engine_*)
    suite.append(("q_engine_batch8",
                  lambda: searcher.search_ids_many(
                      {f"q{i}": q for i, q in enumerate(ENGINE_QUERIES)},
                      k=10, case_id="7")))
    # ops queries over the sf tables.  PYSEARCH_BENCH_SKIP_OPS=1 (scaling
    # harness): the ops/dd/tx family is Spark analytics over the sf tables,
    # not the engine under the N-vs-4N criterion, and it does not feed
    # query_p95_sec (engine queries only) — skipping it keeps scaling legs
    # dominated by the measured build
    if os.environ.get("PYSEARCH_BENCH_SKIP_OPS") != "1":
        from pysearch.ops import OPS

        for name in OPS_QUERIES:
            fn, _ = OPS[name]
            suite.append((f"q_{name}",
                          lambda fn=fn: fn(spark, SF_DIR).collect()))

    searcher.search_ids("cornucopia", k=10, case_id="7")  # warm caches
    for _pass in range(repeats):
        for name, fn in suite:
            t0 = time.time()
            fn()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
    for name, _fn in suite:
        timings[name] = round(statistics.median(samples[name]), 3)

    # linear-interpolated p95 (ADVICE r1: the old index clamped to the max)
    import numpy as _np

    q_times = [timings[f"q_engine_{i}"] for i in range(len(ENGINE_QUERIES))]
    p95 = float(_np.percentile(q_times, 95))

    total = time.time() - t_all
    spark.stop()
    if work_root != "/tmp":
        shutil.rmtree(index_dir, ignore_errors=True)  # free /dev/shm
    out = {
        "metric": "total_bench_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "bench_corpus_docs": n_docs,
        "index_docs_per_sec": round(docs_per_sec, 2),
        "query_p95_sec": round(p95, 3),
        "n_engine_queries": len(ENGINE_QUERIES),
        # per-query values above are medians of this many in-line samples
        "query_repeats": repeats,
        # host-speed guard: single-core sha256 ops/s sampled before the
        # JVM starts and after it stops; compare across runs/rounds before
        # attributing wall-time deltas to code
        "host_cal_start": round(cal_start),
        "host_cal_end": round(calibrate()),
        # 16-thread aggregate sha256 ops/s — a sample of the host's
        # many-thread penalty regime at bench time (see calibrate_mt)
        "host_cal_mt_start": round(cal_mt_start),
        "host_cal_mt_end": round(calibrate_mt()),
    }
    # raw per-pass samples are audit data, not headline data: they tripled
    # the JSON line past the driver's tail capture in r4 (BENCH_r04.json
    # came back `parsed: null`), so they go to a sidecar under BENCH/ and
    # the LAST stdout line stays a compact medians-only record
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "last_query_samples.json")
    try:
        with open(sidecar, "w") as f:
            json.dump({"cpus": CPUS, "sf": out["sf"],
                       "query_repeats": repeats,
                       "query_samples": samples}, f)
        out["samples_file"] = os.path.relpath(
            sidecar, os.path.dirname(os.path.abspath(__file__)))
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
