"""Scaling-efficiency evidence: the same index build at local[8] vs local[32]
on the identical input (the in-sandbox stand-in for N vs 4N executors per the
driver instruction), reported to BENCH/BASELINE.md.

    python BENCH/run_scaling.py [sf_dir]

The host must be otherwise idle: any concurrent Spark work steals cores from
whichever configuration is being measured and skews the ratio (observed: a
parallel local[8] job dropped the local[32] throughput ~25%).
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


# 2M docs x ~400B gives enough per-core work that the fixed local-mode
# overhead (~10s of JVM scheduling latency) doesn't mask the scaling signal
BENCH_DOCS = os.environ.get("PYSEARCH_BENCH_DOCS", "2000000")


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR,
               PYSEARCH_BENCH_DOCS=BENCH_DOCS,
               PYSEARCH_BENCH_REPEATS=os.environ.get("PYSEARCH_BENCH_REPEATS", "2"),
               # charge tasks for their Python workers so local[N] consumes
               # ~N cores — otherwise the small config borrows idle host
               # cores and the comparison flatters it
               PYSEARCH_TASK_CPUS="2")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench.py (cpus={cpus}) produced no JSON line")
    return json.loads(lines[-1])


def main() -> None:
    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    thr_lo = r_lo["index_docs_per_sec"]
    thr_hi = r_hi["index_docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    # decompose T = W/p + F from the two measurements
    t_lo = r_lo["queries"]["index_build"]
    t_hi = r_hi["queries"]["index_build"]
    w_core_sec = max(0.0, (t_lo - t_hi) / (1.0 / lo - 1.0 / hi))
    f_flat = max(0.0, t_hi - w_core_sec / hi)
    md = f"""# BENCH/BASELINE — measured results

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat()} on local[{lo}] vs local[{hi}]
(single-node stand-in for N vs 4N executors), sf dir `{SF_DIR}`,
bench corpus = {r_lo['bench_corpus_docs']} docs (FIXTURES.md §5 case-7 generator, docLen=400).

| metric | local[{lo}] | local[{hi}] |
|---|---|---|
| index build (s) | {r_lo['queries']['index_build']} | {r_hi['queries']['index_build']} |
| indexing throughput (docs/sec) | {thr_lo} | {thr_hi} |
| query p95 (s, warm, k=10) | {r_lo['query_p95_sec']} | {r_hi['query_p95_sec']} |

**Scaling efficiency** ({lo} -> {hi} cores): eff = (thr_{hi}/thr_{lo}) / {hi // lo}
= ({thr_hi} / {thr_lo}) / {hi // lo} = **{eff:.3f}** (target >= 0.8 per BASELINE.json).

Measurement notes:
- `spark.task.cpus=2` charges every task for its Python worker, so local[{lo}]
  really consumes ~{lo} cores — without it the small configuration borrows idle
  host cores and the comparison flatters it.
- A JIT/classloader warmup build runs untimed before the measured build.
- Decomposition (T = W/p + F): W ≈ {w_core_sec:.0f} core-sec of scalable work,
  F ≈ {f_flat:.1f} s of parallelism-independent stage latency (driver planning,
  commit/lineage jobs) — the component a real multi-executor cluster amortizes
  across far larger inputs.

Rank identity across parallelism levels is enforced by the pytest goldens
(tests/test_engine.py::test_rank_identity_goldens) and the doc_id
partition-invariance test.

Raw JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(md)
    print(md)
    print("wrote", out)


if __name__ == "__main__":
    main()
