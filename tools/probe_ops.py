"""Per-op latency probe (bench-methodology: interleaved passes, median).

    python tools/probe_ops.py [sf_dir] op [op ...]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pysearch.ops import OPS
    from pysearch.session import build_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(master=f"local[{cpus}]", app_name="probe-ops",
                        shuffle_partitions=3 * cpus,
                        extra={"spark.sql.adaptive."
                               "advisoryPartitionSizeInBytes": "16m"})
    reps = int(os.environ.get("PROBE_REPEATS", "3"))
    # warm: run each once untimed (JIT, file index)
    for n in names:
        OPS[n][0](spark, sf_dir).collect()
    samples = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            t0 = time.time()
            OPS[n][0](spark, sf_dir).collect()
            samples[n].append(round(time.time() - t0, 3))
    for n in names:
        print(f"PROBE {n}: median={statistics.median(samples[n]):.3f} "
              f"samples={samples[n]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
