"""One scaling-trial leg run through the FROZEN bench.py methodology with
only the Spark master swapped — multi-PROCESS executors instead of one
multi-threaded local JVM.

Why this exists (r5 verdict, next-round #5): this sandbox's virtualization
layer penalizes processes with many concurrently-syscalling threads
(~12x at 32 threads in ONE process, while 32 separate processes scale
~25x), so a local[N]-vs-local[4N] comparison intermittently measures the
host's per-process thread ceiling instead of the engine.  A real N -> 4N
EXECUTOR scale-up adds JVMs of constant per-process size, which
``local-cluster[workers, cores, memMB]`` reproduces: worker JVMs are
separate processes, each with the same thread count in both legs, so the
pair never crosses the thread-penalty regime.

bench.py itself is untouched (it is the frozen measurement contract);
this wrapper only redirects ``pysearch.session.build_spark`` to the
cluster master before invoking ``bench.main()``:

    PYSEARCH_MASTER='local-cluster[4,4,6144]' \\
    PYSEARCH_EXECUTOR_MEM=6144m \\
    SPARK_GRAFT_CPUS=16 python BENCH/scaling_leg.py

SPARK_GRAFT_CPUS must equal workers*cores so bench.py's slot/partition
arithmetic matches the cluster's real parallelism.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER = os.environ["PYSEARCH_MASTER"]
EXEC_MEM = os.environ.get("PYSEARCH_EXECUTOR_MEM")
EXEC_CORES = os.environ.get("PYSEARCH_EXEC_CORES")
EXEC_JAVA_OPTS = os.environ.get("PYSEARCH_EXEC_JAVA_OPTS")


def _patch_build_spark() -> None:
    from pysearch import session

    orig = session.build_spark

    def patched(master=None, app_name="pysearch",
                shuffle_partitions=None, extra=None):
        extra = dict(extra or {})
        if EXEC_MEM:
            extra.setdefault("spark.executor.memory", EXEC_MEM)
        if EXEC_CORES:
            extra.setdefault("spark.executor.cores", EXEC_CORES)
        if EXEC_JAVA_OPTS:
            extra.setdefault("spark.executor.extraJavaOptions",
                             EXEC_JAVA_OPTS)
        # executor python workers must find the package (the driver-side
        # PYTHONPATH fix covers forked local-mode workers only)
        extra.setdefault("spark.executorEnv.PYTHONPATH", REPO)
        return orig(master=MASTER, app_name=app_name,
                    shuffle_partitions=shuffle_partitions, extra=extra)

    session.build_spark = patched


def main() -> None:
    _patch_build_spark()
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()


if __name__ == "__main__":
    main()
